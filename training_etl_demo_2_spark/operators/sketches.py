"""Sketch-based approximate aggregates — the cardinality/quantile scale
path for 100 TB interactive analytics.

Exact ``count(DISTINCT)`` shuffles every distinct value; a DataSketches
HLL sketch is a fixed ~KB summary with two properties that matter at
scale:

* **single-pass**: one shuffle of sketch buffers, never of values;
* **mergeable**: per-partition / per-day sketches union losslessly, so
  rollups (day -> month -> total) and incremental (streaming) updates
  never rescan history — the property exact distinct counts lack.

Estimates are engine-specific (no DuckDB twin can match bit-for-bit),
so these register as rows-only queries; pytest pins relative error
against the exact answer and checks merge-consistency invariants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# lgConfigK=12 -> 4 KiB sketches, ~1.6% relative standard error.
LG_K = 12


def approx_user_stats(t: dict[str, DataFrame]) -> DataFrame:
    """Per-event-type approximate distinct users (HLL) next to the exact
    percentile sketch of values — the interactive-dashboard aggregate.
    One shuffle; state per group is O(KB) regardless of row count."""
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(LG_K))
            ).alias("approx_users"),
            F.approx_count_distinct("user_id").alias("approx_users_hllpp"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def daily_user_sketches(t: dict[str, DataFrame]) -> DataFrame:
    """Materialized per-day HLL sketches — the incremental building
    block: a new day appends one row; any date-range cardinality is a
    union over the covered rows (no rescan of events)."""
    return (
        t["events"]
        .groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"))
        .agg(F.hll_sketch_agg("user_id", F.lit(LG_K)).alias("user_sketch"))
    )


def union_user_estimate(daily: DataFrame) -> DataFrame:
    """Cardinality over any set of per-day sketch rows via lossless
    union — demonstrates the mergeability contract."""
    return daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("user_sketch")).alias(
            "approx_users_total"
        )
    )
