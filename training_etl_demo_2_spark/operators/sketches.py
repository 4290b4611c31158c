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


# ---------------------------------------------------------------------------
# mergeable fixed-bin histograms -> approximate quantiles
# ---------------------------------------------------------------------------

# Bin width for event values: fine enough that the quantile estimate
# (bin lower edge) sits within one width of the exact answer, coarse
# enough that |bins| stays metadata-sized. DETERMINISTIC — unlike
# t-digest/KLL, a fixed-bin histogram has no data-dependent layout, so
# an ANSI-SQL oracle reproduces it bit-for-bit.
HIST_BIN_WIDTH = 5.0


def daily_value_histograms(
    events: DataFrame, bin_width: float = HIST_BIN_WIDTH
) -> DataFrame:
    """Materialized per-(day, type) value histograms:
    (day, event_type, bin, n) with bin = floor(value / width).

    The quantile analogue of ``daily_user_sketches``: a new day appends
    rows; any date-range quantile is a SUM of bin counts over covered
    rows — mergeable by construction, no rescan of events. State per
    (day, type) is |occupied bins|, bounded by range/width."""
    return (
        events.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            "event_type",
            F.floor(F.col("value") / bin_width).cast("long").alias("bin"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def histogram_quantiles(
    hist: DataFrame,
    qs: tuple = (0.25, 0.5, 0.75, 0.95),
    bin_width: float = HIST_BIN_WIDTH,
) -> DataFrame:
    """Approximate quantiles per event_type from merged histogram
    blocks: merge (sum bins across days), cumulative-sum, and for each
    q report the LOWER EDGE of the first bin whose cumulative count
    reaches ceil(q·n) — pure integer selection, so engine and oracle
    agree exactly; the approximation error is < bin_width by
    construction (pytest pins it against exact percentiles).

    Merge is one small shuffle over (type, bin); the window runs over
    |occupied bins| rows per type — metadata scale."""
    from pyspark.sql import Window

    merged = hist.groupBy("event_type", "bin").agg(
        F.sum("n").cast("long").alias("n")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy("event_type")
    cum = merged.select(
        "event_type",
        "bin",
        F.sum("n").over(w).alias("cum"),
        F.sum("n").over(tot).alias("total"),
    )
    # ONE pass for all quantiles: broadcast the tiny q relation across
    # the cumulative bins and take min(bin) per (type, q) — a per-q
    # union would recompute the merge+window once per quantile.
    qdf = hist.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    return (
        cum.crossJoin(F.broadcast(qdf))
        .filter(F.col("cum") >= F.ceil(F.col("q") * F.col("total")).cast("long"))
        .groupBy("event_type", "q")
        .agg(F.min("bin").alias("bin"))
        .select(
            "event_type",
            "q",
            F.round(F.col("bin") * bin_width, 2).alias("q_est"),
        )
    )


def events_histogram_quantiles(t: dict[str, DataFrame]) -> DataFrame:
    """Registered query: quantile estimates per type reconstructed from
    the mergeable daily blocks (never from raw events)."""
    return histogram_quantiles(daily_value_histograms(t["events"]))


def events_histogram_quantiles_sql(
    qs: tuple = (0.25, 0.5, 0.75, 0.95), bin_width: float = HIST_BIN_WIDTH
) -> str:
    """Oracle twin: same daily blocks, same merge, same integer
    selection rule."""
    q_rows = ", ".join(f"(CAST({q} AS DOUBLE))" for q in qs)
    return f"""
    WITH hist AS (
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               event_type,
               CAST(floor(value / {bin_width}) AS BIGINT) AS bin,
               count(*) AS n
        FROM events GROUP BY 1, 2, 3
    ), merged AS (
        SELECT event_type, bin, CAST(sum(n) AS BIGINT) AS n
        FROM hist GROUP BY event_type, bin
    ), cum AS (
        SELECT event_type, bin,
               sum(n) OVER (PARTITION BY event_type ORDER BY bin
                            ROWS UNBOUNDED PRECEDING) AS c,
               sum(n) OVER (PARTITION BY event_type) AS total
        FROM merged
    ), qs(q) AS (VALUES {q_rows})
    SELECT event_type, q, round(min(bin) * {bin_width}, 2) AS q_est
    FROM cum CROSS JOIN qs
    WHERE c >= ceil(q * total)
    GROUP BY event_type, q
    """
