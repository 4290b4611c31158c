"""Exact distributed global rank / prefix sum — the shared scan-parallel
pattern behind `customer_value_deciles` and `zorder_files`, factored out
for operators that need a global ordering WITHOUT one giant
unpartitioned-window task.

Shape: range-repartition on the order columns (the one shuffle any
global sort pays), then per-partition `row_number` / running sum inside
whole-stage codegen, offset by per-partition COUNT/SUM aggregates
(P rows of partition METADATA collected to the driver — never data
rows). At 1000 executors the collect is ~thousands of integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from ..cache import tracked_cache


def with_global_order(
    df: DataFrame,
    order_cols: list,
    weight_col: str | None = None,
    rank_col: str = "grank",
    cum_col: str = "cum_before",
):
    """Return ``(out_df, n_rows, weight_total)``: ``df`` with an exact
    0-based global rank column (``rank_col``) under ``order_cols``,
    and — when ``weight_col`` is given — an EXCLUSIVE global prefix
    sum of that weight (``cum_col``).  ``n_rows`` / ``weight_total``
    come free from the same per-partition metadata the offsets need,
    so callers that want "top N of the global order" or "X% of the
    global total" get the bound as a plan literal without another
    pass or a one-row crossJoin.  The result is persisted (two passes
    share the range-exchange); caller unpersists when done.  Returns
    ``(None, 0, 0)`` for an empty input.
    """
    spark = df.sparkSession
    nparts = max(1, spark.sparkContext.defaultParallelism)
    ranged = df.repartitionByRange(nparts, *order_cols).withColumn(
        "pid", F.spark_partition_id()
    )
    ranged.transform(tracked_cache)
    aggs = [F.count(F.lit(1)).alias("cnt")]
    if weight_col is not None:
        aggs.append(F.sum(weight_col).cast("long").alias("wsum"))
    stats = {
        int(r["pid"]): r for r in ranged.groupBy("pid").agg(*aggs).collect()
    }
    if not stats:
        ranged.unpersist()
        return None, 0, 0
    cnt_off, wt_off = {}, {}
    acc_c, acc_w = 0, 0
    for pid in sorted(stats):
        cnt_off[pid] = acc_c
        acc_c += int(stats[pid]["cnt"])
        if weight_col is not None:
            wt_off[pid] = acc_w
            acc_w += int(stats[pid]["wsum"])
    cmap = F.create_map(
        *[F.lit(x) for pid in sorted(cnt_off) for x in (pid, cnt_off[pid])]
    )
    w = Window.partitionBy("pid").orderBy(*order_cols)
    out = ranged.withColumn(
        rank_col,
        (cmap[F.col("pid")] + F.row_number().over(w) - 1).cast("long"),
    )
    if weight_col is not None:
        wmap = F.create_map(
            *[F.lit(x) for pid in sorted(wt_off) for x in (pid, wt_off[pid])]
        )
        wprev = (
            Window.partitionBy("pid")
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        out = out.withColumn(
            cum_col,
            (
                wmap[F.col("pid")]
                + F.coalesce(
                    F.sum(weight_col).over(wprev).cast("long"), F.lit(0)
                )
            ).cast("long"),
        )
    return out, acc_c, acc_w


def with_global_prefix_sums(
    df: DataFrame,
    order_cols: list,
    weight_cols: list[str],
    inclusive: bool = True,
):
    """Exact INCLUSIVE (or exclusive) global prefix sums of several
    weight columns under one global ordering, without an
    unpartitioned window: same range-repartition + per-partition
    running sums + per-partition metadata offsets as
    ``with_global_order``, generalized to N weights in one pass.
    Returns ``(out_df, totals)`` where ``totals[w]`` is the grand
    total of each weight (free from the offset metadata). The result
    is persisted; caller unpersists. ``(None, {})`` on empty input.
    """
    spark = df.sparkSession
    nparts = max(1, spark.sparkContext.defaultParallelism)
    ranged = df.repartitionByRange(nparts, *order_cols).withColumn(
        "pid", F.spark_partition_id()
    )
    ranged.transform(tracked_cache)
    aggs = [F.sum(w).cast("long").alias(f"s_{w}") for w in weight_cols]
    stats = {
        int(r["pid"]): r for r in ranged.groupBy("pid").agg(*aggs).collect()
    }
    if not stats:
        ranged.unpersist()
        return None, {}
    offs: dict[str, dict[int, int]] = {w: {} for w in weight_cols}
    acc = {w: 0 for w in weight_cols}
    for pid in sorted(stats):
        for w in weight_cols:
            offs[w][pid] = acc[w]
            acc[w] += int(stats[pid][f"s_{w}"] or 0)
    out = ranged
    frame_end = 0 if inclusive else -1
    for w in weight_cols:
        wmap = F.create_map(
            *[F.lit(x) for pid in sorted(offs[w]) for x in (pid, offs[w][pid])]
        )
        win = (
            Window.partitionBy("pid")
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, frame_end)
        )
        out = out.withColumn(
            f"cum_{w}",
            (
                wmap[F.col("pid")]
                + F.coalesce(F.sum(w).over(win).cast("long"), F.lit(0))
            ).cast("long"),
        )
    return out, acc
