"""Partition-pruning evidence over a real partitioned parquet layout
written by ``io.write_partitioned`` — the scan-side behavior that makes
partitioned-lake joins viable at 100 TB.

Two tiers, both asserted at the plan level:

* STATIC pruning — a dim filter ON the join key constant-propagates
  through the join into the fact scan's ``PartitionFilters`` at plan
  time (no runtime machinery needed).
* DYNAMIC partition pruning (DPP) — when the dim filter is on a
  NON-join column, no static fold is possible; Spark inserts a
  ``dynamicpruning`` subquery into the fact scan's partition filters
  and prunes with the dim's runtime result.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from training_etl_demo_2_spark.io import write_partitioned


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _expected_sum(tables, flag: str):
    return (
        tables["lineitem"]
        .filter(F.col("l_returnflag") == flag)
        .agg(F.sum("l_quantity"))
        .collect()[0][0]
    )


def test_static_partition_pruning_through_join(spark, tmp_path, tables):
    li = tables["lineitem"].select("l_orderkey", "l_returnflag", "l_quantity")
    path = str(tmp_path / "li_by_flag")
    write_partitioned(li, path, ["l_returnflag"])
    fact = spark.read.parquet(path)
    dim = (
        tables["lineitem"]
        .select(F.col("l_returnflag").alias("flag"))
        .distinct()
        .filter(F.col("flag") == "R")
    )
    joined = fact.join(dim, fact.l_returnflag == dim.flag).agg(
        F.sum("l_quantity").alias("q")
    )
    plan = _plan(joined)
    # the join-key filter constant-propagates into the fact scan
    assert "PartitionFilters: [(l_returnflag" in plan, plan
    assert joined.collect()[0].q == _expected_sum(tables, "R")


def test_dynamic_partition_pruning_fires(spark, tmp_path, tables):
    li = tables["lineitem"].select("l_orderkey", "l_returnflag", "l_quantity")
    path = str(tmp_path / "li_by_flag_dpp")
    write_partitioned(li, path, ["l_returnflag"])
    fact = spark.read.parquet(path)
    # dim filter on a NON-join column: no static fold possible
    dim = spark.createDataFrame(
        [("R", "returned"), ("A", "accepted"), ("N", "none")],
        "flag string, label string",
    ).filter(F.col("label") == "returned")
    joined = fact.join(dim, fact.l_returnflag == dim.flag).agg(
        F.sum("l_quantity").alias("q")
    )
    plan = _plan(joined)
    assert "dynamicpruning" in plan.lower(), plan
    assert joined.collect()[0].q == _expected_sum(tables, "R")
