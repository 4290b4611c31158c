"""Bucketed-table co-located join: the 100 TB fact⋈fact strategy.

A repeated join key (orderkey) bucketed identically on both sides lets
Spark sort-merge join WITHOUT any Exchange — the shuffle is paid once
at write time and amortized over every subsequent join.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_bucketed_join_no_exchange(spark, tables):
    tables["orders"].write.bucketBy(4, "o_orderkey").sortBy("o_orderkey").mode(
        "overwrite"
    ).saveAsTable("orders_bucketed")
    tables["lineitem"].write.bucketBy(4, "l_orderkey").sortBy("l_orderkey").mode(
        "overwrite"
    ).saveAsTable("lineitem_bucketed")

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("lineitem_bucketed")
            .join(
                spark.table("orders_bucketed"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # the join itself must not reshuffle either side: the only
        # exchange allowed is the one ABOVE the join for the groupBy
        join_part = plan[plan.index("SortMergeJoin") :]
        assert "Exchange hashpartitioning(l_orderkey" not in join_part
        assert "Exchange hashpartitioning(o_orderkey" not in join_part

        # correctness: same result as the plain (shuffled) join
        want = {
            (r.o_orderpriority, r.n)
            for r in tables["lineitem"]
            .join(
                tables["orders"], F.col("l_orderkey") == F.col("o_orderkey")
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        got = {(r.o_orderpriority, r.n) for r in joined.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")
        spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")
