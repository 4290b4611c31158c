"""Relational operator breadth: filters, joins, aggregations, windows,
set ops, rollup — the engine surface implied by the reference's Athena
analysis phase (``/root/reference/reqdef.yaml:69-73``: parquet tables +
ad-hoc SQL) expressed over the star-schema test tables.

Every query here is a pure Catalyst plan (no Python UDFs): filters and
column pruning reach the parquet scan, aggregates run partial+final,
small dimensions are broadcast explicitly. Determinism rules for oracle
comparison: every float aggregate is rounded, every LIMIT is fully
tie-broken.

Scale notes per query are inline. All take a dict of DataFrames (from
``io.load_tables``) and return a DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def q1_pricing_summary(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate over the fact table.

    100 TB: the only shuffle carries ≤ |flag×status| = 6 groups of
    partials per map task — map-side combine makes this scan-bound.
    """
    li = t["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q6_forecast_revenue(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q6 shape: highly selective filter + global agg.

    The three predicates push down to the parquet scan (visible as
    PushedFilters in explain); at 100 TB this reads only the 4 needed
    columns and min/max-skips row groups on l_shipdate.
    """
    li = t["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def q3_shipping_priority(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact join → agg → top-k.

    customer is small relative to lineitem → broadcast; orders⋈lineitem
    is the one real shuffle, on orderkey. Top-10 fuses to
    TakeOrderedAndProject (no global sort). Revenue rounded + orderkey
    tie-break for determinism.
    """
    cutoff = F.lit("1998-03-15").cast("timestamp")
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    orders = t["orders"].filter(F.col("o_orderdate") < cutoff)
    li = t["lineitem"].filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


def q5_region_revenue(t: dict[str, DataFrame]) -> DataFrame:
    """Star join: fact → orders → customer → nation → region, revenue per
    region for one order-year.

    All three dimension joins are broadcasts (customer/nation/region are
    tiny vs lineitem at any SF); the only shuffles are lineitem⋈orders on
    orderkey and the final 5-group agg.
    """
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return (
        t["lineitem"]
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy("r_name")
    )


def customers_per_region(t: dict[str, DataFrame]) -> DataFrame:
    """Pure broadcast-chain join: customer → nation → region rollup."""
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
        )
        .orderBy("r_name")
    )


def distinct_customers_by_priority(t: dict[str, DataFrame]) -> DataFrame:
    """Distinct aggregate: count(DISTINCT custkey) per priority. Spark
    plans this as a two-phase expand+agg; fine at scale since the
    distinct key domain (custkeys) is shuffled once."""
    return (
        t["orders"]
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


def top_orders_per_customer(t: dict[str, DataFrame], k: int = 3) -> DataFrame:
    """Window function: rank orders per customer, keep top-k.

    One shuffle on custkey; rank+filter pipelines inside the window
    stage. Tie-break on orderkey keeps row_number deterministic.
    """
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        t["orders"]
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "rnk",
        )
        .orderBy("o_custkey", "rnk")
    )


def customer_set_ops(t: dict[str, DataFrame]) -> DataFrame:
    """Set operations: customers with both finished and open orders,
    minus any with status P. INTERSECT/EXCEPT are distinct-semantics
    (hash agg + shuffle on the key) in both Spark and ANSI SQL."""
    o = t["orders"]
    f_cust = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o_cust = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    p_cust = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return f_cust.intersect(o_cust).exceptAll(p_cust.distinct()).orderBy("o_custkey")


def orders_rollup(t: dict[str, DataFrame]) -> DataFrame:
    """ROLLUP over (status, priority): hierarchical totals in one pass
    (Spark Expand + single shuffle rather than 3 scans)."""
    return (
        t["orders"]
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_totalprice"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


def lineitem_summary_stats(t: dict[str, DataFrame]) -> DataFrame:
    """The reqdef's "統計処理" (statistics) exercise (reqdef.yaml:13):
    describe-style stats as one algebraic aggregate pass."""
    return t["lineitem"].agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("std_qty"),
        F.round(F.min("l_quantity"), 2).alias("min_qty"),
        F.round(F.max("l_quantity"), 2).alias("max_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.median("l_extendedprice"), 4).alias("median_price"),
    )


def events_hourly(t: dict[str, DataFrame]) -> DataFrame:
    """Time-bucketed aggregation over the events table (batch twin of the
    streaming windowed agg in streaming/). Hour emitted as a string so
    oracle hashing is engine-neutral."""
    return (
        t["events"]
        .groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss")
            .alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("hour", "event_type")
    )


def sessionize_events(t: dict[str, DataFrame], gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization via windows: lag → new-session flag →
    running sum = session id. Two window passes over one shuffle on
    user_id (both windows share the partitioning, so Catalyst reuses
    the exchange). At 100 TB this is the standard approach; for
    streaming the equivalent is session_window() in streaming/.
    """
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = gap_minutes * 60
    with_flag = t["events"].withColumn(
        "new_session",
        (
            F.col("ts").cast("long")
            - F.coalesce(F.lag("ts").over(w_user).cast("long"), F.lit(-gap_s - 1))
            > gap_s
        ).cast("int"),
    )
    with_sid = with_flag.withColumn(
        "session_seq",
        F.sum("new_session").over(
            w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_sid.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("user_id", "session_seq")
    )
