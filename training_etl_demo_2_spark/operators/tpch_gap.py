"""The remaining TPC-H query shapes (q2/q9/q12/q16/q20/q21/q22), adapted
to the fixture's reduced schema, plus a hypertable-style multi-resolution
rollup.  With these, all 22 TPC-H access patterns have an engine
implementation (q1/3/4/5/6/7/8/10/11/13/14/15/17/18/19 live in
relational.py / relational_ext.py).

Adaptations (no partsupp table; lineitem lacks commit/receipt dates and
shipmode):
* q2's partsupp min-cost supplier        -> per-part min avg sale price
  from lineitem history (same correlated-min shape);
* q9's ps_supplycost profit              -> p_retailprice as unit cost;
* q12's shipmode/commitdate lateness     -> order->ship delay buckets;
* q16's comment-based supplier exclusion -> negative-balance suppliers;
* q20's excess-stock supplier            -> shipped-quantity share above
  1.5x the part's cross-supplier mean;
* q21's multi-exists "sole late supplier" -> one aggregation pass
  (per-order distinct-supplier and late-supplier counts) instead of the
  textbook semi+anti self-join pair — same semantics, one shuffle less;
* q22's country-code prefix              -> market segment.

Determinism contract (see oracle-float-determinism notes): every money
aggregate is summed as exact integer units (ten-thousandths / cents) and
divided once at the end; averages are emitted as the same
(exact_int / exact_int) division sequence on both engines; no round()
on accumulated doubles anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _t4(col):
    """Exact ten-thousandths of a 2-dp-ish double expression."""
    return F.floor(col * 10000 + F.lit(0.5)).cast("long")


# ---------------------------------------------------------------------------
# q2: min-cost supplier per part (correlated min + tie-break)
# ---------------------------------------------------------------------------


def q2_min_cost_supplier(t: dict[str, DataFrame]) -> DataFrame:
    """For each large STANDARD part, the supplier with the lowest
    historical average sale price (ties -> lowest suppkey).

    Shape: per-(part, supplier) agg -> per-part window min -> broadcast
    join for names. The window partitions on partkey (many partitions,
    parallel); dimension joins are broadcast.
    """
    p = t["part"].filter(
        (F.col("p_size") >= 40) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey", "p_name")
    li = t["lineitem"].select("l_partkey", "l_suppkey", "l_extendedprice")
    ps = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey", "p_name", "l_suppkey")
        .agg(
            F.sum(_t4(F.col("l_extendedprice"))).alias("price_t4"),
            F.count(F.lit(1)).alias("n_sales"),
        )
        .withColumn("avg_price", (F.col("price_t4") / F.col("n_sales")) / 10000.0)
    )
    w = Window.partitionBy("p_partkey").orderBy(
        F.asc("avg_price"), F.asc("l_suppkey")
    )
    best = ps.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    s = t["supplier"].select("s_suppkey", "s_name")
    return (
        best.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "p_name", "s_name", "avg_price")
    )


Q2_ORACLE = """
    WITH ps AS (
        SELECT p_partkey, p_name, l_suppkey,
               CAST(sum(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT))
                    AS BIGINT) AS price_t4,
               count(*) AS n_sales
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_size >= 40 AND p_type = 'STANDARD'
        GROUP BY 1, 2, 3
    ), ranked AS (
        SELECT p_partkey, p_name, l_suppkey,
               (price_t4 / n_sales) / 10000.0 AS avg_price,
               row_number() OVER (
                   PARTITION BY p_partkey
                   ORDER BY (price_t4 / n_sales) / 10000.0 ASC, l_suppkey ASC
               ) AS rn
        FROM ps
    )
    SELECT p_partkey, p_name, s_name, avg_price
    FROM ranked JOIN supplier ON l_suppkey = s_suppkey
    WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# q9: profit by nation and year
# ---------------------------------------------------------------------------


def q9_profit_by_nation(t: dict[str, DataFrame]) -> DataFrame:
    """Profit (revenue minus retail cost) for 'widget' parts, grouped by
    supplier nation and order year. Fact-fact join on orderkey shuffles;
    part/supplier/nation joins broadcast."""
    li = t["lineitem"].select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    profit_t4 = _t4(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ) - _t4(F.col("p_retailprice") * F.col("l_quantity"))
    return (
        li.join(F.broadcast(t["part"].filter(F.col("p_name").contains("widget"))
                            .select("p_partkey", "p_retailprice")),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(t["orders"].select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"].select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg((F.sum(profit_t4) / 10000.0).alias("profit"))
    )


Q9_ORACLE = """
    SELECT n_name,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                         AS BIGINT)
                    - CAST(floor(p_retailprice * l_quantity * 10000 + 0.5)
                           AS BIGINT)) AS BIGINT) / 10000.0 AS profit
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# q12: shipping-delay buckets x order priority
# ---------------------------------------------------------------------------


def q12_late_shipments(t: dict[str, DataFrame]) -> DataFrame:
    """Delay-bucketed lineitems split into high/low-priority counts —
    q12's CASE-inside-agg shape with datediff buckets standing in for
    shipmode. One fact-fact shuffle join, map-side partial aggs."""
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    o = t["orders"].select("o_orderkey", "o_orderdate", "o_orderpriority")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay <= 30, "0-30d")
        .when(delay <= 90, "31-90d")
        .otherwise("90d+")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).cast("long")
            .alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).cast("long")
            .alias("low_line_count"),
        )
    )


Q12_ORACLE = """
    SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) <= 30 THEN '0-30d'
                WHEN datediff('day', o_orderdate, l_shipdate) <= 90 THEN '31-90d'
                ELSE '90d+' END AS delay_bucket,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
"""


# ---------------------------------------------------------------------------
# q16: supplier diversity per part class, excluding flagged suppliers
# ---------------------------------------------------------------------------


def q16_supplier_part_counts(t: dict[str, DataFrame]) -> DataFrame:
    """count(DISTINCT supplier) per (brand, type, size) over mid-size
    non-PROMO parts, excluding negative-balance suppliers (q16's NOT IN
    exclusion) — the exclusion list is tiny, so it broadcasts as an
    anti-join."""
    p = t["part"].filter(
        F.col("p_size").isin(10, 20, 30, 40) & (F.col("p_type") != "PROMO")
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    flagged = t["supplier"].filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("bad_suppkey")
    )
    li = t["lineitem"].select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(flagged),
            F.col("l_suppkey") == F.col("bad_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_ORACLE = """
    SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_size IN (10, 20, 30, 40) AND p_type <> 'PROMO'
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# q20: suppliers shipping an excess share of a part
# ---------------------------------------------------------------------------


def q20_excess_shippers(t: dict[str, DataFrame]) -> DataFrame:
    """Suppliers whose 1997 shipped quantity of some part exceeds 1.5x
    that part's cross-supplier mean — q20's nested-aggregate semi-join.
    The inner aggregate reuses the outer's (partkey, suppkey) rollup via
    a partkey window (no second scan); supplier names broadcast."""
    li = t["lineitem"].filter(F.year("l_shipdate") == 1997).select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("qty")
    )
    w = Window.partitionBy("l_partkey")
    excess = (
        ps.withColumn("part_total", F.sum("qty").over(w))
        .withColumn("n_supp", F.count(F.lit(1)).over(w))
        .filter(F.col("qty") * F.col("n_supp") > 1.5 * F.col("part_total"))
    )
    per_supp = excess.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_excess_parts")
    )
    s = t["supplier"].select("s_suppkey", "s_name")
    return per_supp.join(
        F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey")
    ).select("s_suppkey", "s_name", "n_excess_parts")


Q20_ORACLE = """
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem
        WHERE year(l_shipdate) = 1997
        GROUP BY 1, 2
    ), excess AS (
        SELECT l_suppkey
        FROM (
            SELECT l_suppkey, qty,
                   sum(qty) OVER (PARTITION BY l_partkey) AS part_total,
                   count(*) OVER (PARTITION BY l_partkey) AS n_supp
            FROM ps
        )
        WHERE qty * n_supp > 1.5 * part_total
    )
    SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS n_excess_parts
    FROM excess JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# q21: sole late supplier on multi-supplier orders
# ---------------------------------------------------------------------------


def q21_sole_late_supplier(t: dict[str, DataFrame]) -> DataFrame:
    """Suppliers who alone shipped late (>60d after order) on finished
    multi-supplier orders. The textbook form is EXISTS + NOT EXISTS
    self-joins on lineitem; here one per-order aggregation derives
    (distinct suppliers, distinct late suppliers) and a single join back
    picks the sole-late pairs — same semantics, one fact shuffle less.
    """
    o = t["orders"].filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = t["lineitem"].select("l_orderkey", "l_suppkey", "l_shipdate")
    e = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        (F.datediff("l_shipdate", "o_orderdate") > 60).alias("is_late"),
    )
    per_order = e.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("is_late"), F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    late_pairs = e.filter(F.col("is_late")).select(
        "l_orderkey", "l_suppkey"
    ).distinct()
    sole = (
        late_pairs.join(
            per_order.filter(
                (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
            ).select("l_orderkey"),
            "l_orderkey",
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    s = t["supplier"].select("s_suppkey", "s_name")
    return (
        sole.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


Q21_ORACLE = """
    WITH e AS (
        SELECT l_orderkey, l_suppkey,
               datediff('day', o_orderdate, l_shipdate) > 60 AS is_late
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
    ), per_order AS (
        SELECT l_orderkey,
               count(DISTINCT l_suppkey) AS n_supp,
               count(DISTINCT CASE WHEN is_late THEN l_suppkey END)
                   AS n_late_supp
        FROM e GROUP BY 1
    ), sole AS (
        SELECT e.l_suppkey, count(*) AS numwait
        FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM e WHERE is_late) e
        JOIN per_order USING (l_orderkey)
        WHERE n_supp > 1 AND n_late_supp = 1
        GROUP BY 1
    )
    SELECT s_name, CAST(numwait AS BIGINT) AS numwait
    FROM sole JOIN supplier ON l_suppkey = s_suppkey
    ORDER BY numwait DESC, s_name ASC
    LIMIT 20
"""


# ---------------------------------------------------------------------------
# q22: rich customers with no orders, by segment
# ---------------------------------------------------------------------------


def q22_idle_rich_customers(t: dict[str, DataFrame]) -> DataFrame:
    """Customers above the positive-balance average with no orders since
    2000, rolled up per market segment — scalar-subquery threshold +
    anti-join. Balances compared and summed in exact cents; the
    threshold is the same (exact_cents_sum / count) division on both
    engines."""
    c = t["customer"].select(
        "c_custkey",
        "c_mktsegment",
        _cents(F.col("c_acctbal")).alias("bal_c"),
    )
    thr = c.filter(F.col("bal_c") > 0).agg(
        (F.sum("bal_c") / F.count(F.lit(1))).alias("thr_c")
    )
    rich = c.crossJoin(F.broadcast(thr)).filter(F.col("bal_c") > F.col("thr_c"))
    idle = rich.join(
        t["orders"]
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select(F.col("o_custkey")),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_anti",
    )
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("bal_c").cast("long").alias("total_bal_c"),
    )


def _cents(col):
    """Exact cents of a 2-dp double (sign-symmetric rounding)."""
    return (
        F.when(col >= 0, F.floor(col * 100 + F.lit(0.5)))
        .otherwise(-F.floor(-col * 100 + F.lit(0.5)))
        .cast("long")
    )


Q22_ORACLE = """
    WITH c AS (
        SELECT c_custkey, c_mktsegment,
               CAST(CASE WHEN c_acctbal >= 0
                         THEN floor(c_acctbal * 100 + 0.5)
                         ELSE -floor(-c_acctbal * 100 + 0.5)
                    END AS BIGINT) AS bal_c
        FROM customer
    ), thr AS (
        SELECT CAST(sum(bal_c) AS BIGINT) / count(*) AS thr_c
        FROM c WHERE bal_c > 0
    )
    SELECT c_mktsegment,
           count(*) AS n_customers,
           CAST(sum(bal_c) AS BIGINT) AS total_bal_c
    FROM c, thr
    WHERE bal_c > thr_c
      AND c_custkey NOT IN (SELECT o_custkey FROM orders
                            WHERE o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY 1
"""


# ---------------------------------------------------------------------------
# hypertable-style multi-resolution rollup
# ---------------------------------------------------------------------------


def events_multires_rollup(t: dict[str, DataFrame]) -> DataFrame:
    """Continuous-aggregate-style rollup: day, hour and 15-minute
    resolutions of the events table in ONE grouping-sets pass (one
    shuffle computes all three levels; a hypertable engine would
    materialize these incrementally — in Spark the same query runs over
    a stream via multiple windowed sinks).

    Exact integer value units; bucket labels as strings so the grouped
    nulls of coarser levels hash engine-neutrally."""
    e = t["events"].select(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd HH:mm:ss")
        .alias("day"),
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss")
        .alias("hour"),
        F.date_format(
            F.timestamp_seconds(
                (F.unix_timestamp("ts") - F.unix_timestamp("ts") % 900)
            ),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("q15"),
        "value",
    )
    return (
        e.groupingSets(
            [["day"], ["day", "hour"], ["day", "hour", "q15"]],
            "day", "hour", "q15",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_t4(F.col("value"))).cast("long").alias("value_t4"),
        )
    )


MULTIRES_ORACLE = """
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS day,
           CASE WHEN GROUPING(h) = 0
                THEN strftime(h, '%Y-%m-%d %H:%M:%S') END AS hour,
           CASE WHEN GROUPING(q15) = 0
                THEN strftime(q15, '%Y-%m-%d %H:%M:%S') END AS q15,
           count(*) AS n_events,
           CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS BIGINT)
               AS value_t4
    FROM (
        SELECT ts,
               date_trunc('hour', ts) AS h,
               to_timestamp(CAST(floor(epoch(ts)) AS BIGINT)
                            - CAST(floor(epoch(ts)) AS BIGINT) % 900) AS q15,
               value
        FROM events
    )
    GROUP BY GROUPING SETS ((day), (day, h), (day, h, q15))
"""
