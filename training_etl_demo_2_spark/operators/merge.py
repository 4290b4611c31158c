"""Keyed merge (upsert) — the lake-table MERGE INTO, engine-native.

The reference's sink blindly re-puts every item into DynamoDB
(``process_tsv.py:94-96`` — put_item is last-write-wins upsert by key).
``merge_upsert`` re-expresses that semantics over immutable parquet
runs: a full-outer join on the key where an update row REPLACES the
whole target row (SCD type 1), and unmatched update rows insert.

Scale shape: one shuffle on the merge key (or none for the
broadcast-delta case — CDC deltas are usually tiny vs the base table;
pass ``broadcast_updates=True``). Row-level replace is decided by key
presence, NOT per-column coalesce — an update that legitimately sets a
column NULL must win.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key: str,
    broadcast_updates: bool = False,
) -> DataFrame:
    """Last-write-wins merge of ``updates`` into ``target`` by ``key``.

    * key in both        -> the updates row (full row replace)
    * key only in target -> the target row (untouched)
    * key only in updates-> inserted

    ``updates`` must be key-unique (CDC-compacted); enforce upstream
    with a keep-last window if needed."""
    cols = target.columns
    upd = updates.select(*cols)
    if broadcast_updates:
        upd = F.broadcast(upd)
    t = target.select(
        *[F.col(c).alias(f"__t_{c}") for c in cols]
    )
    u = upd.select(
        F.lit(True).alias("__has_u"),
        *[F.col(c).alias(f"__u_{c}") for c in cols],
    )
    joined = t.join(u, F.col(f"__t_{key}") == F.col(f"__u_{key}"), "full_outer")
    pick_u = F.coalesce(F.col("__has_u"), F.lit(False))
    return joined.select(
        *[
            F.when(pick_u, F.col(f"__u_{c}"))
            .otherwise(F.col(f"__t_{c}"))
            .alias(c)
            for c in cols
        ]
    )


def merge_scd2(
    hist: DataFrame,
    updates: DataFrame,
    key: str,
    eff_col: str = "eff_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Type-2 history merge: versioned rows with [valid_from, valid_to)
    intervals, ``valid_to IS NULL`` marking the current version.

    For each update row at effective time ``eff_col``:

    * key exists and any attribute differs -> the current version is
      CLOSED (valid_to = eff) and a new current version opens
    * key exists, no attribute differs      -> no-op (no empty versions)
    * new key                               -> first version opens

    Attribute comparison is null-safe (NULL -> value IS a change).
    One shuffle on the key (full-outer, like SCD1); closed/kept/insert
    branches are projections of the same join. ``updates`` must be
    key-unique per batch (compact CDC upstream)."""
    attrs = [c for c in hist.columns if c not in (key, valid_from, valid_to)]
    cur = hist.filter(F.col(valid_to).isNull()).withColumn(
        "__has_c", F.lit(True)
    )
    past = hist.filter(F.col(valid_to).isNotNull())
    u = updates.select(
        F.col(key),
        F.col(eff_col).alias("__eff"),
        F.lit(True).alias("__has_u"),
        *[F.col(c).alias(f"__u_{c}") for c in attrs],
    )
    j = cur.join(u, key, "full_outer")
    has_c = F.coalesce(F.col("__has_c"), F.lit(False))
    has_u = F.coalesce(F.col("__has_u"), F.lit(False))
    differs = None
    for c in attrs:
        d = ~F.col(c).eqNullSafe(F.col(f"__u_{c}"))
        differs = d if differs is None else (differs | d)
    changed = has_c & has_u & differs

    kept = j.filter(has_c & ~changed).select(
        key, *attrs, valid_from, F.col(valid_to)
    )
    closed = j.filter(changed).select(
        key, *attrs, valid_from, F.col("__eff").alias(valid_to)
    )
    opened = j.filter(has_u & (changed | ~has_c)).select(
        key,
        *[F.col(f"__u_{c}").alias(c) for c in attrs],
        F.col("__eff").alias(valid_from),
        F.lit(None).cast(hist.schema[valid_to].dataType).alias(valid_to),
    )
    return past.select(key, *attrs, valid_from, valid_to).unionAll(
        kept
    ).unionAll(closed).unionAll(opened)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Table-version diff (the CDC-generation / audit primitive): given
    two snapshots of a keyed table, emit one row per difference —
    change_type in ('added', 'removed', 'changed') — with the old and
    new values of the compared columns. Unchanged rows are absent, so
    the output is delta-sized, not table-sized.

    Comparison is null-safe per column (NULL -> non-NULL counts as a
    change). One shuffle: the full-outer join on the key; at 100 TB
    both snapshots partition on the key, and if the snapshots share a
    bucketed layout (io.write_clustered) the join is exchange-free.
    """
    cols = compare_cols or [c for c in old.columns if c != key]
    o = old.select(
        F.col(key), F.lit(True).alias("__has_o"),
        *[F.col(c).alias(f"__o_{c}") for c in cols],
    )
    n = new.select(
        F.col(key), F.lit(True).alias("__has_n"),
        *[F.col(c).alias(f"__n_{c}") for c in cols],
    )
    j = o.join(n, key, "full_outer")
    has_o = F.coalesce(F.col("__has_o"), F.lit(False))
    has_n = F.coalesce(F.col("__has_n"), F.lit(False))
    differs = None
    for c in cols:
        d = ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
        differs = d if differs is None else (differs | d)
    ctype = (
        F.when(~has_o, F.lit("added"))
        .when(~has_n, F.lit("removed"))
        .when(differs, F.lit("changed"))
    )
    return (
        j.withColumn("change_type", ctype)
        .filter(F.col("change_type").isNotNull())
        .select(
            key,
            "change_type",
            *[F.col(f"__o_{c}").alias(f"old_{c}") for c in cols],
            *[F.col(f"__n_{c}").alias(f"new_{c}") for c in cols],
        )
    )


# Deterministic snapshot pair derived from orders: the old snapshot is
# missing keys % 7 == 3 (they appear only in new -> 'added'), the new
# snapshot is missing keys % 7 == 5 ('removed') and reprices keys
# % 5 == 0 by +10.00 ('changed'; one IEEE add, bit-identical on both
# engines).
_DIFF_OLD_PRED = "o_orderkey % 7 != 3"
_DIFF_NEW_PRED = "o_orderkey % 7 != 5"
_DIFF_BUMP_PRED = "o_orderkey % 5 = 0"


def orders_snapshot_diff(t: dict[str, DataFrame]) -> DataFrame:
    orders = t["orders"]
    old = orders.filter(_DIFF_OLD_PRED).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = orders.filter(_DIFF_NEW_PRED).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(F.expr(_DIFF_BUMP_PRED), F.col("o_totalprice") + 10.0)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    d = snapshot_diff(old, new, "o_orderkey",
                      ["o_orderstatus", "o_totalprice"])
    return d.select(
        "o_orderkey",
        "change_type",
        "old_o_orderstatus",
        F.round("old_o_totalprice", 2).alias("old_price"),
        "new_o_orderstatus",
        F.round("new_o_totalprice", 2).alias("new_price"),
    )


ORDERS_SNAPSHOT_DIFF_ORACLE = f"""
    WITH old AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE {_DIFF_OLD_PRED}
    ), new AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN {_DIFF_BUMP_PRED} THEN o_totalprice + 10.0
                    ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE {_DIFF_NEW_PRED}
    )
    SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type,
           o.o_orderstatus AS old_o_orderstatus,
           round(o.o_totalprice, 2) AS old_price,
           n.o_orderstatus AS new_o_orderstatus,
           round(n.o_totalprice, 2) AS new_price
    FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    WHERE o.o_orderkey IS NULL
       OR n.o_orderkey IS NULL
       OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
       OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
"""


# ---------------------------------------------------------------------------
# registered query: deterministic CDC delta merged into orders
# ---------------------------------------------------------------------------

# The delta is derived from orders itself so the query is closed over the
# fixtures: keys ending 00..02 get a repriced 'U' row (update), and the
# same rows shifted to key+1e9 are brand-new (insert). The reprice uses
# exact integer-cent arithmetic (floor(x*110 + 0.5)/100) so both engines
# compute bit-identical doubles.
_DELTA_PRED = "o_orderkey % 100 < 3"
_NEW_KEY_OFFSET = 1_000_000_000


def _delta(orders: DataFrame) -> DataFrame:
    base = orders.filter(_DELTA_PRED)
    repriced = F.expr("floor(o_totalprice * 110 + 0.5) / 100.0")
    upd = base.select(
        "o_orderkey",
        "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        repriced.alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    ins = upd.select(
        (F.col("o_orderkey") + _NEW_KEY_OFFSET).alias("o_orderkey"),
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )
    return upd.unionAll(ins)


def orders_merge_upsert(t: dict[str, DataFrame]) -> DataFrame:
    """Merge the synthetic CDC delta into orders, then summarize the
    merged table per status: (o_orderstatus, n_orders, sum_price).
    The summary proves row counts AND replaced values landed; the sum
    is exact integer cents (accumulation-order-proof)."""
    merged = merge_upsert(t["orders"], _delta(t["orders"]), "o_orderkey",
                          broadcast_updates=True)
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(F.sum(cents) / 100.0, 2).alias("sum_price"),
    )


def _scd2_merged(orders: DataFrame) -> DataFrame:
    """The shared SCD2 history: initial one-open-version-per-order
    hist + the synthetic CDC delta applied effective +30 days — the
    DataFrame twin of ``_SCD2_MERGED_CTE``, used by both the history
    summary and the point-in-time join."""
    hist = orders.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.col("o_orderdate").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    upd = _delta(orders).select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("eff_ts"),
    )
    return merge_scd2(hist, upd, "o_orderkey")


def orders_scd2_history(t: dict[str, DataFrame]) -> DataFrame:
    """Apply the synthetic CDC delta as a type-2 merge over an initial
    orders history (every order one open version since its order date;
    delta effective 30 days later), then summarize: versions per status
    × currency flag with exact integer-cent sums. Proves closes, opens
    and inserts all landed with the right validity intervals."""
    merged = _scd2_merged(t["orders"])
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    return merged.groupBy(
        "o_orderstatus",
        F.col("valid_to").isNull().cast("int").alias("is_current"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_versions"),
        F.round(F.sum(cents) / 100.0, 2).alias("sum_price"),
    )


_SCD2_MERGED_CTE = f"""hist AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               o_orderdate AS valid_from, CAST(NULL AS TIMESTAMP) AS valid_to
        FROM orders
    ), delta AS (
        SELECT o_orderkey, 'U' AS o_orderstatus,
               floor(o_totalprice * 110 + 0.5) / 100.0 AS o_totalprice,
               o_orderdate + INTERVAL 30 DAY AS eff_ts
        FROM orders WHERE {_DELTA_PRED}
        UNION ALL
        SELECT o_orderkey + {_NEW_KEY_OFFSET}, 'U',
               floor(o_totalprice * 110 + 0.5) / 100.0,
               o_orderdate + INTERVAL 30 DAY
        FROM orders WHERE {_DELTA_PRED}
    ),
    -- every matched delta row changes the status (to 'U'), so matched
    -- current versions all close; new keys open their first version
    closed AS (
        SELECT h.o_orderkey, h.o_orderstatus, h.o_totalprice,
               h.valid_from, d.eff_ts AS valid_to
        FROM hist h JOIN delta d USING (o_orderkey)
    ), opened AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               eff_ts AS valid_from, CAST(NULL AS TIMESTAMP) AS valid_to
        FROM delta
    ), untouched AS (
        SELECT * FROM hist
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM delta)
    ), merged AS (
        SELECT * FROM closed UNION ALL SELECT * FROM opened
        UNION ALL SELECT * FROM untouched
    )"""


ORDERS_SCD2_ORACLE = f"""
    WITH {_SCD2_MERGED_CTE}
    SELECT o_orderstatus,
           CAST(valid_to IS NULL AS INT) AS is_current,
           count(*) AS n_versions,
           round(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                 AS BIGINT) / 100.0, 2) AS sum_price
    FROM merged
    GROUP BY o_orderstatus, CAST(valid_to IS NULL AS INT)
"""


ORDERS_MERGE_UPSERT_ORACLE = f"""
    WITH delta AS (
        SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
               floor(o_totalprice * 110 + 0.5) / 100.0 AS o_totalprice,
               o_orderdate, o_orderpriority
        FROM orders WHERE {_DELTA_PRED}
        UNION ALL
        SELECT o_orderkey + {_NEW_KEY_OFFSET}, o_custkey, 'U',
               floor(o_totalprice * 110 + 0.5) / 100.0,
               o_orderdate, o_orderpriority
        FROM orders WHERE {_DELTA_PRED}
    ), merged AS (
        SELECT * FROM delta
        UNION ALL
        SELECT o.* FROM orders o
        WHERE o.o_orderkey NOT IN (SELECT o_orderkey FROM delta)
    )
    SELECT o_orderstatus,
           count(*) AS n_orders,
           round(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                 AS BIGINT) / 100.0, 2) AS sum_price
    FROM merged
    GROUP BY o_orderstatus
"""


def scd2_pit_revenue(t: dict[str, DataFrame]) -> DataFrame:
    """Point-in-time (AS OF) dimension join against the SCD2 history —
    the temporally-correct way to attribute facts to slowly-changing
    dimension versions: each lineitem joins the order VERSION that was
    valid at its ship date (``valid_from <= ship < valid_to``), not the
    current one. Training-data analog: attributing examples to the
    labeling-policy version in force when they were collected —
    joining current state instead silently rewrites history.

    Scale shape: an equi-join on the surrogate key with the validity
    range as a residual predicate — versions per key are few (here
    <= 2), so this costs the same shuffle as the plain dimension join;
    no interval index needed. Revenue accumulates in exact integer
    ten-thousandths before the final round.
    """
    li = t["lineitem"]
    merged = _scd2_merged(t["orders"])
    rev4 = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + F.lit(0.5)
    ).cast("long")
    fact = li.select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.col("l_shipdate").alias("ship_ts"),
        rev4.alias("rev4"),
    )
    pit = fact.join(merged, "o_orderkey").filter(
        (F.col("ship_ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ship_ts") < F.col("valid_to")))
    )
    return pit.groupBy(F.col("o_orderstatus").alias("status_at_ship")).agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.round(F.sum("rev4") / 10000.0, 2).alias("revenue"),
    )


SCD2_PIT_ORACLE = f"""
    WITH {_SCD2_MERGED_CTE},
    fact AS (
        SELECT l_orderkey AS o_orderkey, l_shipdate AS ship_ts,
               CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                    AS BIGINT) AS rev4
        FROM lineitem
    )
    SELECT m.o_orderstatus AS status_at_ship,
           CAST(count(*) AS BIGINT) AS n_items,
           round(CAST(sum(rev4) AS BIGINT) / 10000.0, 2) AS revenue
    FROM fact f
    JOIN merged m ON f.o_orderkey = m.o_orderkey
    WHERE f.ship_ts >= m.valid_from
      AND (m.valid_to IS NULL OR f.ship_ts < m.valid_to)
    GROUP BY 1
"""
