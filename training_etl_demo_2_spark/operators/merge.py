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
