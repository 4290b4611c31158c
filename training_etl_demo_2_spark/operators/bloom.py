"""Bloom-filter join pruning: a manual runtime filter for big joins.

Spark's own runtime row-group filtering (`spark.sql.optimizer.runtime.
bloomFilter.enabled`) injects bloom filters only into plans the
optimizer recognizes; this module is the explicit, composable version
for when you control the pipeline: build the filter from the (already
filtered) dimension side's join keys, prune the fact side BEFORE its
shuffle, then run the exact join on the survivors.

Design — no driver-side bitmap, no UDF:

* The "bloom filter" is materialized as k small RELATIONS of distinct
  bit positions (`pmod(xxhash64(key, seed_i), m)`), one per hash
  function — at most ``m`` integer rows each (m = 2^16 by default,
  <= 0.5 MB), regardless of dimension size.
* The fact side is pruned by k successive LEFT SEMI joins on its own
  k positions. Each is a broadcast hash join against a bounded-size
  int relation — fully JVM-side, no shuffle of the fact.
* A fact row survives only if ALL k of its positions are set — the
  standard bloom conjunction. Matching keys hash to identical
  positions on both sides, so there are NO false negatives: the final
  equi-join output is exactly ``fact ⋈ dim``. False positives only
  waste a little shuffle, never corrupt the result (the oracle twin is
  the PLAIN join — the bloom layer must be invisible in the output).

At 100 TB: the dim side may be far too large to broadcast as rows, but
its bloom positions never exceed m ints; the fact shuffle that
dominates the join cost shrinks by the filter's selectivity. With
``m = 2^16`` and k = 3 the false-positive rate at n set bits is
``(1 - exp(-k*n/m))^k`` — ~1% at n = 5,000 keys; raise ``m_bits`` as
the key count grows (the relation stays metadata-sized up to 2^24).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_M_BITS = 16  # m = 2^16 positions per hash function
BLOOM_K = 3  # hash functions


def _position(key: Column, seed: int, m_bits: int) -> Column:
    """Bit position of ``key`` under hash function ``seed``: xxhash64
    with a distinct seed column, folded to [0, 2^m_bits)."""
    return F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(1 << m_bits))


def bloom_prefilter(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Prune ``fact`` to rows whose ``fact_key`` passes the bloom
    filter built from ``dim[dim_key]``. Superset-safe: every fact row
    that has a join partner survives."""
    pruned = fact
    for seed in range(k):
        positions = dim.select(
            _position(F.col(dim_key), seed, m_bits).alias("pos")
        ).distinct()
        pruned = pruned.join(
            F.broadcast(positions),
            _position(F.col(fact_key), seed, m_bits) == positions["pos"],
            "left_semi",
        )
    return pruned


def bloom_prefilter_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Exactly ``fact ⋈ dim`` (inner equi-join), with the fact side
    bloom-pruned before the join shuffle."""
    pruned = bloom_prefilter(fact, dim, fact_key, dim_key, m_bits, k)
    return pruned.join(dim, pruned[fact_key] == dim[dim_key])


def delinquent_order_revenue(t: dict[str, DataFrame]) -> DataFrame:
    """Registered demo: orders of negative-balance customers by
    priority — the dim side (filtered customers) drives a bloom filter
    that prunes the orders scan before the join. Output is the plain
    join's aggregate; the bloom layer must not change a single row.

    Integer-cent revenue (t4 sums) keeps the aggregate exact across
    engines.
    """
    dim = t["customer"].filter(F.col("c_acctbal") < 0).select("c_custkey")
    joined = bloom_prefilter_join(t["orders"], dim, "o_custkey", "c_custkey")
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            (
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / 100.0
            ).alias("revenue"),
        )
        .select("o_orderpriority", "n_orders", F.round("revenue", 2).alias("revenue"))
    )


DELINQUENT_ORDER_REVENUE_SQL = """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2)
               AS revenue
    FROM orders
    JOIN (SELECT c_custkey FROM customer WHERE c_acctbal < 0) c
      ON o_custkey = c_custkey
    GROUP BY o_orderpriority
"""
