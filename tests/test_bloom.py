"""Bloom-prefilter join: no false negatives (exactness) + real pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from training_etl_demo_2_spark.operators import bloom


def test_bloom_prefilter_keeps_all_matches_and_prunes(spark):
    """Every fact row with a join partner survives the prefilter; with
    a tiny dim against a wide fact key space, most non-matching rows
    are pruned before the join."""
    fact = spark.range(0, 20000).select(F.col("id").alias("k"))
    dim = spark.range(0, 20000, 997).select(F.col("id").alias("dk"))  # 21 keys
    pruned = bloom.bloom_prefilter(fact, dim, "k", "dk")
    kept = {r.k for r in pruned.collect()}
    matches = {r.dk for r in dim.collect()}
    assert matches <= kept  # no false negatives
    # k=3 hashes, m=2^16, 21 set keys -> fp rate ~(21*3/65536)^3: tiny
    assert len(kept) < 200


def test_bloom_join_equals_plain_join(tables):
    """The bloom-pruned join is row-for-row the plain join on the
    fixture tables."""
    dim = tables["customer"].filter(F.col("c_acctbal") < 0).select("c_custkey")
    fact = tables["orders"]
    got = bloom.bloom_prefilter_join(fact, dim, "o_custkey", "c_custkey")
    want = fact.join(dim, fact["o_custkey"] == dim["c_custkey"])
    assert got.count() == want.count()
    assert got.select("o_orderkey").exceptAll(want.select("o_orderkey")).count() == 0


def test_bloom_positions_relation_is_bounded(spark):
    """The per-hash position relation never exceeds m rows, no matter
    how large the dimension is (the scale invariant)."""
    dim = spark.range(0, 300000).select(F.col("id").alias("dk"))
    m_bits = 8  # m = 256 << |dim|
    pos = dim.select(
        bloom._position(F.col("dk"), 0, m_bits).alias("pos")
    ).distinct()
    assert pos.count() <= 256
