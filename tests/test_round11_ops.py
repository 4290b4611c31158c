"""Round-11 optimization pins: spread_scan probe cache, replay-helper
unification, and the hash-formulation site split."""

from __future__ import annotations

from pyspark.sql import functions as F

from training_etl_demo_2_spark import functions as fns


def test_spread_scan_probe_cache_hits_and_is_correct(spark, tables):
    fns._SPREAD_PROBE_CACHE.clear()
    docs = tables["documents"]
    out1 = fns.spread_scan(docs)
    assert len(fns._SPREAD_PROBE_CACHE) == 1
    out2 = fns.spread_scan(docs)
    # second call reuses the cached probe (no new key) and makes the
    # identical decision
    assert len(fns._SPREAD_PROBE_CACHE) == 1
    assert out1.rdd.getNumPartitions() == out2.rdd.getNumPartitions()
    # a semantically different plan gets its own probe entry
    fns.spread_scan(docs.filter(F.col("doc_id") > 3))
    assert len(fns._SPREAD_PROBE_CACHE) == 2
    # cached decision equals the uncached ground truth: a single-file
    # fixture scan arrives under-parallel and is spread to the session
    # shuffle parallelism
    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    raw_n = docs.rdd.getNumPartitions()
    expect = target if raw_n * 2 <= target else raw_n
    assert out2.rdd.getNumPartitions() == expect
    # row-identical either way
    assert out2.count() == docs.count()


def test_replay_helper_cleans_up_checkpoints(spark, sf_dir, tmp_path):
    import os

    from training_etl_demo_2_spark.streaming import fixture_queries as fq

    base = fq._REPLAY_CKPT_BASE or "/tmp"
    before = {p for p in os.listdir(base) if p.startswith("replay_")}
    out = fq.stream_word_count(spark, sf_dir)
    assert out.count() > 0
    after = {p for p in os.listdir(base) if p.startswith("replay_")}
    assert after <= before, f"leaked checkpoints: {after - before}"
