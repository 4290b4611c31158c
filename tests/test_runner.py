"""The leak-free front door: run_query/run_queries apply cache_scope by
default, so an ad-hoc user session — no explicit scope anywhere — keeps
an empty CacheManager however many persist-heavy queries it runs
(VERDICT r7 item: test_cache_hygiene proved queries CAN run leak-free;
this proves the public runner makes that the default)."""

from __future__ import annotations

import pytest

from training_etl_demo_2_spark.runner import run_query, run_queries


def _cache_manager_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


# three registry entries whose operators all issue tracked persists
# (shingle arrays + verified pairs, the near-dup edge relation twice)
PERSIST_HEAVY = ["dedup_minhash_lsh", "near_dup_clusters", "pagerank_near_dups"]


def test_three_queries_no_scope_leave_cache_empty(spark, sf_dir):
    spark.catalog.clearCache()
    for name in PERSIST_HEAVY:
        rows = run_query(spark, name, sf_dir)
        assert isinstance(rows, list)
    assert _cache_manager_empty(spark), (
        "run_query must release every operator persist before returning"
    )


def test_run_query_returns_rows(spark, sf_dir):
    rows = run_query(spark, "word_count", sf_dir)
    assert rows and {"word", "cnt"} <= set(rows[0].asDict())


def test_run_query_accepts_callable(spark, sf_dir):
    import __spark_entry__ as entry

    fn = entry.queries()["top10_words"]
    assert len(run_query(spark, fn, sf_dir)) == 10


def test_run_query_unknown_name(spark, sf_dir):
    with pytest.raises(KeyError, match="unknown query"):
        run_query(spark, "no_such_query", sf_dir)


def test_run_queries_isolates_errors(spark, sf_dir):
    def boom(_spark, _sf):
        raise RuntimeError("synthetic")

    out = run_queries(spark, {"ok": "word_count", "bad": boom}, sf_dir)
    assert isinstance(out["ok"], list) and isinstance(out["bad"], RuntimeError)
    assert _cache_manager_empty(spark)
