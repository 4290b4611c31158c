"""Cache hygiene: no registered query may leak persisted relations.

Operators persist intra-query intermediates and (by design — the
returned DataFrames are lazy) cannot unpersist them themselves; the
release contract is ``cache_scope`` for user sessions and clearCache
for the sweep harnesses (see ``training_etl_demo_2_spark/cache.py``).
This test enforces the contract's load-bearing premise: EVERY persist
issued anywhere under a registered query is routed through the tracked
helpers, so ``cache_scope`` really does release everything. A new
operator that calls bare ``df.persist()`` fails here, not in a user's
week-long session.
"""

from __future__ import annotations

import pytest

from training_etl_demo_2_spark.cache import cache_scope, tracked_persist


def _cache_manager_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_cache_scope_releases_tracked_persists(spark, tables):
    # the session fixture is shared: earlier test files legitimately
    # leave their own cached relations — this test owns the CacheManager
    spark.catalog.clearCache()
    df = tables["nation"].transform(tracked_persist)  # outside any scope
    try:
        assert df.count() > 0
    finally:
        df.unpersist()
    with cache_scope():
        inner = tables["region"].transform(tracked_persist)
        inner.count()
        assert not _cache_manager_empty(spark)
    assert _cache_manager_empty(spark)


@pytest.mark.slow
def test_no_registered_query_leaks_cache(spark, sf_dir):
    import __spark_entry__ as entry

    spark.catalog.clearCache()
    leaks: list[str] = []
    errors: list[str] = []
    for name, fn in entry.queries().items():
        with cache_scope():
            try:
                fn(spark, sf_dir).count()
            except Exception as exc:  # noqa: BLE001 — report, keep sweeping
                errors.append(f"{name}: {type(exc).__name__}")
                spark.catalog.clearCache()
                continue
        if not _cache_manager_empty(spark):
            leaks.append(name)
            spark.catalog.clearCache()  # isolate: blame one query at a time
    assert not errors, f"queries failed to run: {errors}"
    assert not leaks, (
        f"{len(leaks)} queries left persisted relations after cache_scope "
        f"(bare .persist() bypassing cache.tracked_persist?): {leaks}"
    )
