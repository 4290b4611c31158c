"""Leak-free execution front door for ad-hoc (user-session) queries.

``tests/test_cache_hygiene.py`` proves every registered query CAN run
leak-free inside :func:`~training_etl_demo_2_spark.cache.cache_scope`;
this module makes that the default path rather than a discipline the
caller must remember. A user who calls a registry function directly and
keeps only the lazy DataFrame accumulates tracked persists until
``clearCache`` — because the persists materialize under the CALLER's
action, outside any scope. :func:`run_query` closes that hole: it
builds the plan, materializes it, and exits the scope (releasing every
operator-issued persist) before handing back the result, which is rows
— not a lazy plan — so nothing can re-materialize the persisted
intermediates afterwards.

The sweep harnesses (bench.py, tools/check_oracle.py) keep their
clearCache-between-queries policy: they own the whole session, and
timing the plan build separately from materialization is part of their
contract.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, Row, SparkSession

from .cache import cache_scope

QueryFn = Callable[[SparkSession, str], DataFrame]


def _resolve(query: str | QueryFn) -> QueryFn:
    if callable(query):
        return query
    import __spark_entry__ as entrymod  # repo-root driver contract

    registry = entrymod.queries()
    if query not in registry:
        raise KeyError(
            f"unknown query {query!r}; see __spark_entry__.queries()"
        )
    return registry[query]


def run_query(
    spark: SparkSession,
    query: str | QueryFn,
    sf_dir: str,
) -> list[Row]:
    """Run one registered query (by name or as the registry callable)
    to completion inside a ``cache_scope`` and return its rows.

    Every intermediate the operator persisted (shingle arrays, edge
    relations, posting lists) is released before this returns — the
    session's CacheManager is left exactly as found, however many
    queries a long-lived session runs through here.
    """
    fn = _resolve(query)
    with cache_scope():
        return fn(spark, sf_dir).collect()


def run_queries(
    spark: SparkSession,
    queries: dict[str, str | QueryFn] | list[str],
    sf_dir: str,
) -> dict[str, list[Row] | Exception]:
    """Run several queries back-to-back, each in its own scope (one
    query's persists never squat in memory while the next runs).
    Errors are captured per query, not raised — a sweep over a mixed
    registry survives one broken entry."""
    items: list[tuple[str, str | QueryFn]] = (
        [(q, q) for q in queries]
        if isinstance(queries, list)
        else list(queries.items())
    )
    out: dict[str, Any] = {}
    for name, q in items:
        try:
            out[name] = run_query(spark, q, sf_dir)
        except Exception as exc:  # noqa: BLE001 — per-query isolation
            out[name] = exc
    return out
