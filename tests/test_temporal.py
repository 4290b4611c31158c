"""As-of join and banded range join: semantics on hand-built frames plus
a differential check against a naive theta-join formulation."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from training_etl_demo_2_spark.operators import temporal


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), 100.0, None),
            ("A", _ts("2024-01-01 10:00:05"), None, "stale"),  # null col rides along
            ("A", _ts("2024-01-01 10:00:10"), 102.0, "fresh"),
            ("B", _ts("2024-01-01 10:00:03"), 50.0, "only"),
        ],
        "sym string, qts timestamp, px double, note string",
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 09:59:59"), 1),  # before any quote
            ("A", _ts("2024-01-01 10:00:05"), 2),  # exact tie with quote 2
            ("A", _ts("2024-01-01 10:00:07"), 3),  # between quotes 2 and 3
            ("A", _ts("2024-01-01 10:01:00"), 4),  # after all quotes
            ("B", _ts("2024-01-01 10:00:02"), 5),  # before B's only quote
            ("C", _ts("2024-01-01 10:00:00"), 6),  # key with no right side
        ],
        "sym string, ts timestamp, trade_id int",
    )


def test_asof_backward(spark, trades, quotes):
    out = {
        r["trade_id"]: (r["px"], r["note"])
        for r in temporal.asof_join(
            trades, quotes, on="sym", left_ts="ts", right_ts="qts"
        ).collect()
    }
    assert out[1] == (None, None)  # nothing at-or-before
    # tie is inclusive AND the whole right row is carried atomically:
    # quote at 10:00:05 has px=NULL, note='stale' — no stitching of the
    # older px=100.0 into it.
    assert out[2] == (None, "stale")
    assert out[3] == (None, "stale")
    assert out[4] == (102.0, "fresh")
    assert out[5] == (None, None)
    assert out[6] == (None, None)
    assert len(out) == 6


def test_asof_forward(spark, trades, quotes):
    out = {
        r["trade_id"]: (r["px"], r["note"])
        for r in temporal.asof_join(
            trades, quotes, on="sym", left_ts="ts", right_ts="qts",
            direction="forward",
        ).collect()
    }
    assert out[1] == (100.0, None)
    assert out[2] == (None, "stale")  # tie inclusive forward too
    assert out[3] == (102.0, "fresh")
    assert out[4] == (None, None)  # nothing at-or-after
    assert out[5] == (50.0, "only")
    assert out[6] == (None, None)


def test_asof_column_collision_raises(trades, quotes):
    with pytest.raises(ValueError, match="collision"):
        temporal.asof_join(
            trades.withColumnRenamed("trade_id", "px"),
            quotes,
            on="sym",
            left_ts="ts",
            right_ts="qts",
        )


def test_asof_bad_direction(trades, quotes):
    with pytest.raises(ValueError, match="direction"):
        temporal.asof_join(trades, quotes, on="sym", direction="nearest")


def test_banded_range_join_matches_naive(spark, tables):
    """Banded plan == naive theta-join on the fixture events table."""
    e = tables["events"].select(
        "user_id", F.unix_micros("ts").alias("t"), "event_id"
    )
    ivs = e.select(
        "user_id",
        F.col("t").alias("lo"),
        (F.col("t") + 600 * 1_000_000).alias("hi"),
        F.col("event_id").alias("iv_id"),
    )
    pts = e.select("user_id", F.col("t").alias("pt"), "event_id")
    banded = temporal.banded_range_join(
        pts, ivs, on="user_id", point_ts="pt",
        interval_lo="lo", interval_hi="hi", max_span=600 * 1_000_000,
    ).select("event_id", "iv_id")
    naive = pts.join(ivs, on="user_id").filter(
        (F.col("pt") >= F.col("lo")) & (F.col("pt") <= F.col("hi"))
    ).select("event_id", "iv_id")
    assert sorted(map(tuple, banded.collect())) == sorted(
        map(tuple, naive.collect())
    )
    assert banded.count() > 0


def test_banded_range_join_infers_span(spark):
    ivs = spark.createDataFrame(
        [(1, 0, 10, "a"), (1, 5, 25, "b")], "k int, lo long, hi long, iv string"
    )
    pts = spark.createDataFrame(
        [(1, 0), (1, 5), (1, 10), (1, 11), (1, 25), (1, 26), (2, 5)],
        "k int, p long",
    )
    got = sorted(
        (r["p"], r["iv"])
        for r in temporal.banded_range_join(
            pts, ivs, on="k", point_ts="p", interval_lo="lo", interval_hi="hi"
        ).collect()
    )
    assert got == [(0, "a"), (5, "a"), (5, "b"), (10, "a"), (10, "b"),
                   (11, "b"), (25, "b")]


def test_registered_temporal_queries(spark, tables):
    asof = temporal.asof_last_order(tables)
    assert asof.count() == tables["events"].count()  # left-outer: no row loss
    # any matched row must satisfy the as-of predicate
    bad = asof.filter(
        F.col("last_order_ts").isNotNull()
        & (F.col("last_order_ts") > F.col("ts"))
    ).count()
    assert bad == 0
    pairs = temporal.events_followups_within(tables, gap_s=3600)
    assert pairs.filter(F.col("n_pairs") <= 0).count() == 0


# ---------------------------------------------------------------------------
# Property-based differential: asof_join vs pandas.merge_asof
# ---------------------------------------------------------------------------

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False

if HAVE_HYPOTHESIS:
    _key = st.integers(min_value=0, max_value=3)
    _t = st.integers(min_value=0, max_value=50)

    @settings(
        max_examples=20,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        left=st.lists(st.tuples(_key, _t), min_size=0, max_size=25),
        right=st.lists(st.tuples(_key, _t), min_size=0, max_size=25),
    )
    def test_asof_backward_matches_pandas_merge_asof(spark, left, right):
        import pandas as pd

        # dedup right on (key, t): as-of is ambiguous on duplicate
        # timestamps (pandas keeps the LAST dup; engines may differ) —
        # the operator's contract (see asof_last_order) requires a
        # pre-aggregated right side.
        rdict = {}
        for i, (k, t) in enumerate(right):
            rdict[(k, t)] = i
        right_rows = [(k, t, v) for (k, t), v in rdict.items()]
        left_rows = [(k, t, i) for i, (k, t) in enumerate(left)]

        ldf = spark.createDataFrame(
            left_rows, "k int, ts int, lid int"
        ) if left_rows else spark.createDataFrame([], "k int, ts int, lid int")
        rdf = spark.createDataFrame(
            right_rows, "k int, ts int, rval int"
        ) if right_rows else spark.createDataFrame([], "k int, ts int, rval int")

        from training_etl_demo_2_spark.operators import temporal as tmp

        got = {
            r["lid"]: r["rval"]
            for r in tmp.asof_join(
                ldf, rdf.withColumnRenamed("ts", "rts"),
                on="k", left_ts="ts", right_ts="rts",
            ).collect()
        }

        lp = (
            pd.DataFrame(left_rows, columns=["k", "ts", "lid"])
            .astype({"k": "int64", "ts": "int64", "lid": "int64"})
            .sort_values(["ts", "lid"])
        )
        rp = (
            pd.DataFrame(right_rows, columns=["k", "ts", "rval"])
            .astype({"k": "int64", "ts": "int64", "rval": "int64"})
            .sort_values(["ts", "rval"])
        )
        if lp.empty:
            assert got == {}
            return
        merged = pd.merge_asof(
            lp, rp, on="ts", by="k", direction="backward",
            allow_exact_matches=True,
        )
        want = {
            int(r.lid): (None if pd.isna(r.rval) else int(r.rval))
            for r in merged.itertuples()
        }
        assert got == want


def test_interval_overlap_join_emit_once(spark):
    """A pair overlapping across several shared buckets must surface
    exactly once; touching-at-endpoint counts as overlap; disjoint
    intervals never pair."""
    from training_etl_demo_2_spark.operators.temporal import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [(1, 10, "a", 0, 100)],  # long interval spans many buckets
        "k long, lid long, tag string, l_lo long, l_hi long",
    ).select("k", "lid", "l_lo", "l_hi")
    right = spark.createDataFrame(
        [(1, 20, 50, 150),   # overlaps [0,100] across buckets
         (1, 21, 100, 120),  # touches at exactly 100 -> overlap
         (1, 22, 101, 200),  # disjoint
         (2, 23, 0, 100)],   # wrong key
        "k long, rid long, r_lo long, r_hi long",
    )
    out = interval_overlap_join(
        left, right, on="k", max_span=20  # small buckets force multi-bucket pairs
    ).collect()
    assert sorted(r.rid for r in out) == [20, 21]
    assert len(out) == 2  # emit-once despite many shared buckets


def test_active_coverage_merges_overlaps(spark):
    """Hand-computed sweep: overlapping intervals merge (no double
    count), back-to-back intervals chain, disjoint intervals add."""
    from datetime import datetime

    from training_etl_demo_2_spark.operators import temporal

    m = 60 * 1_000_000
    ev = spark.createDataFrame(
        [
            # user 1: events at t=0 and t=10min -> [0,30)+[10,40) merge
            # to [0,40) = 40 min covered, span 40 min
            (1, datetime(2024, 1, 1, 0, 0, 0)),
            (1, datetime(2024, 1, 1, 0, 10, 0)),
            # user 2: events at 0 and 30min -> back-to-back [0,30)+
            # [30,60) chain to 60 min covered
            (2, datetime(2024, 1, 1, 0, 0, 0)),
            (2, datetime(2024, 1, 1, 0, 30, 0)),
            # user 3: events at 0 and 2h -> disjoint, 30+30 covered,
            # span 150 min
            (3, datetime(2024, 1, 1, 0, 0, 0)),
            (3, datetime(2024, 1, 1, 2, 0, 0)),
        ],
        "user_id long, ts timestamp",
    )
    out = {
        r.user_id: r
        for r in temporal.user_active_coverage({"events": ev}).collect()
    }
    assert out[1].covered_us == 40 * m and out[1].span_us == 40 * m
    assert out[1].utilization_bp == 10000
    assert out[2].covered_us == 60 * m and out[2].utilization_bp == 10000
    assert out[3].covered_us == 60 * m and out[3].span_us == 150 * m
    assert out[3].utilization_bp == 4000
    assert all(r.n_events == 2 for r in out.values())
