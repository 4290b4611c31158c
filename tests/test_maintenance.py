"""Planted-fixture tests for the table-maintenance planners and the
round-5 audit/sketch operators (maintenance.py, temporal watermark
audit, similarity random projection, dedup representatives)."""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import functions as F

from training_etl_demo_2_spark.operators import (
    dedup,
    maintenance,
    similarity,
    temporal,
)


# ---------------------------------------------------------------------------
# file_compaction_plan
# ---------------------------------------------------------------------------


def _evt(event_id, hour, etype, props):
    return (
        event_id,
        dt.datetime(2024, 1, 1, hour, 30, 0),
        1,
        etype,
        1.0,
        props,
    )


EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_compaction_bins_by_byte_offset(spark):
    # Three hourly files: bytes = 28 + len(etype) + len(props)
    # hour 0: 2 rows of 28+1+1=30  -> 60 B
    # hour 1: 1 row of 28+1+12=41  -> 41 B
    # hour 2: 1 row of 28+1+1=30   -> 30 B
    # target 100: offsets 0, 60, 101 -> bins 0, 0, 1
    rows = [
        _evt(0, 0, "a", "x"),
        _evt(1, 0, "a", "x"),
        _evt(2, 1, "b", "y" * 12),
        _evt(3, 2, "c", "z"),
    ]
    t = {"events": spark.createDataFrame(rows, EVENTS_SCHEMA)}
    out = {
        r["bin_id"]: r.asDict()
        for r in maintenance.file_compaction_plan(t, target_bytes=100).collect()
    }
    assert out[0]["n_files"] == 2 and out[0]["total_bytes"] == 101
    assert out[1]["n_files"] == 1 and out[1]["total_bytes"] == 30
    assert out[0]["min_file_id"] + 1 == out[0]["max_file_id"]


def test_compaction_null_props_counted_as_zero(spark):
    rows = [(0, dt.datetime(2024, 1, 1, 0), 1, "a", 1.0, None)]
    t = {"events": spark.createDataFrame(rows, EVENTS_SCHEMA)}
    [r] = maintenance.file_compaction_plan(t).collect()
    assert r["total_bytes"] == 29  # 28 fixed + len("a")


# ---------------------------------------------------------------------------
# zorder_files
# ---------------------------------------------------------------------------


def _morton_ref(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_interleave_matches_reference(spark):
    pts = [(3, 1), (0, 0), (65535, 65535), (1, 2), (255, 0)]
    df = spark.createDataFrame(pts, "x long, y long").select(
        "x", "y",
        maintenance._interleave_bits(F.col("x"), F.col("y")).alias("z"),
    )
    for r in df.collect():
        assert r["z"] == _morton_ref(r["x"], r["y"]), (r["x"], r["y"])


def test_zorder_files_cover_all_rows_in_fixed_chunks(tables):
    n = tables["lineitem"].count()
    out = maintenance.zorder_files(tables, rows_per_file=1000).collect()
    assert sum(r["n_rows"] for r in out) == n
    sizes = sorted(r["n_rows"] for r in out)
    # every file full except possibly the last
    assert all(s == 1000 for s in sizes[:-1]) or len(sizes) == 1
    for r in out:
        assert r["min_part"] <= r["max_part"]
        assert r["min_supp"] <= r["max_supp"]


def test_zorder_tightens_minmax_boxes_vs_orderkey_sort(tables):
    """The point of Z-ORDER: per-file min/max boxes on the interleaved
    dims are tighter than an unrelated (orderkey) clustering — so scan
    pruning works. Compare summed part-key span."""
    zed = maintenance.zorder_files(tables, rows_per_file=1000).collect()
    z_span = sum(r["max_part"] - r["min_part"] for r in zed) / len(zed)
    li = tables["lineitem"]
    base = (
        li.select(
            (F.col("l_orderkey") % 60).alias("file_id"),
            "l_partkey",
        )
        .groupBy("file_id")
        .agg((F.max("l_partkey") - F.min("l_partkey")).alias("span"))
        .collect()
    )
    base_span = sum(r["span"] for r in base) / len(base)
    assert z_span < base_span * 0.5


# ---------------------------------------------------------------------------
# watermark_lateness_audit
# ---------------------------------------------------------------------------


def test_watermark_audit_monotone_and_exact(spark):
    # Two events, reversed arrival via jitter-free construction check:
    # use the real operator on a planted frame and recompute expected
    # drops in pure python with the same jitter formula.
    # 1-minute spacing so the <=600 s jitter actually reorders arrivals
    stamps = [dt.datetime(2024, 1, 1, 0, m) for m in range(0, 10, 2)]
    rows = [
        (i, ts, 1, "a", 1.0, "x") for i, ts in enumerate(stamps)
    ]
    t = {"events": spark.createDataFrame(rows, EVENTS_SCHEMA)}
    out = {
        r["delay_s"]: r.asDict()
        for r in temporal.watermark_lateness_audit(t).collect()
    }
    # python reference
    ev = [(i, ts.timestamp() * 1e6) for i, ts in enumerate(stamps)]
    arr = sorted(
        (ts + (i * 2654435761) % 4294967296 % 600 * 1e6, i, ts)
        for i, ts in ev
    )
    run, late = -1e30, {}
    for a, i, ts in arr:
        run = max(run, ts)
        late[i] = run - ts
    for d in temporal.WATERMARK_DELAYS:
        expect = sum(1 for v in late.values() if v > d * 1e6)
        assert out[d]["n_late"] == expect, d
        assert out[d]["n_events"] == 5
    # monotone non-increasing in delay
    ds = sorted(out)
    assert all(
        out[a]["n_late"] >= out[b]["n_late"] for a, b in zip(ds, ds[1:])
    )


# ---------------------------------------------------------------------------
# random_projection
# ---------------------------------------------------------------------------


def test_random_projection_matches_numpy(spark):
    rng = np.random.RandomState(7)
    v = rng.randn(64).astype(np.float32)
    df = spark.createDataFrame(
        [(0, [float(x) for x in v], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    out = {
        r["comp"]: r["rp"]
        for r in similarity.random_projection(df).collect()
    }
    signs = similarity._rp_signs()
    q = np.floor(v.astype(np.float64) * 1e9).astype(np.int64)
    for c in range(similarity.RP_OUT):
        assert out[c] == round(int(q @ signs[:, c]) / 1e9, 6)


def test_random_projection_zero_vector_is_zero(spark):
    df = spark.createDataFrame(
        [(0, [0.0] * 64, 1)], "vec_id long, embedding array<float>, label int"
    )
    assert all(
        r["rp"] == 0.0 for r in similarity.random_projection(df).collect()
    )


# ---------------------------------------------------------------------------
# dedup_representatives
# ---------------------------------------------------------------------------


def test_representative_is_longest_then_lowest_id(spark):
    # Three near-identical docs (one shared long text) + one unique doc.
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (10, base + " extra", "en", "web", len(base) + 6),
        (11, base, "en", "web", len(base)),
        (12, base + " extra", "en", "web", len(base) + 6),
        (99, "totally different text with nothing shared here at all",
         "en", "web", 55),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )
    out = dedup.dedup_representatives(df, threshold=0.5).collect()
    assert len(out) == 1
    [r] = out
    assert r["n_docs"] == 3
    # 10 and 12 tie on n_chars; lowest doc_id wins
    assert r["rep_doc_id"] == 10 and r["rep_n_chars"] == len(base) + 6
