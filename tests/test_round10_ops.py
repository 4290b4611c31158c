"""Planted-value tests for the round-10 operators: intra-document
paragraph dedup (MassiveText repetition removal)."""

from __future__ import annotations


def test_paragraph_dedup_planted(spark):
    """Hand-computed keep-first removal at seg_words=3."""
    from training_etl_demo_2_spark.operators.dedup import paragraph_dedup

    df = spark.createDataFrame(
        [
            # segments: "a b c" | "a b c" | "d e f" -> pos-1 dup dropped
            (1, "a b c a b c d e f"),
            # one short segment, nothing repeated
            (2, "x y"),
            # trailing partial segment; "p q r" repeats at pos 2
            (3, "p q r s t u p q r"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in paragraph_dedup(df).collect()}
    assert set(out) == {1, 2, 3}  # every input doc is reported

    assert out[1].clean_text == "a b c d e f"
    assert out[1].n_paras == 3 and out[1].n_dup_paras == 1
    assert out[1].dup_para_share_bp == 3333  # floor(10000/3)
    assert out[1].dup_char_share_bp == 3333  # 5 of 15 chars

    assert out[2].clean_text == "x y"
    assert out[2].n_paras == 1 and out[2].n_dup_paras == 0
    assert out[2].dup_para_share_bp == 0
    assert out[2].dup_char_share_bp == 0

    assert out[3].clean_text == "p q r s t u"
    assert out[3].n_paras == 3 and out[3].n_dup_paras == 1


def test_paragraph_dedup_order_preserved_and_idempotent(spark):
    """Survivors keep original order; re-running on cleaned text is a
    fixed point (no further dups at the same grain)."""
    from training_etl_demo_2_spark.operators.dedup import paragraph_dedup

    df = spark.createDataFrame(
        [(1, "z z z a a a z z z b b b a a a")],
        "doc_id long, text string",
    )
    first = paragraph_dedup(df).collect()[0]
    assert first.clean_text == "z z z a a a b b b"
    again = paragraph_dedup(
        spark.createDataFrame(
            [(1, first.clean_text)], "doc_id long, text string"
        )
    ).collect()[0]
    assert again.clean_text == first.clean_text
    assert again.n_dup_paras == 0


def test_hdr_quantile_audit_planted(spark):
    """Hand-computed two-sig-digit buckets, rank selection, and the
    certified error bound on a 2-type, 2-day corpus."""
    from datetime import datetime

    from training_etl_demo_2_spark.operators.sketches import (
        hdr_quantile_audit,
    )

    d1, d2 = datetime(2024, 1, 1, 8), datetime(2024, 1, 2, 9)
    rows = [
        # type a cents: 123, 345, 347, 12000, 12150 across two days
        (d1, "a", 1.23), (d1, "a", 3.45), (d2, "a", 3.47),
        (d2, "a", 120.00), (d2, "a", 121.50),
        # type b: a zero and a one-digit value
        (d1, "b", 0.0), (d2, "b", 0.05),
    ]
    df = spark.createDataFrame(
        rows, "ts timestamp, event_type string, value double"
    )
    out = {
        (r.event_type, r.q_bp): r
        for r in hdr_quantile_audit({"events": df}).collect()
    }
    assert all(r.mismatched_cells == 0 for r in out.values())
    assert all(r.within_10pct for r in out.values())

    # type a buckets: 120(n=1), 340(n=2), 12000(n=2); ranks 2,3,4,5,5
    a = out[("a", 2500)]
    assert (a.est_c, a.ub_c, a.rel_err_bp_bound) == (340, 349, 264)
    assert out[("a", 5000)].est_c == 340
    for q in (7500, 9000, 9900):
        r = out[("a", q)]
        assert (r.est_c, r.ub_c, r.rel_err_bp_bound) == (12000, 12999, 832)
    # exact rank-2 value is 345 cents: inside the certified interval
    assert a.est_c <= 345 <= a.ub_c

    # type b: zero bucket is exact (divisor 1)
    b = out[("b", 2500)]
    assert (b.est_c, b.ub_c, b.rel_err_bp_bound) == (0, 0, 0)
    assert out[("b", 9900)].est_c == 5 and out[("b", 9900)].ub_c == 5


def test_hdr_quantile_audit_certifies_exact(spark, tables):
    """On the real fixture, every row's certified interval
    [est_c, ub_c] must contain the EXACT quantile at the same rank
    rule — the property the rel_err_bp_bound column certifies."""
    from training_etl_demo_2_spark.operators.sketches import (
        hdr_quantile_audit,
    )

    ev = tables["events"].select("ts", "event_type", "value").toPandas()
    ev["u"] = (ev["value"] * 100 + 0.5).astype("int64")
    out = hdr_quantile_audit({"events": tables["events"]}).collect()
    assert out, "empty audit"
    for r in out:
        assert r.mismatched_cells == 0
        assert r.within_10pct, (r.event_type, r.q_bp, r.rel_err_bp_bound)
        vals = sorted(ev.loc[ev.event_type == r.event_type, "u"])
        assert r.n_total == len(vals)
        rank = (r.q_bp * len(vals) + 9999) // 10000
        exact = vals[rank - 1]
        assert r.est_c <= exact <= r.ub_c, (
            r.event_type, r.q_bp, r.est_c, exact, r.ub_c
        )


def test_hdr_quantile_audit_drops_negative_and_null(spark):
    """The digit-count bucket rule is sign-unaware and NULL lb would
    order differently across engines — both engines drop those rows
    identically, and n_total reflects the kept lattice only."""
    from datetime import datetime

    from training_etl_demo_2_spark.operators.sketches import (
        hdr_quantile_audit,
    )

    d1 = datetime(2024, 1, 1, 8)
    df = spark.createDataFrame(
        [(d1, "a", 1.00), (d1, "a", -5.00), (d1, "a", None),
         (d1, "a", 2.00)],
        "ts timestamp, event_type string, value double",
    )
    out = hdr_quantile_audit({"events": df}).collect()
    assert out and all(r.n_total == 2 for r in out)
    assert all(r.est_c in (100, 200) for r in out)


def test_orc_roundtrip_sweep_spares_live_owner(tmp_path, monkeypatch):
    """Round-10 review fix, pinned: a stale-mtime sibling dir whose
    recorded owner pid is STILL ALIVE must survive the sweep (an idle
    session's lazy DataFrame may still reference it); one with a dead
    owner — or no pid record at all — is swept."""
    import os
    import time

    from training_etl_demo_2_spark import io as io_mod

    root = tmp_path / "orc_rt"
    root.mkdir()
    live_idle = root / "app-live-idle"
    dead = root / "app-dead-pid"
    legacy = root / "app-no-pid"
    for d in (live_idle, dead, legacy):
        d.mkdir()
    (live_idle / "owner.pid").write_text(str(os.getpid()))
    (dead / "owner.pid").write_text("999999999")
    old = time.time() - io_mod.ORC_ROUNDTRIP_STALE_S - 60
    for d in (live_idle, dead, legacy):
        os.utime(d, (old, old))
    monkeypatch.setattr(io_mod, "ORC_ROUNDTRIP_DIR", str(root))
    own = root / "app-own"
    io_mod._orc_roundtrip_register_cleanup(str(own))
    assert live_idle.exists(), "idle-but-alive session's dir was reaped"
    assert not dead.exists(), "dead-owner dir not swept"
    assert not legacy.exists(), "legacy pid-less stale dir not swept"
    # registration recorded our own pid for future sweeps to honor
    assert (own / "owner.pid").read_text() == str(os.getpid())


def test_paragraph_dedup_null_text_drops(spark):
    """Contract pin: NULL text segments to nothing and the doc drops
    out (same in the DuckDB twin); empty text survives as one empty
    segment."""
    from training_etl_demo_2_spark.operators.dedup import paragraph_dedup

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a b c")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in paragraph_dedup(df).collect()}
    assert set(out) == {2, 3}
    assert out[2].clean_text == "" and out[2].n_paras == 1
