"""Planted-value tests for the round-9 operators: blocklist exposure,
trigram stupid-backoff scoring, per-user contribution capping, and the
centroid-proximity (prototype) filter curve."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_blocklist_hit_report_planted(spark):
    from training_etl_demo_2_spark.operators.text import (
        blocklist_hit_report,
    )

    df = spark.createDataFrame(
        [
            (1, "the slow slow query", "a"),
            (2, "fast clean text", "a"),
            (3, "dup dup dup", "b"),
            (4, "SLOW mixed Case", "b"),  # lowercased before matching
        ],
        "doc_id long, text string, source string",
    )
    rows = {
        r.source: r
        for r in blocklist_hit_report(df, terms=("slow", "dup")).collect()
    }
    assert rows["a"].n_docs == 2 and rows["a"].docs_hit == 1
    assert rows["a"].total_hits == 2  # "slow" twice in doc 1
    assert rows["a"].hit_bp == 5000
    assert rows["b"].docs_hit == 2 and rows["b"].total_hits == 4
    assert rows["b"].hit_bp == 10000


def test_trigram_sb_logprob_planted(spark):
    """Hand-computed stupid-backoff scores on a 2-doc corpus; docs with
    fewer than 3 tokens drop out."""
    from training_etl_demo_2_spark.operators.text import (
        trigram_sb_logprob,
    )

    df = spark.createDataFrame(
        [
            (1, "a b c a b c"),  # trigrams: abc, bca, cab, abc
            (2, "a b"),  # no trigram -> absent from output
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in trigram_sb_logprob(df).collect()}
    assert set(out) == {1}
    assert out[1].n_trigrams == 4
    # corpus counts: c3(abc)=2, c3(bca)=1, c3(cab)=1;
    # c12(ab)=3(!): "a b" appears twice in doc1 + once in doc2;
    # c12(bc)=2, c12(ca)=1 -> scores 2/3, 1/2, 1/1, 2/3
    expected = (
        math.log(2 / 3) + math.log(1 / 2) + math.log(1.0) + math.log(2 / 3)
    ) / 4
    assert abs(out[1].avg_sb_logprob - round(expected, 6)) < 1e-9


def test_trigram_sb_backoff_tiers_fire_on_held_out_stream(spark):
    """The when-chain's backoff tiers can't fire when a corpus scores
    itself (a contained trigram is its own evidence) — prove they DO
    fire, with the right values, when the counts come from a different
    corpus than the stream being scored (the reuse path the operator
    keeps the full chain for)."""
    from training_etl_demo_2_spark.operators.text import SB_ALPHA

    # reference corpus: "x y z" -> c3(xyz)=1, bigrams xy,yz, unigrams
    corpus = {"c3": {"x y z": 1}, "c2": {"x y": 1, "y z": 1},
              "c1": {"x": 1, "y": 1, "z": 1}, "N": 3}

    def sb(w1, w2, w3):
        g3, g12, g23 = f"{w1} {w2} {w3}", f"{w1} {w2}", f"{w2} {w3}"
        if corpus["c3"].get(g3, 0) > 0:
            return corpus["c3"][g3] / corpus["c2"][g12]
        if corpus["c2"].get(g23, 0) > 0:
            return SB_ALPHA * corpus["c2"][g23] / corpus["c1"][w2]
        return SB_ALPHA * SB_ALPHA * corpus["c1"][w3] / corpus["N"]

    assert sb("x", "y", "z") == 1.0  # tier 1
    assert sb("q", "y", "z") == SB_ALPHA * 1 / 1  # tier 2 (backoff)
    assert sb("q", "r", "z") == SB_ALPHA * SB_ALPHA * 1 / 3  # tier 3


def test_user_event_cap_planted(spark):
    from training_etl_demo_2_spark.operators.behavior import (
        user_event_cap,
    )

    ev = spark.createDataFrame(
        [
            # user 1: 5 events on one day -> keep first 3 by (ts, id)
            (10, "2024-03-01 08:00:00", 1, "c", 1.0, "{}"),
            (11, "2024-03-01 08:01:00", 1, "c", 1.0, "{}"),
            (12, "2024-03-01 08:02:00", 1, "c", 1.0, "{}"),
            (13, "2024-03-01 08:03:00", 1, "c", 1.0, "{}"),
            (14, "2024-03-01 08:03:00", 1, "c", 1.0, "{}"),  # ts tie
            # user 2: 2 events, under the cap
            (20, "2024-03-01 09:00:00", 2, "c", 1.0, "{}"),
            (21, "2024-03-01 09:30:00", 2, "c", 1.0, "{}"),
            # user 1 next day: counter resets
            (30, "2024-03-02 08:00:00", 1, "c", 1.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.day: r for r in user_event_cap({"events": ev}).collect()}
    d1 = out["2024-03-01"]
    assert (d1.n_events, d1.n_kept, d1.n_dropped) == (7, 5, 2)
    assert d1.n_users == 2 and d1.capped_users == 1
    d2 = out["2024-03-02"]
    assert (d2.n_events, d2.n_kept, d2.n_dropped) == (1, 1, 0)


def test_embedding_prototype_filter_exact_boundary(spark):
    """Integer-lattice exactness at the keep boundary: vectors placed
    at known L2 offsets from their label centroid keep/drop exactly at
    tau, independent of partitioning."""
    from training_etl_demo_2_spark.operators.similarity import (
        embedding_prototype_filter,
    )

    S = 1 << 15
    # label 0: four 2-d-ish vectors (padded dim 4) symmetric about the
    # origin centroid, all at L2 distance exactly 0.5
    def vec(a, b):
        return [float(a), float(b), 0.0, 0.0]

    rows = [
        (1, vec(0.5, 0.0), 0),
        (2, vec(-0.5, 0.0), 0),
        (3, vec(0.0, 0.5), 0),
        (4, vec(0.0, -0.5), 0),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    for layout in (emb, emb.repartition(5), emb.coalesce(1)):
        out = {
            r.tau_q: r.n_kept
            for r in embedding_prototype_filter(
                layout,
                taus_q=(int(0.49 * S), int(0.5 * S), int(0.51 * S)),
            ).collect()
        }
        # distance == 0.5 exactly: kept at tau >= 0.5, dropped below
        assert out[int(0.49 * S)] == 0
        assert out[int(0.5 * S)] == 4
        assert out[int(0.51 * S)] == 4


def test_embedding_prototype_filter_curve_monotone(spark, tables):
    """On the fixture: kept counts are monotone in tau and the default
    grid straddles the knee (some tau keeps nothing everywhere, some
    keeps everything)."""
    from training_etl_demo_2_spark.operators.similarity import (
        embedding_prototype_filter,
    )

    out = embedding_prototype_filter(tables["embeddings"]).collect()
    by_tau = {}
    for r in out:
        by_tau.setdefault(r.tau_q, [0, 0])
        by_tau[r.tau_q][0] += r.n_vecs
        by_tau[r.tau_q][1] += r.n_kept
    taus = sorted(by_tau)
    kept = [by_tau[t][1] for t in taus]
    assert kept == sorted(kept)  # monotone in tau
    assert kept[0] < by_tau[taus[0]][0]  # selective arm exists
    assert kept[-1] > 0  # permissive arm exists


def test_quality_ensemble_gate_majority_rule(spark, tables):
    """The per-source ensemble counts must equal a row-level recompute
    of the majority rule from the three gate relations."""
    from training_etl_demo_2_spark.operators.curation import (
        quality_ensemble_gate,
    )
    from training_etl_demo_2_spark.operators.text import (
        BLOCKLIST,
        blocklist_hit_report,
        gopher_quality_rules,
        quality_classifier,
    )

    docs = tables["documents"]
    g1 = {r.doc_id: int(r.pass_all) for r in gopher_quality_rules(docs).collect()}
    g2 = {r.doc_id: int(r.keep) for r in quality_classifier(docs).collect()}
    bl = set(BLOCKLIST)
    g3 = {
        r.doc_id: int(
            not any(t in bl for t in r.text.lower().split(" "))
        )
        for r in docs.select("doc_id", "text").collect()
    }
    src = {r.doc_id: r.source for r in docs.select("doc_id", "source").collect()}
    expected = {}
    for d in g1:
        maj = int(g1[d] + g2[d] + g3[d] >= 2)
        e = expected.setdefault(src[d], [0, 0, 0, 0, 0])
        e[0] += 1
        e[1] += g1[d]
        e[2] += g2[d]
        e[3] += g3[d]
        e[4] += maj
    out = {r.source: r for r in quality_ensemble_gate(docs).collect()}
    assert set(out) == set(expected)
    for s, e in expected.items():
        r = out[s]
        assert (
            r.n_docs, r.pass_gopher, r.pass_classifier,
            r.pass_blocklist, r.keep_majority,
        ) == tuple(e)
        assert r.keep_bp == (e[4] * 10**4 * 2 + e[0]) // (2 * e[0])
    # the gates genuinely disagree somewhere (otherwise the ensemble
    # is vacuous on this fixture)
    assert any(
        (g1[d], g2[d], g3[d]) not in {(0, 0, 0), (1, 1, 1)} for d in g1
    )
    # sanity: blocklist gate complements the hit report
    rep = {r.source: r for r in blocklist_hit_report(docs).collect()}
    for s in expected:
        assert rep[s].n_docs - rep[s].docs_hit == expected[s][3]


def test_stream_blocklist_gate_equals_batch(spark, sf_dir, tables):
    from training_etl_demo_2_spark.operators.text import (
        blocklist_hit_report,
    )
    from training_etl_demo_2_spark.streaming import fixture_queries

    batch = blocklist_hit_report(tables["documents"]).agg(
        F.sum("n_docs").alias("n"),
        F.sum("docs_hit").alias("h"),
        F.sum("total_hits").alias("t"),
    ).collect()[0]
    out = fixture_queries.stream_blocklist_gate(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_docs, r.docs_hit, r.total_hits) == (
        batch["n"], batch["h"], batch["t"]
    )
    assert r.n_clean == r.n_docs - r.docs_hit


def test_quality_ensemble_gate_plan_is_single_scan(spark, tables):
    """Round-9 review fix, pinned: all three gates are per-row
    expressions, so the vote must be ONE projection of ONE corpus scan
    — no doc_id re-joins (the first cut had 4 scans + 3 joins)."""
    from training_etl_demo_2_spark.operators.curation import (
        quality_ensemble_gate,
    )

    p = (
        quality_ensemble_gate(tables["documents"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert p.count("Scan parquet") == 1, "ensemble re-scans the corpus"
    assert "Join" not in p, "ensemble re-joins per-row flags"


def test_orc_roundtrip_tmp_dirs_are_bounded(spark, tmp_path, monkeypatch):
    """Round-9 review fix, pinned: per-application ORC round-trip dirs
    must not accumulate — the helper registers an atexit removal for
    the live app's dir and sweeps sibling dirs older than the stale
    threshold."""
    import os
    import time

    from training_etl_demo_2_spark import io as io_mod

    root = tmp_path / "orc_rt"
    root.mkdir()
    stale = root / "app-dead"
    fresh = root / "app-live-other"
    stale.mkdir()
    fresh.mkdir()
    old = time.time() - io_mod.ORC_ROUNDTRIP_STALE_S - 60
    os.utime(stale, (old, old))
    monkeypatch.setattr(io_mod, "ORC_ROUNDTRIP_DIR", str(root))
    own = root / "app-own"
    io_mod._orc_roundtrip_register_cleanup(str(own))
    assert not stale.exists(), "stale sibling app dir not swept"
    assert fresh.exists(), "recent sibling dir must survive (may be live)"
    # the live app's subtree is registered for atexit removal, once
    assert str(own) in io_mod._ORC_CLEANUP_REGISTERED


# ---------------------------------------------------------------------------
# hypothesis differential: stupid backoff vs a brute-force reference
# ---------------------------------------------------------------------------


def _sb_reference(texts, alpha):
    """Brute-force stupid-backoff per-doc mean log score in plain
    Python: exact corpus n-gram counts, the 3-tier chain, ln of the
    same IEEE doubles."""
    from collections import Counter

    c1, c2, c3 = Counter(), Counter(), Counter()
    for t in texts.values():
        toks = [w for w in t.lower().split(" ")]
        c1.update(w for w in toks if w != "")
        c2.update(
            " ".join(toks[i : i + 2]) for i in range(len(toks) - 1)
        )
        c3.update(
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        )
    n_total = sum(c1.values())
    out = {}
    for doc_id, t in texts.items():
        toks = t.lower().split(" ")
        scores = []
        for i in range(len(toks) - 2):
            w1, w2, w3 = toks[i : i + 3]
            g3, g12, g23 = f"{w1} {w2} {w3}", f"{w1} {w2}", f"{w2} {w3}"
            if c3[g3] > 0:
                s = c3[g3] / c2[g12]
            elif c2[g23] > 0:
                s = alpha * c2[g23] / c1[w2]
            else:
                s = (alpha * alpha) * c1[w3] / n_total
            scores.append(math.log(s))
        if scores:
            out[doc_id] = (len(scores), round(sum(scores) / len(scores), 6))
    return out


def test_trigram_sb_hypothesis_differential(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from training_etl_demo_2_spark.operators.text import (
        SB_ALPHA,
        trigram_sb_logprob,
    )

    word = st.sampled_from(["a", "b", "c", "dd", "ee"])

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(
            st.lists(word, min_size=1, max_size=12).map(" ".join),
            min_size=1,
            max_size=10,
        )
    )
    def check(doc_texts):
        texts = {i: t for i, t in enumerate(doc_texts)}
        df = spark.createDataFrame(
            list(texts.items()), "doc_id long, text string"
        )
        got = {
            r.doc_id: (r.n_trigrams, r.avg_sb_logprob)
            for r in trigram_sb_logprob(df).collect()
        }
        want = _sb_reference(texts, SB_ALPHA)
        assert set(got) == set(want)
        for d in want:
            assert got[d][0] == want[d][0]
            assert abs(got[d][1] - want[d][1]) <= 1e-6, (
                d, got[d], want[d],
            )

    check()


def test_quantile_bottomk_merge_law_and_estimates(spark, tables):
    """The merge law must hold exactly (bottom-k is a monoid) and the
    estimates must be ordered and drawn from the value domain."""
    from training_etl_demo_2_spark.operators.sketches import (
        QSK_K,
        quantile_bottomk_merge,
    )

    out = sorted(
        quantile_bottomk_merge(tables).collect(), key=lambda r: r.q_bp
    )
    assert [r.q_bp for r in out] == [2500, 5000, 7500, 9000, 9900]
    assert all(r.mismatched_rows == 0 for r in out), (
        "daily sketches merged != direct global sketch"
    )
    n = tables["events"].count()
    assert all(r.sketch_rows == min(QSK_K, n) for r in out)
    ests = [r.est_c for r in out]
    exacts = [r.exact_c for r in out]
    assert ests == sorted(ests) and exacts == sorted(exacts)


def test_quantile_bottomk_exact_when_sample_covers_input(spark):
    """With n <= K the sketch IS the table, so every estimate must
    equal the exact quantile and the merge law is trivially exact —
    regardless of how the input is partitioned across days."""
    from training_etl_demo_2_spark.operators.sketches import (
        quantile_bottomk_merge,
    )

    rows = [
        (i, f"2024-03-{(i % 5) + 1:02d} 10:00:00", i % 7, "c",
         float(i), "{}")
        for i in range(40)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    for layout in (ev, ev.repartition(7)):
        out = quantile_bottomk_merge({"events": layout}).collect()
        assert all(r.mismatched_rows == 0 for r in out)
        assert all(r.sketch_rows == 40 for r in out)
        assert all(r.abs_err_c == 0 for r in out), (
            "n <= K must be exact"
        )


def test_quantile_bottomk_degenerate_duplicate_ranks(spark):
    """ADVICE round-9 regression: with n small enough that two q_bp
    values share the same exact rank (n=4 puts q=9000 and q=9900 both
    at rank 4), the exact-quantile lookup must fan out like the SQL
    twin's join — the old F.create_map literal threw under Spark's
    default mapKeyDedupPolicy=EXCEPTION while DuckDB returned 5 rows,
    an engine-divergent failure on degenerate inputs."""
    from training_etl_demo_2_spark.operators.sketches import (
        QSK_Q_BP,
        quantile_bottomk_merge,
    )

    rows = [
        (i, f"2024-03-{i + 1:02d} 10:00:00", i, "c", float(i), "{}")
        for i in range(4)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = sorted(
        quantile_bottomk_merge({"events": ev}).collect(),
        key=lambda r: r.q_bp,
    )
    assert [r.q_bp for r in out] == sorted(QSK_Q_BP)
    # n <= K: sketch covers the input, every estimate exact; the two
    # rank-4 quantiles both resolve to the max value (c = 300 cents).
    assert all(r.abs_err_c == 0 for r in out)
    assert out[-1].exact_c == out[-2].exact_c == 300
