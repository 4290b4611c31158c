"""Scale smoke: run the heaviest operator families at N× the largest
fixture to catch scaling cliffs (candidate blow-ups, state growth,
driver collects) that sf0.1 cannot reveal.

The fixture documents are replicated ``N`` times with doc_ids offset
per replica — near-dup structure EXPLODES by construction (every doc
gains N-1 exact copies), which is precisely the stress: candidate
generation, verification, and clustering must scale with true
duplicates, and the cluster count must come back exactly
|distinct docs|.

Usage: python tools/scale_smoke.py [N] [sf_dir]   (default 10× sf0.1)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    from pyspark.sql import functions as F

    from training_etl_demo_2_spark.io import load_tables
    from training_etl_demo_2_spark.operators import dedup, text, validation
    from training_etl_demo_2_spark.session import get_spark

    n_rep = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    spark = get_spark(app_name="scale-smoke")
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    n_docs = docs.count()

    reps = spark.range(n_rep).select(F.col("id").alias("rep"))
    big = (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * F.lit(10_000_000)).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        )
    )
    print(f"scaled corpus: {n_docs} docs x {n_rep} = {n_docs * n_rep}")

    def tm(label, fn):
        t0 = time.perf_counter()
        out = fn()
        print(f"  {label}: {time.perf_counter() - t0:.1f}s -> {out}", flush=True)
        return out

    tm("token_stats (narrow scan)", lambda: big.transform(text.token_stats).count())
    n_groups = tm(
        "exact_dedup_groups", lambda: dedup.exact_dedup_groups(big).count()
    )
    # every distinct text appears >= n_rep times; group count must equal
    # the ORIGINAL distinct count (replication adds no new content)
    base_groups = dedup.exact_dedup_groups(docs).count()
    assert n_groups == base_groups, (n_groups, base_groups)

    n_clusters = tm(
        "near_dup_clusters (LSH + CC)",
        lambda: dedup.near_dup_clusters(big, threshold=0.8).count(),
    )
    # the pair graph covers at least all exact-duplicate replicas
    assert n_clusters >= n_docs, (n_clusters, n_docs)

    tm(
        "profile_columns approx (HLL tier)",
        lambda: validation.profile_columns(big, approx=True).count(),
    )

    # Round-5 families. line_dedup: replication makes EVERY segment
    # appear in >= n_rep docs, so the whole corpus is boilerplate and
    # every doc must come back fully stripped (n_kept == 0) — the
    # stress is the segment-count aggregate + reassembly shuffle at
    # n_rep x volume, with a degenerate 100%-duplicate distribution.
    out = tm(
        "line_dedup (all-boilerplate corpus)",
        lambda: dedup.line_dedup(big)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("n_kept")).alias("kept"),
        )
        .collect()[0],
    )
    assert out.n == n_docs * n_rep and out.kept == 0, out

    # unigram_logprob: scores are replication-INVARIANT (every token
    # count and the total scale by n_rep, so cnt/N is unchanged) —
    # replica docs must score identically to their originals.
    base = {
        r.doc_id: r.avg_logprob
        for r in text.unigram_logprob(docs).collect()
    }
    big_scores = text.unigram_logprob(big).collect()
    tm(
        "unigram_logprob (replication-invariant)",
        lambda: len(big_scores),
    )
    for r in big_scores:
        orig = base[r.doc_id % 10_000_000]
        assert abs(r.avg_logprob - orig) <= 1e-6, (r.doc_id, r.avg_logprob, orig)

    # Round-6 families. substring_dup_stats: replication makes every
    # gram shared across n_rep docs, so EVERY doc with >= k tokens must
    # come back 100% duplicated (dup_gram_bp == 10000) — stressing the
    # sliding-gram explode (k rows/token) and the gram-hash count at
    # n_rep x volume with a degenerate all-duplicate distribution.
    ss = tm(
        "substring_dup_stats (all-duplicate grams)",
        lambda: dedup.substring_dup_stats(big)
        .filter(F.col("n_grams") > 0)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("dup_gram_bp").alias("min_bp"),
        )
        .collect()[0],
    )
    assert ss.min_bp == 10000, ss

    # corpus_report: counts scale exactly by n_rep; distinct content,
    # vocabulary and composition ratios are replication-invariant.
    from training_etl_demo_2_spark.operators import pipeline

    rep_small = {
        r.metric: r.value
        for r in pipeline.corpus_report({"documents": docs}).collect()
    }
    rep_big = tm(
        "corpus_report (metric scaling laws)",
        lambda: {
            r.metric: r.value
            for r in pipeline.corpus_report({"documents": big}).collect()
        },
    )
    assert rep_big["n_docs"] == rep_small["n_docs"] * n_rep
    assert rep_big["n_tokens"] == rep_small["n_tokens"] * n_rep
    assert rep_big["distinct_content"] == rep_small["distinct_content"]
    assert rep_big["n_types"] == rep_small["n_types"]
    assert abs(rep_big["pct_en"] - rep_small["pct_en"]) <= 1e-6

    # Embedding ops under replication: replicate vectors n_rep times
    # with offset ids. k-means is replication-INVARIANT in its centroids
    # (means are unchanged), so cluster sizes scale exactly by n_rep and
    # per-cluster inertia by n_rep (each copy contributes the same d2).
    from training_etl_demo_2_spark.operators import similarity

    emb = t["embeddings"]
    n_emb = emb.count()
    big_emb = (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * F.lit(10_000_000)).alias(
                "vec_id"
            ),
            "embedding",
            "label",
        )
    )
    # replica ids >= 10M keep the ORIGINAL k vectors as initial
    # centroids (init = smallest vec_ids), so the recurrences match
    small_k = {
        r.cluster_id: r
        for r in similarity.distributed_kmeans(emb).collect()
    }
    big_k = tm(
        f"distributed_kmeans ({n_emb} x {n_rep} vectors)",
        lambda: {
            r.cluster_id: r
            for r in similarity.distributed_kmeans(big_emb).collect()
        },
    )
    assert set(big_k) == set(small_k)
    for cid, r in big_k.items():
        assert r.n_members == small_k[cid].n_members * n_rep, cid
        assert (
            abs(r.inertia - small_k[cid].inertia * n_rep)
            <= 1e-3 * max(1.0, abs(r.inertia))
        ), cid

    cent = tm(
        "label_centroid_stats (replication-invariant)",
        lambda: {
            r.label: r
            for r in similarity.label_centroid_stats(big_emb).collect()
        },
    )
    small_c = {
        r.label: r for r in similarity.label_centroid_stats(emb).collect()
    }
    for lbl, r in cent.items():
        assert r.n_vectors == small_c[lbl].n_vectors * n_rep
        assert abs(r.centroid_norm - small_c[lbl].centroid_norm) <= 1e-5
        assert (
            abs(r.mean_cos_to_centroid - small_c[lbl].mean_cos_to_centroid)
            <= 1e-5
        )

    # gram matrix: integer sums make replication EXACTLY multiplicative
    # — big gram cell == n_rep * small gram cell, bit-for-bit, any N.
    small_g = {
        (r.i, r.j): r.gram_q
        for r in similarity.embedding_gram_matrix(emb).collect()
    }
    big_g = tm(
        f"embedding_gram_matrix ({n_emb} x {n_rep} vectors)",
        lambda: {
            (r.i, r.j): r.gram_q
            for r in similarity.embedding_gram_matrix(big_emb).collect()
        },
    )
    assert set(big_g) == set(small_g)
    for k, v in big_g.items():
        assert v == small_g[k] * n_rep, (k, v, small_g[k])

    # OLS trend: replicating every event by a POWER OF TWO scales all
    # five integer sums exactly, and 2^k scaling passes through IEEE
    # multiply/subtract/divide losslessly — slope/intercept must be
    # BIT-EQUAL, not merely close.
    from training_etl_demo_2_spark.operators import relational_ext

    ev = t["events"]
    rep8 = spark.range(8).select(F.col("id").alias("rep"))
    big_ev = ev.crossJoin(rep8).select(
        (F.col("event_id") + F.col("rep") * F.lit(100_000_000)).alias(
            "event_id"
        ),
        "ts",
        "user_id",
        "event_type",
        "value",
        "props",
    )
    small_ols = {
        r.event_type: r
        for r in relational_ext.events_value_trend_ols({"events": ev}).collect()
    }
    big_ols = tm(
        "events_value_trend_ols (8x events, bit-exact invariance)",
        lambda: {
            r.event_type: r
            for r in relational_ext.events_value_trend_ols(
                {"events": big_ev}
            ).collect()
        },
    )
    assert set(big_ols) == set(small_ols)
    for ty, r in big_ols.items():
        s = small_ols[ty]
        assert r.n == s.n * 8
        assert r.slope_t4_per_hour == s.slope_t4_per_hour, ty
        assert r.intercept_t4 == s.intercept_t4, ty

    # robust median/MAD: duplicating the multiset preserves discrete
    # rank picks, so each flagged row is flagged in every replica —
    # count scales exactly, the (type, value) flag pattern is unchanged.
    small_rob = validation.robust_value_anomalies(ev)
    small_rob_n = small_rob.count()
    small_pat = {
        (r.event_type, r.value_t4, r.med_t4)
        for r in small_rob.collect()
    }
    big_rob = tm(
        "robust_value_anomalies (8x events)",
        lambda: validation.robust_value_anomalies(big_ev),
    )
    assert big_rob.count() == small_rob_n * 8
    big_pat = {
        (r.event_type, r.value_t4, r.med_t4) for r in big_rob.collect()
    }
    assert big_pat == small_pat

    # Round-4 session-2 families.
    # source_mixture_weights: shares are replication-INVARIANT (every
    # source's token count scales by n_rep), so w_nano/w_bp must come
    # back identical; n_tokens scales exactly.
    from training_etl_demo_2_spark.operators import curation

    small_mix = {
        r.source: r for r in curation.source_mixture_weights(docs).collect()
    }
    big_mix = tm(
        "source_mixture_weights (share-invariant)",
        lambda: {
            r.source: r
            for r in curation.source_mixture_weights(big).collect()
        },
    )
    assert set(big_mix) == set(small_mix)
    for srcname, r in big_mix.items():
        s = small_mix[srcname]
        assert r.n_tokens == s.n_tokens * n_rep
        assert r.w_nano == s.w_nano and r.w_bp == s.w_bp, srcname

    # vocab_coverage_curve: uniform count scaling preserves the full
    # (cnt desc, term) ranking, so n_terms and coverage_bp are
    # invariant while covered_tokens scales exactly.
    small_curve = {
        r.k: r for r in text.vocab_coverage_curve(docs).collect()
    }
    big_curve = tm(
        "vocab_coverage_curve (rank-invariant)",
        lambda: {r.k: r for r in text.vocab_coverage_curve(big).collect()},
    )
    for k, r in big_curve.items():
        s = small_curve[k]
        assert r.n_terms == s.n_terms and r.coverage_bp == s.coverage_bp, k
        assert r.covered_tokens == s.covered_tokens * n_rep, k

    # oov_rate: the top-k vocabulary SET is replication-invariant, so
    # every replica must score exactly like its original.
    small_oov = {
        r.doc_id: (r.n_tokens, r.n_oov, r.oov_bp)
        for r in text.oov_rate(docs).collect()
    }
    big_oov = tm("oov_rate (vocab-invariant)", lambda: text.oov_rate(big).collect())
    assert len(big_oov) == n_docs * n_rep
    for r in big_oov:
        assert (r.n_tokens, r.n_oov, r.oov_bp) == small_oov[
            r.doc_id % 10_000_000
        ], r.doc_id

    # intra_doc_repetition: a pure per-doc transform — replicas must
    # match their originals field-for-field.
    small_idr = {
        r.doc_id: (r.n_segs, r.n_distinct, r.max_mult, r.dup_seg_bp)
        for r in dedup.intra_doc_repetition(docs).collect()
    }
    big_idr = tm(
        "intra_doc_repetition (per-doc invariant)",
        lambda: dedup.intra_doc_repetition(big).collect(),
    )
    for r in big_idr:
        assert (
            r.n_segs, r.n_distinct, r.max_mult, r.dup_seg_bp
        ) == small_idr[r.doc_id % 10_000_000], r.doc_id

    # near_dup_degree_hist: every doc gains >= n_rep - 1 exact-copy
    # neighbours, so no node may have degree < n_rep - 1 and all
    # n_docs * n_rep docs are in the graph.
    hist = tm(
        "near_dup_degree_hist (replica degree floor)",
        lambda: {
            r.degree: r.n_docs
            for r in dedup.near_dup_degree_hist(big, threshold=0.8).collect()
        },
    )
    assert sum(hist.values()) == n_docs * n_rep
    assert all(d >= n_rep - 1 for d in hist), sorted(hist)[:3]

    # lineitem_correlations: every sufficient statistic scales by the
    # replication factor, so r is unchanged up to output rounding.
    li = t["lineitem"]
    reps8 = spark.range(8).select(F.col("id").alias("rep"))
    big_li = li.crossJoin(reps8).drop("rep")
    small_corr = {
        (r.col_a, r.col_b): r.r
        for r in validation.lineitem_correlations({"lineitem": li}).collect()
    }
    big_corr = tm(
        "lineitem_correlations (8x lineitem)",
        lambda: {
            (r.col_a, r.col_b): r.r
            for r in validation.lineitem_correlations(
                {"lineitem": big_li}
            ).collect()
        },
    )
    for pair, r in big_corr.items():
        assert abs(r - small_corr[pair]) <= 1e-6, pair


    # Round-4 final families.
    # lang_source_chi2: every observed and expected cell scales by
    # n_rep, so the statistic scales EXACTLY by n_rep (dof unchanged) —
    # the contingency math must not buckle under volume.
    from training_etl_demo_2_spark.operators import behavior, text as text_ops

    small_chi = validation.lang_source_chi2({"documents": docs}).collect()[0]
    big_chi = tm(
        "lang_source_chi2 (xN scaling law)",
        lambda: validation.lang_source_chi2({"documents": big}).collect()[0],
    )
    assert big_chi.dof == small_chi.dof and big_chi.n_cells == small_chi.n_cells
    assert abs(big_chi.chi2 - n_rep * small_chi.chi2) <= 1e-3, (
        big_chi.chi2, small_chi.chi2
    )

    # langid_kappa: pure ratios of scaled counts — invariant.
    small_kap = text_ops.langid_kappa(docs).collect()[0]
    big_kap = tm(
        "langid_kappa (replication-invariant)",
        lambda: text_ops.langid_kappa(big).collect()[0],
    )
    assert big_kap.n == small_kap.n * n_rep
    for f in ("p_o", "p_e", "kappa"):
        assert abs(getattr(big_kap, f) - getattr(small_kap, f)) <= 1e-6, f

    # quality_threshold_curve: identical scores -> identical bins ->
    # survivors scale EXACTLY per threshold.
    small_qc = {
        r.thr_bin: r.n_survivors
        for r in text_ops.quality_threshold_curve(docs).collect()
    }
    big_qc = tm(
        "quality_threshold_curve (exact xN survivors)",
        lambda: {
            r.thr_bin: r.n_survivors
            for r in text_ops.quality_threshold_curve(big).collect()
        },
    )
    assert set(big_qc) == set(small_qc)
    for thr, n in big_qc.items():
        assert n == small_qc[thr] * n_rep, thr

    # Events-based families: replicate events with DISJOINT users (and
    # event ids) — per-user history is identical per replica.
    ev = t["events"]
    big_ev = ev.crossJoin(reps).select(
        (F.col("event_id") + F.col("rep") * F.lit(100_000_000)).alias(
            "event_id"
        ),
        "ts",
        (F.col("user_id") + F.col("rep") * F.lit(100_000_000)).alias(
            "user_id"
        ),
        "event_type",
        "value",
        "props",
    )

    # kaplan_meier_churn: every duration's (n_risk, n_events) scales by
    # n_rep and the survival curve is IDENTICAL (the KM product is a
    # ratio recurrence).
    small_km = {
        r.duration_days: r
        for r in behavior.kaplan_meier_churn(ev, churn_days=1).collect()
    }
    big_km = tm(
        "kaplan_meier_churn (invariant curve, xN risk sets)",
        lambda: {
            r.duration_days: r
            for r in behavior.kaplan_meier_churn(big_ev, churn_days=1).collect()
        },
    )
    assert set(big_km) == set(small_km)
    for d, r in big_km.items():
        s = small_km[d]
        assert r.n_risk == s.n_risk * n_rep and r.n_events == s.n_events * n_rep
        assert abs(r.surv - s.surv) <= 1e-6, d

    # decayed_engagement: each replica user reproduces its original's
    # score exactly (same events, same edge, same integer nano terms).
    small_de = {
        r.user_id: r for r in behavior.decayed_engagement(ev).collect()
    }
    big_de = tm(
        "decayed_engagement (per-replica exact equality)",
        lambda: behavior.decayed_engagement(big_ev).collect(),
    )
    assert len(big_de) == len(small_de) * n_rep
    for r in big_de:
        s = small_de[r.user_id % 100_000_000]
        assert r.n_events == s.n_events and r.score == s.score, r.user_id

    # Round-5 family. knn_label_agreement: the query sample is capped
    # at KNN_MAX_QUERIES LOWEST matching vec_ids (bounded collect), and
    # under n_rep >= k replication every query's top-k is dominated by
    # the sim=1.0 copies of ITSELF (replicas are not self, only the
    # identical id is excluded), so the vote must return the query's
    # own label for EVERY query: n_agree == n_queries per label.
    agree = tm(
        "knn_label_agreement (self-copy dominance + bounded sample)",
        lambda: similarity.knn_label_agreement(big_emb, k=10).collect(),
    )
    assert agree, "no labels returned"
    for r in agree:
        assert r.n_agree == r.n_queries and r.agree_pct == 1.0, r
    n_queries_total = sum(r.n_queries for r in agree)
    expected = min(
        similarity.KNN_MAX_QUERIES,
        big_emb.filter((F.col("vec_id") % 10) == 0).count(),
    )
    assert n_queries_total == expected, (n_queries_total, expected)

    # Round-5 final families.
    # winnowing: per-doc selection is deterministic, so every replica
    # fingerprints identically and EVERY fingerprint lands in >= n_rep
    # docs -> n_shared_fp == n_fp for every doc with any fingerprint.
    win = tm(
        "winnowing_fingerprints (all-shared under replication)",
        lambda: dedup.winnowing_fingerprints(big).collect(),
    )
    assert len(win) == n_docs * n_rep
    for r in win:
        assert r.n_shared_fp == r.n_fp, (r.doc_id, r.n_fp, r.n_shared_fp)

    # cdc chunks: chunk boundaries are content-defined per doc, so
    # replication turns EVERY chunk into a repeated one: each output
    # group's count is a multiple of... >= n_rep copies of its small
    # count, and the total chunk mass is divisible by nothing weaker
    # than min(n_chunks) >= n_rep.
    cdc = tm(
        "cdc_dup_chunks (every chunk repeated)",
        lambda: dedup.cdc_dup_chunks(big).agg(
            F.min("n_chunks").alias("mn"),
            F.sum("n_chunks").alias("total"),
        ).collect()[0],
    )
    assert cdc.mn >= n_rep, cdc
    assert cdc.total % n_rep == 0, cdc

    # KS / Mann-Whitney: count-scaling leaves every CDF and every
    # midrank RATIO unchanged -> D and AUC are replication-invariant.
    small_ks = {
        r.source: r.ks_d_r6
        for r in validation.ks_drift_by_source({"documents": docs}).collect()
    }
    big_ks = tm(
        "ks_drift_by_source (CDF-invariant)",
        lambda: {
            r.source: r.ks_d_r6
            for r in validation.ks_drift_by_source(
                {"documents": big}
            ).collect()
        },
    )
    assert big_ks == small_ks
    small_mw = {
        r.source: r.auc_r6
        for r in validation.mannwhitney_auc({"documents": docs}).collect()
    }
    big_mw = tm(
        "mannwhitney_auc (AUC-invariant)",
        lambda: {
            r.source: r.auc_r6
            for r in validation.mannwhitney_auc({"documents": big}).collect()
        },
    )
    assert big_mw == small_mw

    # HLL registers see the same user-id SET no matter how many event
    # rows repeat it -> replicate with the SAME users (unlike big_ev's
    # disjoint-user replication above) -> s_int and the estimate are
    # bit-identical.
    from training_etl_demo_2_spark.operators import sketches

    big_ev_dup = ev.crossJoin(rep8).select(
        (F.col("event_id") + F.col("rep") * F.lit(100_000_000)).alias(
            "event_id"
        ),
        "ts",
        "user_id",
        "event_type",
        "value",
        "props",
    )
    small_hll = {
        r.event_type: (r.s_int, r.est_r6)
        for r in sketches.hll_user_estimate({"events": ev}).collect()
    }
    big_hll = tm(
        "hll_user_estimate (dup-insensitive at 8x rows, same users)",
        lambda: {
            r.event_type: (r.s_int, r.est_r6)
            for r in sketches.hll_user_estimate(
                {"events": big_ev_dup}
            ).collect()
        },
    )
    assert big_hll == small_hll

    # A/B assignment is per-user and the metric a per-user max -> the
    # whole report is invariant under same-user row replication.
    small_ab = sorted(
        map(tuple, behavior.ab_test_zscore({"events": ev}).collect())
    )
    big_ab = tm(
        "ab_test_zscore (per-user invariant)",
        lambda: sorted(
            map(
                tuple,
                behavior.ab_test_zscore({"events": big_ev_dup}).collect(),
            )
        ),
    )
    assert big_ab == small_ab

    # ------------------------------------------------------------------
    # round-5 second batch laws
    # ------------------------------------------------------------------
    from training_etl_demo_2_spark.operators import curation, temporal

    # A/B power analysis is per-user: same-user row replication leaves
    # the WHOLE design readout bit-identical.
    small_pow = tuple(behavior.ab_power_mde({"events": ev}).collect()[0])
    big_pow = tm(
        "ab_power_mde (per-user invariant)",
        lambda: tuple(
            behavior.ab_power_mde({"events": big_ev_dup}).collect()[0]
        ),
    )
    assert big_pow == small_pow

    # Kendall tau-b: replicating every order m times scales each day's
    # (count, revenue) by m -> every pairwise comparison keeps its
    # sign/tie class -> the full report is bit-identical.
    ords = t["orders"]
    big_ord = ords.crossJoin(rep8).select(
        (F.col("o_orderkey") + F.col("rep") * F.lit(100_000_000)).alias(
            "o_orderkey"
        ),
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )
    small_kt = tuple(
        validation.kendall_tau_daily({"orders": ords}).collect()[0]
    )
    big_kt = tm(
        "kendall_tau_daily (scale-invariant concordance)",
        lambda: tuple(
            validation.kendall_tau_daily({"orders": big_ord}).collect()[0]
        ),
    )
    assert big_kt == small_kt

    # CART stump: per-value counts scale by m -> every candidate's
    # impurity ratio is the same rational -> same threshold; the
    # decrease double may shift an ulp through the m^2-scaled terms.
    small_st = curation.gini_split_stump({"documents": docs}).collect()[0]
    big_st = tm(
        "gini_split_stump (threshold invariant under replication)",
        lambda: curation.gini_split_stump({"documents": big}).collect()[0],
    )
    assert big_st["best_threshold"] == small_st["best_threshold"]
    assert abs(big_st["gini_decrease_r6"] - small_st["gini_decrease_r6"]) < 1e-5
    assert big_st["stump_accuracy_bp"] == small_st["stump_accuracy_bp"]
    assert big_st["n_docs"] == small_st["n_docs"] * n_rep

    # IRLS logistic: every integer moment scales exactly by m, so each
    # Newton update divides m.g by m.H -> beta agrees to float noise;
    # per-row hits are identical so accuracy_bp is exact.
    small_lr = validation.logistic_irls_lang({"documents": docs}).collect()[0]
    big_lr = tm(
        "logistic_irls_lang (replication-invariant fit)",
        lambda: validation.logistic_irls_lang(
            {"documents": big}
        ).collect()[0],
    )
    assert abs(big_lr["beta0_r6"] - small_lr["beta0_r6"]) < 1e-4
    assert abs(big_lr["beta1_r6"] - small_lr["beta1_r6"]) < 1e-4
    assert big_lr["accuracy_bp"] == small_lr["accuracy_bp"]

    # Script audit: integer bp shares are ratios of m-scaled integers
    # (identical rationals -> identical floor-div); mismatches scale
    # exactly by m.
    small_sc = {
        r.lang: tuple(r)
        for r in text.script_mismatch_audit({"documents": docs}).collect()
    }
    big_sc = tm(
        "script_mismatch_audit (exact bp under replication)",
        lambda: {
            r.lang: tuple(r)
            for r in text.script_mismatch_audit(
                {"documents": big}
            ).collect()
        },
    )
    for lang, row in small_sc.items():
        brow = big_sc[lang]
        # (lang, n_docs, n_mismatched, n_chars, *bp): counts scale,
        # shares identical
        assert brow[1] == row[1] * n_rep and brow[2] == row[2] * n_rep
        assert brow[3] == row[3] * n_rep
        assert brow[4:] == row[4:]

    # CCF: same-(ts,type) replication scales every centered value by
    # m, numerator and denominators by m^2 -> each r is the same ratio
    # up to float noise; overlap bookkeeping is exact.
    small_ccf = {
        (r.type_a, r.type_b, r.lag): (r.n_pairs, r.ccf_r6)
        for r in temporal.ccf_event_types({"events": ev}).collect()
    }
    big_ccf = tm(
        "ccf_event_types (ratio-invariant under replication)",
        lambda: {
            (r.type_a, r.type_b, r.lag): (r.n_pairs, r.ccf_r6)
            for r in temporal.ccf_event_types(
                {"events": big_ev_dup}
            ).collect()
        },
    )
    assert set(big_ccf) == set(small_ccf)
    for key, (np_s, r_s) in small_ccf.items():
        np_b, r_b = big_ccf[key]
        assert np_b == np_s
        if r_s is None:
            assert r_b is None
        else:
            assert abs(r_b - r_s) < 1e-5

    # Dose-response under same-user row replication: click counts
    # scale by n (rows, not distinct), so users shift to HIGHER
    # exposure buckets — but the user/converter totals are conserved
    # and the zero-click bucket is fixed (0·n = 0).
    small_dr = behavior.conversion_dose_response({"events": ev}).collect()
    big_dr = tm(
        "conversion_dose_response (mass conserved under replication)",
        lambda: behavior.conversion_dose_response(
            {"events": big_ev_dup}
        ).collect(),
    )
    assert sum(r.n_users for r in big_dr) == sum(r.n_users for r in small_dr)
    assert sum(r.n_converted for r in big_dr) == sum(
        r.n_converted for r in small_dr
    )
    z_small = {r.min_clicks: r for r in small_dr}.get(0)
    z_big = {r.min_clicks: r for r in big_dr}.get(0)
    assert (z_small is None) == (z_big is None)
    if z_small is not None:
        assert (z_big.n_users, z_big.n_converted) == (
            z_small.n_users,
            z_small.n_converted,
        )

    # LSH cost advisor under n-fold doc replication: identical docs
    # share every bucket, so each bucket count scales exactly by n ->
    # max_bucket scales by n and the predicted candidate volume is
    # exactly sum over buckets of (n*c)(n*c-1)/2 >= n^2 * old pairs.
    small_adv = {
        r.band: (r.max_bucket, r.candidate_pairs)
        for r in dedup.lsh_cost_advisor({"documents": docs}).collect()
    }
    big_adv = tm(
        "lsh_cost_advisor (exact occupancy scaling)",
        lambda: {
            r.band: (r.max_bucket, r.candidate_pairs)
            for r in dedup.lsh_cost_advisor({"documents": big}).collect()
        },
    )
    for band, (mx, cp) in small_adv.items():
        bmx, bcp = big_adv[band]
        assert bmx == mx * n_rep
        assert bcp >= cp * n_rep * n_rep

    print("scale smoke OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
