"""Planted tests for Kendall tau-b daily concordance and the LSH
blocking-quality evaluator."""

from __future__ import annotations

from training_etl_demo_2_spark.operators import dedup, validation


def _orders(spark, rows):
    # rows: (day, n_orders, price_each)
    data = []
    k = 0
    for day, n, price in rows:
        for _ in range(n):
            data.append((k, 1, "O", float(price), day, "1-URGENT"))
            k += 1
    return {
        "orders": spark.createDataFrame(
            data,
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate string, "
            "o_orderpriority string",
        )
    }


def test_kendall_perfect_concordance(spark):
    # count and revenue both strictly increasing by day -> tau = 1
    rows = [("1995-01-01", 1, 10.0), ("1995-01-02", 2, 20.0),
            ("1995-01-03", 3, 30.0), ("1995-01-04", 4, 40.0)]
    out = validation.kendall_tau_daily(_orders(spark, rows)).collect()[0]
    assert out["n_pairs"] == 6
    assert out["concordant"] == 6 and out["discordant"] == 0
    assert out["tau_b_r6"] == 1.0


def test_kendall_perfect_discordance(spark):
    # more orders but each day's total revenue strictly falls
    rows = [("1995-01-01", 1, 100.0), ("1995-01-02", 2, 40.0),
            ("1995-01-03", 3, 20.0), ("1995-01-04", 4, 10.0)]
    out = validation.kendall_tau_daily(_orders(spark, rows)).collect()[0]
    assert out["discordant"] == 6 and out["concordant"] == 0
    assert out["tau_b_r6"] == -1.0


def test_kendall_tie_correction(spark):
    # two days share the order COUNT (x tie) with different revenue:
    # n0=3 pairs, tie_x=1, C=2, D=0 -> tau_b = 2/sqrt((3-1)*(3-0))
    rows = [("1995-01-01", 1, 10.0), ("1995-01-02", 1, 20.0),
            ("1995-01-03", 2, 30.0)]
    out = validation.kendall_tau_daily(_orders(spark, rows)).collect()[0]
    assert out["n_pairs"] == 3
    assert out["ties_count"] == 1 and out["ties_revenue"] == 0
    expected = 2.0 / ((3 - 1) * (3 - 0)) ** 0.5
    assert abs(out["tau_b_r6"] - expected) < 1e-6


def test_kendall_all_tied_null(spark):
    rows = [("1995-01-01", 2, 10.0), ("1995-01-02", 2, 10.0)]
    out = validation.kendall_tau_daily(_orders(spark, rows)).collect()[0]
    assert out["ties_both"] == 1
    assert out["tau_b_r6"] is None


def _docs(spark, rows):
    # rows: (doc_id, text)
    return {
        "documents": spark.createDataFrame(
            [(i, tx, "en", "s", len(tx)) for i, tx in rows],
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        )
    }


def test_blocking_identical_docs_complete(spark):
    # identical docs share every shingle -> identical signatures ->
    # candidate in every band; completeness must be 1
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(1, base), (2, base), (3, "完全 another unrelated text body "
            "with different words entirely for the third document here")]
    out = dedup.blocking_quality_eval(_docs(spark, rows)).collect()[0]
    assert out["n_docs"] == 3
    assert out["n_possible_pairs"] == 3
    assert out["n_true_pairs"] == 1
    assert out["n_found"] == 1
    assert out["completeness_r6"] == 1.0
    # the unrelated doc must not be a candidate of anything
    assert out["n_candidates"] == 1
    assert abs(out["reduction_ratio_r6"] - (1 - 1 / 3)) < 1e-6
    assert out["pair_quality_r6"] == 1.0


def test_blocking_no_dups_zero_candidates(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "one two three four five six seven eight nine ten eleven"),
        (3, "red orange yellow green blue indigo violet pink brown black"),
    ]
    out = dedup.blocking_quality_eval(_docs(spark, rows)).collect()[0]
    assert out["n_true_pairs"] == 0
    assert out["completeness_r6"] is None
    assert out["n_found"] == 0
    assert out["reduction_ratio_r6"] is not None


def test_blocking_counts_are_consistent(spark):
    # near-but-not-identical docs: whatever the banding does, the
    # bookkeeping identities must hold
    base = "w%d " * 30
    rows = [(i, (base % tuple(range(30))) + f"tail{i % 2}") for i in range(6)]
    out = dedup.blocking_quality_eval(_docs(spark, rows)).collect()[0]
    assert out["n_possible_pairs"] == 15
    assert 0 <= out["n_found"] <= out["n_true_pairs"]
    assert out["n_found"] <= out["n_candidates"]


# ---------------------------------------------------------------------------
# near_dup_assortativity
# ---------------------------------------------------------------------------


def test_assortativity_clique_degrees_equal_null(spark):
    # 5 identical docs form a CLIQUE (all pairs): degrees all equal
    # -> zero degree variance -> NULL by definition
    base = ("the common boilerplate body that every mirror page carries "
            "verbatim with plenty of shared tokens in the shingle window")
    rows = [(0, base)] + [(i, base) for i in range(1, 5)]
    out = dedup.near_dup_assortativity(_docs(spark, rows)).collect()[0]
    assert out["n_edges"] == 10
    assert out["assortativity_r6"] is None


def test_assortativity_two_cliques_null_and_pairs(spark):
    # two disjoint duplicate PAIRS: every node degree 1 -> zero degree
    # variance -> NULL assortativity, mean edge degree exactly 1
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    b = "one two three four five six seven eight nine ten eleven twelve"
    rows = [(1, a), (2, a), (3, b), (4, b)]
    out = dedup.near_dup_assortativity(_docs(spark, rows)).collect()[0]
    assert out["n_edges"] == 2 and out["n_nodes"] == 4
    assert out["mean_edge_degree_r6"] == 1.0
    assert out["assortativity_r6"] is None


def test_assortativity_mixed_degrees_in_range(spark):
    # a triangle (3 identical docs) + a pair: degrees {2,2,2,1,1}
    tri = "red orange yellow green blue indigo violet pink brown black white"
    pr = "sun moon star cloud rain snow wind storm fog mist dew frost"
    rows = [(1, tri), (2, tri), (3, tri), (4, pr), (5, pr)]
    out = dedup.near_dup_assortativity(_docs(spark, rows)).collect()[0]
    assert out["n_edges"] == 4
    # both components are degree-homogeneous -> perfectly assortative
    assert out["assortativity_r6"] == 1.0


# ---------------------------------------------------------------------------
# lsh_cost_advisor
# ---------------------------------------------------------------------------


def test_lsh_cost_advisor_predicts_clique_pairs(spark):
    # 3 identical + 2 identical + 1 unique doc: every band's buckets
    # are {3, 2, 1} -> candidate pairs 3 + 1 + 0 = 4 in EVERY band
    tri = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"
    two = "one two three four five six seven eight nine ten eleven twelve"
    solo = "red orange yellow green blue indigo violet pink brown white grey"
    rows = [(1, tri), (2, tri), (3, tri), (4, two), (5, two), (6, solo)]
    out = dedup.lsh_cost_advisor(_docs(spark, rows)).collect()
    assert len(out) == dedup.BANDS
    for r in out:
        assert r["n_docs"] == 6
        assert r["max_bucket"] == 3
        assert r["candidate_pairs"] == 4


def test_lsh_cost_advisor_bounds_actual_join(spark):
    # the per-band prediction upper-bounds the DISTINCT candidate set
    # blocking_quality_eval later materializes
    base = "w%d " * 25
    rows = [(i, (base % tuple(range(25))) + f"t{i % 3}") for i in range(9)]
    adv = dedup.lsh_cost_advisor(_docs(spark, rows)).collect()
    total_rows = sum(r["candidate_pairs"] for r in adv)
    eva = dedup.blocking_quality_eval(_docs(spark, rows)).collect()[0]
    assert eva["n_candidates"] <= total_rows


# ---------------------------------------------------------------------------
# bottomk_containment_pairs
# ---------------------------------------------------------------------------


def test_bottomk_finds_full_containment(spark):
    # A is a verbatim excerpt of B -> every A-shingle is in B: the
    # estimate is exactly 1 (all bottom-k hashes match) and the exact
    # re-score is 1; the reverse direction (B in A) must NOT appear
    words = [f"w{i}" for i in range(60)]
    big = " ".join(words)
    small = " ".join(words[10:22])  # 12-word excerpt
    rows = [(1, small), (2, big)]
    out = dedup.bottomk_containment_pairs(_docs(spark, rows)).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in out] == [(1, 2)]
    assert out[0]["cont_est_r6"] == 1.0
    assert out[0]["cont_exact_r6"] == 1.0


def test_bottomk_recalls_every_full_containment_of_exact_tier(spark):
    # law: any pair the EXACT tier scores cont_a = 1.0 has estimate 1
    # (>= the candidate cut by construction) and must be recalled
    words = [f"t{i}" for i in range(80)]
    rows = [
        (1, " ".join(words)),
        (2, " ".join(words[5:25])),
        (3, " ".join(words[40:58])),
        (4, "unrelated body of text with its own distinct words entirely"),
    ]
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.bottomk_containment_pairs(_docs(spark, rows)).collect()
        if r["cont_exact_r6"] == 1.0
    }
    assert (2, 1) in got and (3, 1) in got
    assert not any(a == 4 or b == 4 for a, b in got)


def test_bottomk_no_candidates_on_disjoint_docs(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "one two three four five six seven eight nine ten eleven"),
    ]
    out = dedup.bottomk_containment_pairs(_docs(spark, rows)).collect()
    assert out == []
