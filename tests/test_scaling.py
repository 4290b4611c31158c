"""CI growth-law gate: the heavy families' wall time at 1× vs 10× a
content-disjoint replicated corpus must stay under the R^1.5 bound that
separates linear candidate generation from an accidental all-pairs tier
(see tools/scale_bench.py for the replication design and why disjoint
replicas make linear time the correct expectation).

This is the in-repo mirror of the committed SCALING.md measurement
(sf0.1 base): same harness, sf0.01 base so the suite stays tractable.
The candidate-volume anchor is deterministic (exact integer counts from
lsh_cost_advisor), so it is asserted tightly; wall ratios get the
generous family bound because CI hosts are time-shared.
"""

from __future__ import annotations

import pytest

from tools.scale_bench import FAMILIES, build_replicated_dir, measure

N_REP = 10
BASE = "/root/testdata/sf0.01"


@pytest.mark.slow
def test_growth_laws_linear_families(spark, tmp_path):
    result = measure(spark, BASE, N_REP, str(tmp_path))

    # deterministic: banding candidate volume grows ~R, never ~R²
    growth = result["candidate_growth"]
    assert growth <= 1.2 * N_REP, (
        f"candidate volume grew {growth}× under {N_REP}× disjoint "
        f"replication — banding is no longer linear"
    )
    # and it actually grew (the 10× corpus is not being silently truncated)
    assert growth >= 0.8 * N_REP, growth

    bad = {
        name: row
        for name, row in result["families"].items()
        if not row["ok"]
    }
    assert not bad, f"families over the R^1.5 wall-ratio bound: {bad}"
    # every declared family was measured
    assert set(result["families"]) == set(FAMILIES)


def test_replicated_dir_is_content_disjoint(spark, tmp_path):
    """The builder's word tags keep replicas shingle-disjoint: distinct
    word count grows exactly R× and exact-dedup finds no cross-replica
    groups (every text is unique)."""
    from pyspark.sql import functions as F

    out = build_replicated_dir(spark, BASE, 3, str(tmp_path / "x3"))
    docs = spark.read.parquet(f"{out}/documents.parquet")
    base = spark.read.parquet(f"{BASE}/documents.parquet")
    assert docs.count() == 3 * base.count()

    def vocab(df):
        return (
            df.select(F.explode(F.split("text", " ")).alias("w"))
            .filter(F.col("w") != "")
            .distinct()
            .count()
        )

    assert vocab(docs) == 3 * vocab(base)
    assert docs.select("text").distinct().count() == docs.count()
    # ids stay unique across replicas
    assert docs.select("doc_id").distinct().count() == docs.count()


def test_sized_shuffle_partitions_rule():
    """The data-sized shuffle-partition rule, pinned to its measured
    anchors: the R=100 replicated corpus (~450 MB of parquet) must get
    512 partitions (the SCALING.md tfidf knee cure), bench scale
    (~17 MB) must stay at the core-count floor (the measured 1.8x
    blanket-high-default penalty), and the curve is a monotone,
    power-of-two, capped step function."""
    from training_etl_demo_2_spark.session import (
        SHUFFLE_SIZING_CAP,
        sized_shuffle_partitions,
    )

    assert sized_shuffle_partitions(450_000_000, base=32) == 512
    assert sized_shuffle_partitions(17_000_000, base=32) == 32
    assert sized_shuffle_partitions(0, base=32) == 32
    assert sized_shuffle_partitions(-5, base=32) == 32
    prev = 0
    for b in (1, 10**6, 10**8, 10**10, 10**12, 10**15, 10**18):
        p = sized_shuffle_partitions(b, base=32)
        assert p >= 32 and p >= prev
        assert p & (p - 1) == 0, f"not a power of two: {p}"
        prev = p
    assert sized_shuffle_partitions(10**18, base=32) == SHUFFLE_SIZING_CAP
    # the floor is the caller's core count, not a constant
    assert sized_shuffle_partitions(1, base=8) == 8


def test_r100_committed_rows_decade_ratio_bounded():
    """Static mirror over the committed R=100 artifact: every family
    row must carry the per-decade factor ratio_decade2 (t_100x/t_10x at
    data-sized partitions — the number that must be read beside the
    knee_factor, which inflates in fixed-cost-dominated regimes), and
    it must sit under the per-decade bound 10^1.5."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING_R100.json",
    )
    with open(path) as f:
        d = json.load(f)
    assert d["n_rep"] == 100
    # the run was made through the sizing helper: the 100x arm must
    # record a larger partition count than the 1x arm
    sp = d["shuffle_partitions"]
    assert sp["100x"] > sp["1x"] >= 32
    assert set(d["families"]), "no families recorded"
    for name, row in d["families"].items():
        assert row["ok"], f"{name} over the R^1.5 bound: {row}"
        assert "ratio_decade2" in row, f"{name} missing ratio_decade2"
        assert 0 < row["ratio_decade2"] <= 10**1.5, (name, row)
        # both graph families are present (round-9 ask)
    assert "pagerank_near_dups" in d["families"]
    assert "kcore_decomposition" in d["families"]


def test_r1000_committed_rows_third_decade_bounded():
    """Static mirror over the committed R=1000 artifact (round-10 ask):
    the two flagship corpus families carry a THIRD decade — the
    1000×/100× factor (recorded as ratio_decade2 relative to n_rep)
    must sit under the per-decade bound 10^1.5, and the deterministic
    candidate anchor must stay linear at three decades."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING_R1000.json",
    )
    with open(path) as f:
        d = json.load(f)
    assert d["n_rep"] == 1000
    sp = d["shuffle_partitions"]
    assert sp["1000x"] > sp["100x"] > sp["1x"] >= 32
    # banding candidate volume stays linear over three decades
    assert d["candidate_growth"] <= 1.2 * 1000
    assert d["candidate_growth"] >= 0.8 * 1000
    for fam in ("dedup_minhash_lsh", "corpus_pipeline_e2e"):
        row = d["families"][fam]
        assert row["ok"], f"{fam} over the R^1.5 bound: {row}"
        third_decade = row["t_1000x_s"] / row["t_100x_s"]
        assert 0 < third_decade <= 10**1.5, (fam, third_decade)


def test_bench_expensive_queries_have_growth_rows():
    """Round-10 tripwire: every query that costs >= 4 s in the
    committed bench must be a measured scale family or carry an
    explicit adjudication below — so a future expensive query cannot
    ship without a growth law (the round-9/10 verdict ask, pinned)."""
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BENCH.json")) as f:
        bench = json.load(f)
    # adjudicated non-family rows (rationale in SCALING.md)
    adjudicated = {
        # exact count_distinct x16 IS the oracle tier; the measured
        # 100 TB path is data_profile_lineitem_approx (a family)
        "data_profile_lineitem",
        # auto-dispatcher: exact O(n^2)-flop tier only below 200k
        # vectors, LSH tier above (measured as ann_lsh_topk)
        "embedding_near_pairs",
        # composition of two measured tiers (dedup_minhash_lsh family +
        # the cosine pair dispatcher adjudicated via embedding_near_
        # pairs) glued by a pair-keyed equi-join and three 1-row folds
        "lexical_semantic_agreement",
        # bounded-replay harness latency, not data growth: availableNow
        # micro-batch + per-partition state-store commits dominate at
        # fixture scale; the underlying watermarked plans shuffle
        # (window, key)-keyed rows and scale like their batch twins
        # (stream_near_dup's batch twin is the dedup_minhash_lsh family)
        "stream_near_dup",
        "stream_session_stats",
    }
    # Only clean-calib-stamped timings classify as expensive: the r10
    # round-close committed a contended run (223/389 probes over
    # threshold) whose inflated stamps pushed arbitrary queries over
    # the 4 s bar.
    thresh = bench.get("calib_threshold_s", float("inf"))
    calib = bench.get("calib", {})
    expensive = {
        n
        for n, s in bench["queries"].items()
        if s >= 4.0 and calib.get(n, 0.0) <= thresh
    }
    uncovered = expensive - set(FAMILIES) - adjudicated
    assert not uncovered, (
        "bench-expensive queries without a growth row (add a "
        f"scale_bench family or an adjudication): {sorted(uncovered)}"
    )
