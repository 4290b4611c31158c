"""Planted tests for the round-7 batch-A operators: per-source cap
curve, batching padding waste, bloom decontamination screen, and the
cluster/shard co-location audit."""

from __future__ import annotations

from pyspark.sql import functions as F

from training_etl_demo_2_spark.operators import curation, dedup


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


# --- source_cap_curve --------------------------------------------------------


def test_source_cap_curve_accounting(spark):
    """Per-cap accounting is exact and monotone: kept+dropped is the
    corpus for every cap, kept grows with the cap, and a source stops
    counting as capped once the cap reaches its size."""
    rows = [
        (i, "w " * 3, "en", "big") for i in range(6)
    ] + [(10 + i, "w " * 3, "en", "small") for i in range(2)]
    rows = [(d, t.strip(), l, s) for d, t, l, s in rows]
    df = _docs(spark, rows)
    out = {
        r.cap: r
        for r in curation.source_cap_curve(df, caps=(1, 2, 6)).collect()
    }
    total = len(rows)
    for cap, r in out.items():
        assert r.docs_kept + r.docs_dropped == total
        assert r.tokens_kept + r.tokens_dropped == 3 * total
    assert out[1].docs_kept == 2  # one per source
    assert out[1].sources_capped == 2
    assert out[2].docs_kept == 4
    assert out[2].sources_capped == 1  # 'small' (2 docs) fits exactly
    assert out[6].docs_kept == total
    assert out[6].sources_capped == 0
    assert out[1].docs_kept <= out[2].docs_kept <= out[6].docs_kept


def test_source_cap_curve_append_stable(spark):
    """Adding docs never evicts previously-kept ones: the kept set at a
    cap is a superset-or-equal under appends only if ranks of old docs
    can only IMPROVE-or-hold — with hash rank, an appended doc can push
    an old doc past the cap only by ranking below it, i.e. old kept
    docs with rank <= cap keep rank <= cap + 1. Pin the weaker, exact
    property the docstring claims: ranks of existing docs are
    unchanged-or-incremented, so the cap-1 keeper changes only if the
    new doc out-ranks it."""
    base = [(1, "a b c", "en", "s"), (2, "d e f", "en", "s")]
    df1 = _docs(spark, base)
    df2 = _docs(spark, base + [(3, "g h i", "en", "s")])
    k1 = curation.source_cap_curve(df1, caps=(1,)).collect()[0]
    k2 = curation.source_cap_curve(df2, caps=(1,)).collect()[0]
    assert k1.docs_kept == k2.docs_kept == 1
    assert k2.docs_dropped == k1.docs_dropped + 1


# --- batch_padding_strategy --------------------------------------------------


def test_batch_padding_sorted_never_worse(spark):
    """On a corpus with alternating short/long docs, arrival-order
    batches mix lengths (pad to the long doc) while length-sorted
    batches are homogeneous: sorted waste must be strictly smaller,
    and both strategies conserve real tokens."""
    rows = []
    for i in range(32):
        # group = doc_id % 2, so alternate lengths WITHIN each group
        # (i % 4 < 2 -> short): group 0 sees 1,9,1,9..., group 1 too
        text = "w" if i % 4 < 2 else " ".join(["w"] * 9)
        rows.append((i, text, "en", "s"))
    df = _docs(spark, rows)
    out = {
        r.strategy: r
        for r in curation.batch_padding_strategy(
            df, batch_size=4, n_groups=2
        ).collect()
    }
    assert set(out) == {"arrival", "length_sorted"}
    real = 16 * 1 + 16 * 9
    for r in out.values():
        assert r.real_tokens == real
        assert r.padded_tokens >= r.real_tokens
        assert 0 <= r.pad_waste_bp < 10000
    # arrival alternates 1,9,1,9... within each group: every batch pads
    # to 9. length-sorted separates them: half the batches are all-1s.
    assert out["arrival"].padded_tokens == 32 * 9
    assert out["length_sorted"].padded_tokens == 16 * 1 + 16 * 9
    assert out["length_sorted"].pad_waste_bp == 0
    assert (
        out["length_sorted"].padded_tokens < out["arrival"].padded_tokens
    )


def test_batch_padding_partial_batch(spark):
    """A group whose doc count is not a multiple of batch_size pads the
    tail batch only to its own max — count(*)·max, not B·max."""
    rows = [(i, " ".join(["w"] * (i + 1)), "en", "s") for i in range(5)]
    df = _docs(spark, rows)
    out = {
        r.strategy: r
        for r in curation.batch_padding_strategy(
            df, batch_size=4, n_groups=1
        ).collect()
    }
    # arrival = sorted here (lengths increase with doc_id):
    # batch 0 = lens 1..4 -> 4*4 = 16; batch 1 = len 5 -> 1*5 = 5
    for r in out.values():
        assert r.n_batches == 2
        assert r.padded_tokens == 16 + 5
        assert r.real_tokens == 1 + 2 + 3 + 4 + 5


# --- bloom_contamination_screen ----------------------------------------------


def test_bloom_screen_no_false_negatives(spark):
    """A probe doc duplicated verbatim in the training split must be
    flagged on EVERY gram by both tiers (blooms cannot miss), and
    exact_hits <= bloom_hits holds row-by-row."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, shared, "en", "probe"),  # probe (doc_id < 5)
        (1, "one two three four five six seven", "en", "probe"),
        (10, shared, "en", "train"),
        (11, "totally different training text here now", "en", "train"),
    ]
    df = _docs(spark, rows)
    out = {
        r.doc_id: r
        for r in curation.bloom_contamination_screen(df).collect()
    }
    assert set(out) == {0, 1}
    dup = out[0]
    assert dup.n_grams > 0
    assert dup.exact_hits == dup.n_grams  # verbatim copy in train
    assert dup.bloom_hits == dup.n_grams  # no false negatives
    for r in out.values():
        assert 0 <= r.exact_hits <= r.bloom_hits <= r.n_grams
        assert r.false_pos == r.bloom_hits - r.exact_hits


def test_bloom_screen_tiny_filter_all_positive(spark):
    """Shrinking m to 1 saturates the filter: every probe gram goes
    bloom-positive while exact stays truthful — the FP column is doing
    the measuring, not the bloom rule."""
    rows = [
        (0, "alpha beta gamma delta epsilon", "en", "p"),
        (10, "zeta eta theta iota kappa", "en", "t"),
    ]
    df = _docs(spark, rows)
    r = curation.bloom_contamination_screen(df, m=1).collect()[0]
    assert r.bloom_hits == r.n_grams
    assert r.exact_hits == 0
    assert r.false_pos == r.n_grams


# --- cluster_shard_colocation -------------------------------------------------


def test_cluster_shard_colocation_accounts_all_members(spark):
    """The histogram partitions the cluster members exactly: total
    n_docs equals near_dup_clusters' row count, spans are within
    [1, n_shards], and with n_shards=1 everything co-locates."""
    near = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, near, "en", "s"),
        (2, near + " extra", "en", "s"),
        (3, near, "en", "s"),
        (4, "unrelated text with completely different words here", "en", "s"),
    ]
    df = _docs(spark, rows)
    members = dedup.near_dup_clusters(df).count()
    assert members >= 3
    hist = curation.cluster_shard_colocation(df, n_shards=16).collect()
    assert sum(r.n_docs for r in hist) == members
    assert all(1 <= r.n_shards_spanned <= 16 for r in hist)
    one = curation.cluster_shard_colocation(df, n_shards=1).collect()
    assert len(one) == 1 and one[0].n_shards_spanned == 1
    assert one[0].n_docs == members


# --- inbatch_negative_audit ---------------------------------------------------


def test_inbatch_negative_audit_counts(spark):
    """Batches partition the corpus (sum n_vecs = N), pair counts are
    exactly C(n_vecs, 2) per batch, and a planted same-label duplicate
    vector pair inside one batch is flagged as both same-label and
    near (cosine 1.0)."""
    from training_etl_demo_2_spark.operators import similarity

    # one group, batch_size 4 -> ids 0..3 in batch "0-0", 4..7 in "0-1"
    vec = [1.0, 0.0, 0.5]
    other = [0.0, 1.0, -0.5]
    rows = [(i, vec if i < 2 else other, 7 if i < 2 else i) for i in range(8)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = {
        r.batch_id: r
        for r in similarity.inbatch_negative_audit(
            emb, batch_size=4, n_groups=1
        ).collect()
    }
    assert sum(r.n_vecs for r in out.values()) == 8
    for r in out.values():
        assert r.n_pairs == r.n_vecs * (r.n_vecs - 1) // 2
        assert 0 <= r.near_pairs <= r.n_pairs
        assert 0 <= r.same_label_pairs <= r.n_pairs
    # one batch holding everything: the planted identical same-label
    # pair (ids 0, 1) is in-batch BY CONSTRUCTION and must be flagged
    one = similarity.inbatch_negative_audit(
        emb, batch_size=8, n_groups=1
    ).collect()
    assert len(one) == 1
    assert one[0].n_pairs == 28
    assert one[0].same_label_pairs >= 1
    assert one[0].near_pairs >= 1
    assert one[0].max_sim == 1.0


# --- boilerplate_prefix_report -------------------------------------------------


def test_boilerplate_prefix_modal_and_share(spark):
    """The modal 3-token prefix per source, exact share, lexicographic
    tie-break."""
    from training_etl_demo_2_spark.operators import text as textops

    rows = [
        (1, "subscribe to our newsletter now", "en", "a"),
        (2, "subscribe to our channel please", "en", "a"),
        (3, "totally organic content here", "en", "a"),
        (4, "zz top", "en", "b"),
        (5, "aa bottom", "en", "b"),
    ]
    df = _docs(spark, rows)
    out = {r.source: r for r in textops.boilerplate_prefix_report(df).collect()}
    a = out["a"]
    assert a.top_prefix == "subscribe to our"
    assert (a.n_docs_with_prefix, a.n_docs, a.share_bp) == (2, 3, 6666)
    # source b: both prefixes count 1 -> lexicographically first wins
    assert out["b"].top_prefix == "aa bottom"
    assert out["b"].share_bp == 5000


# --- mixture_reweigh_mw ---------------------------------------------------------


def test_mixture_mw_uniform_loss_uniform_weights(spark):
    """Equal losses must yield equal final weights (the MW fixpoint),
    and a duplicate-heavy source must end strictly below a clean one."""
    from training_etl_demo_2_spark.operators import curation

    clean = [(i, f"unique text number {i}", "en", "clean") for i in range(4)]
    dups = [(10 + i, "same text every time", "en", "dupy") for i in range(4)]
    out = {
        r.source: r
        for r in curation.mixture_reweigh_mw(
            _docs(spark, clean + dups)
        ).collect()
    }
    assert out["clean"].loss_bp == 0
    assert out["dupy"].loss_bp == 7500  # 3 of 4 docs are copies
    assert out["dupy"].w_bp < out["clean"].w_bp
    assert abs(out["clean"].w_bp + out["dupy"].w_bp - 10000) <= 2

    # uniform corpus: every source same loss -> equal weights
    uni = [(i, f"doc {i} words here", "en", f"s{i % 2}") for i in range(8)]
    w = [r.w_bp for r in curation.mixture_reweigh_mw(_docs(spark, uni)).collect()]
    assert max(w) - min(w) <= 1


# --- cluster_safe_split ---------------------------------------------------------


def test_cluster_safe_split_zero_leakage(spark):
    """Cluster-keyed splitting leaks ZERO near-dup pairs by
    construction; the naive doc-id split is reported on the same
    corpus; both strategies partition every document."""
    near = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, f"{near} tail{i % 3}", "en", "s") for i in range(12)] + [
        (100 + i, f"unique doc {i} filler words here now ok", "en", "s")
        for i in range(8)
    ]
    df = _docs(spark, rows)
    out = {r.strategy: r for r in curation.cluster_safe_split(df).collect()}
    assert set(out) == {"naive", "cluster_safe"}
    for r in out.values():
        assert r.n_train + r.n_val + r.n_test == len(rows)
    assert out["cluster_safe"].leaked_pairs == 0
    assert out["naive"].leaked_pairs >= out["cluster_safe"].leaked_pairs
