"""Dedup operator tests: planted near-dups found, LSH candidates ⊇
high-jaccard pairs, simhash banding exactness, exact-dedup keep-first."""

from __future__ import annotations

from training_etl_demo_2_spark.operators import dedup


def test_exact_dedup_keeps_first(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "Hello   World"), (3, "other doc")],
        "doc_id long, text string",
    )
    groups = {r.keep_id: r.n_copies for r in dedup.exact_dedup_groups(df).collect()}
    # normalization (lower + whitespace collapse) makes 1 and 2 identical
    assert groups == {1: 2, 3: 1}
    survivors = sorted(r.doc_id for r in dedup.drop_exact_duplicates(df).collect())
    assert survivors == [1, 3]


def test_ngram_jaccard_finds_planted_dups(tables):
    pairs = dedup.ngram_jaccard_pairs(tables["documents"], threshold=0.5).collect()
    assert len(pairs) > 0
    assert all(p.jaccard >= 0.5 for p in pairs)
    assert all(p.doc_a < p.doc_b for p in pairs)


def test_minhash_lsh_matches_exact_at_high_threshold(tables):
    """LSH-verified pairs == exact pairs at j>=0.8 (banding recall at
    the fixture's j>=0.9 separation is ~1-2e-4)."""
    exact = {
        (p.doc_a, p.doc_b)
        for p in dedup.ngram_jaccard_pairs(tables["documents"], threshold=0.8).collect()
    }
    lsh = {
        (p.doc_a, p.doc_b)
        for p in dedup.minhash_lsh_pairs(tables["documents"], threshold=0.8).collect()
    }
    assert lsh == exact


def test_minhash_signature_width(tables):
    sig = dedup.minhash_signatures(tables["documents"])
    assert len([c for c in sig.columns if c.startswith("m")]) == dedup.NUM_PERM


def test_simhash_identical_docs_same_fp(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d"), (3, "x y z w")],
        "doc_id long, text string",
    )
    fp = {r.doc_id: r.simhash for r in dedup.simhash_fingerprints(df).collect()}
    assert fp[1] == fp[2] != fp[3]
    # signed 64-bit fingerprints (bit 63 carries the two's-complement sign)
    assert all(-(2**63) <= v < 2**63 for v in fp.values())


def test_simhash_banding_is_exact_for_hamming_3(spark, tables):
    """Banded pairs == brute-force pairs for hamming<=3 (pigeonhole)."""
    docs = tables["documents"].limit(60)
    fps = {r.doc_id: r.simhash for r in dedup.simhash_fingerprints(docs).collect()}
    brute = set()
    ids = sorted(fps)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            # mask to the 64-bit pattern: fingerprints are signed
            if bin((fps[a] ^ fps[b]) & (2**64 - 1)).count("1") <= 3:
                brute.add((a, b))
    banded = {
        (p.doc_a, p.doc_b)
        for p in dedup.simhash_near_pairs(docs, max_hamming=3).collect()
    }
    assert banded == brute


def test_simhash_pair_density_stays_near_dup_sized(tables):
    """Round-2 regression guard: a degenerate fingerprint (too-narrow
    bands / biased bits) makes the 'near-dup' pair set quadratic. With
    64-bit hashes + 16-bit bands, hamming<=3 pairs must stay a small
    multiple of the corpus size, never a fraction of n^2."""
    docs = tables["documents"]
    n = docs.count()
    pairs = dedup.simhash_near_pairs(docs, max_hamming=3).count()
    assert pairs <= 2 * n, f"{pairs} pairs from {n} docs: fingerprint degenerated"


def test_connected_components_shapes(spark):
    # chain 1-2-3, cycle 10-11-12-10, isolated pair (20, 21)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10), (20, 21)],
        "doc_a long, doc_b long",
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_long_chain_converges(spark):
    # path graph of 12 nodes: worst-case diameter for label propagation
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "doc_a long, doc_b long"
    )
    got = dedup.connected_components(pairs).collect()
    assert {r["cluster_id"] for r in got} == {0}
    assert len(got) == 13


def test_near_dup_clusters_consistent_with_pairs(tables):
    docs = tables["documents"]
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.8).collect()
    clusters = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.near_dup_clusters(docs, threshold=0.8).collect()
    }
    # every paired doc is clustered, both endpoints share a cluster
    for p in pairs:
        assert clusters[p["doc_a"]] == clusters[p["doc_b"]]
    # cluster id is the min member
    from collections import defaultdict

    members = defaultdict(list)
    for d, c in clusters.items():
        members[c].append(d)
    for c, ms in members.items():
        assert c == min(ms)
        assert len(ms) >= 2  # singletons never appear


def test_fuzzy_name_pairs_blocking_and_verify(spark):
    from training_etl_demo_2_spark.operators.dedup import fuzzy_name_pairs

    df = spark.createDataFrame(
        [(1, "cold gear"), (2, "old gear"), (3, "red bolt"), (4, "cold gear")],
        "id long, name string",
    )
    out = {(r.name_a, r.name_b): r.dist for r in fuzzy_name_pairs(df, "name").collect()}
    # distinct-value space: the duplicate 'cold gear' collapses first
    assert out == {("cold gear", "old gear"): 1}


def test_incremental_dedup_against_corpus(tables):
    from pyspark.sql import functions as F

    from training_etl_demo_2_spark.functions import normalize_text, rolling_hash

    docs = tables["documents"]
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    incoming = docs.filter(F.col("doc_id") % 2 == 1)
    out = dedup.incremental_dedup(incoming, corpus)
    got_ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert got_ids and all(i % 2 == 1 for i in got_ids)
    # no surviving incoming doc's normalized fingerprint exists in corpus
    fp = rolling_hash(normalize_text("text")).alias("fp")
    corpus_fps = {r["fp"] for r in corpus.select(fp).collect()}
    out_fps = [r["fp"] for r in out.select(fp).collect()]
    assert not (set(out_fps) & corpus_fps)
    # and within the surviving batch, fingerprints are unique
    assert len(out_fps) == len(set(out_fps))


def test_line_dedup_drops_shared_segments(spark):
    """A 10-word segment shared verbatim by two docs is boilerplate and
    must vanish from both; unique segments survive in original order."""
    boiler = " ".join(f"b{i}" for i in range(10))
    uniq_a = " ".join(f"a{i}" for i in range(10))
    uniq_b = " ".join(f"c{i}" for i in range(10))
    df = spark.createDataFrame(
        [
            (1, f"{boiler} {uniq_a}"),
            (2, f"{boiler} {uniq_b}"),
            (3, uniq_a[::-1]),  # unrelated content
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup.line_dedup(df).collect()}
    assert out[1].clean_text == uniq_a
    assert out[1].n_kept == 1 and out[1].n_dropped == 1
    assert out[2].clean_text == uniq_b
    assert out[3].n_dropped == 0


def test_line_dedup_fully_boilerplate_doc_survives_empty(spark):
    seg = " ".join(f"x{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, seg), (2, seg)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in dedup.line_dedup(df).collect()}
    assert set(rows) == {1, 2}
    assert rows[1].clean_text == "" and rows[1].n_kept == 0


def test_line_dedup_preserves_segment_order(spark):
    """Survivor segments must reassemble in original positional order
    even when the dropped segment sits between them."""
    boiler = " ".join(f"b{i}" for i in range(10))
    first = " ".join(f"p{i}" for i in range(10))
    last = " ".join(f"q{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, f"{first} {boiler} {last}"), (2, boiler)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup.line_dedup(df).collect()}
    assert out[1].clean_text == f"{first} {last}"


def test_line_dedup_identity_without_boilerplate(tables):
    """With an unreachable min_docs, nothing is boilerplate and every
    document must reassemble to its exact original text (segmentation
    and reassembly are lossless inverses)."""
    out = {
        r.doc_id: r
        for r in dedup.line_dedup(tables["documents"], min_docs=10**9).collect()
    }
    for r in tables["documents"].select("doc_id", "text").collect():
        assert out[r.doc_id].clean_text == r.text
        assert out[r.doc_id].n_dropped == 0


def test_substring_dup_stats_planted_span(spark):
    """A 6-word span shared by two docs at DIFFERENT offsets is caught
    (sliding grams are offset-invariant, unlike line_dedup's fixed
    chunks); unique docs and short docs report zero."""
    shared = "alpha beta gamma delta epsilon zeta"
    df = spark.createDataFrame(
        [
            (1, f"{shared} tail one two three"),
            (2, f"lead-in words here {shared}"),  # offset 3, not 0
            (3, "completely different content with many words here ok"),
            (4, "tiny doc"),  # < k tokens -> no grams
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup.substring_dup_stats(df, k=5).collect()}
    assert set(out) == {1, 2, 3, 4}
    # a 6-word shared span yields 2 shared 5-grams in each doc
    assert out[1].n_dup_grams == 2 and out[2].n_dup_grams == 2
    assert out[3].n_dup_grams == 0
    assert out[4].n_grams == 0 and out[4].dup_gram_bp == 0
    assert out[1].dup_gram_bp == 10000 * 2 // out[1].n_grams


def test_substring_dup_stats_fixture_density(tables):
    """Corpus-level sanity at sf0.001: every doc is covered, bp bounded,
    and the planted near-dup docs carry duplicated grams."""
    docs = tables["documents"]
    out = dedup.substring_dup_stats(docs).collect()
    assert len(out) == docs.count()
    assert all(0 <= r.dup_gram_bp <= 10000 for r in out)
    assert any(r.n_dup_grams > 0 for r in out)


def test_pagerank_star_center_wins(spark):
    """On a star graph the hub must outrank every leaf, and leaves tie
    exactly (identical recurrence)."""
    from pyspark.sql import functions as F

    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "doc_a long, doc_b long"
    ).select("doc_a", "doc_b")
    # drive the same superstep code through a monkeypatched pair source
    import training_etl_demo_2_spark.operators.dedup as d

    orig = d.minhash_lsh_pairs
    try:
        d.minhash_lsh_pairs = lambda df, *a, **k: pairs
        out = {r.doc_id: r.pr for r in d.pagerank_near_dup_graph(pairs).collect()}
    finally:
        d.minhash_lsh_pairs = orig
    assert set(out) == {0, 1, 2, 3, 4, 5}
    leaves = {out[i] for i in range(1, 6)}
    assert len(leaves) == 1  # exact tie
    assert out[0] > max(leaves)


def test_source_overlap_matrix_counts_distinct_content(spark):
    from training_etl_demo_2_spark.operators.dedup import source_overlap_matrix

    df = spark.createDataFrame(
        [
            (1, "shared doc one", "s1"),
            (2, "Shared   Doc one", "s2"),  # same normalized content
            (3, "shared doc one", "s2"),  # duplicate copy: must not double count
            (4, "only in s1", "s1"),
            (5, "only in s3", "s3"),
        ],
        "doc_id long, text string, source string",
    )
    out = {
        (r.source_a, r.source_b): r.n_shared
        for r in source_overlap_matrix(df).collect()
    }
    assert out == {("s1", "s2"): 1}


def test_hard_negative_pairs_band(tables):
    """Hard negatives sit strictly between background noise and
    near-dups: every pair in [lo, hi), disjoint from the near-dup set,
    and non-empty on the fixture corpus."""
    from training_etl_demo_2_spark.operators.dedup import (
        hard_negative_pairs,
        ngram_jaccard_pairs,
    )

    docs = tables["documents"]
    neg = hard_negative_pairs(docs).collect()
    assert len(neg) > 0
    assert all(0.03 <= p.jaccard < 0.5 for p in neg)
    dups = {
        (p.doc_a, p.doc_b)
        for p in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert dups.isdisjoint({(p.doc_a, p.doc_b) for p in neg})


def test_lsh_recall_eval_invariants(tables):
    """Verified LSH can never produce false positives (the verify
    stage applies the exact predicate), and fixture recall is total."""
    from training_etl_demo_2_spark.operators.dedup import lsh_recall_eval

    row = lsh_recall_eval(tables["documents"]).collect()[0]
    assert row.fp == 0
    assert row.tp + row.fn == row.n_exact
    assert row.n_exact > 0
    assert row.fn == 0  # banding recall is total on the fixture's j>=0.9 dups


def test_triangle_census_planted(spark):
    """Three identical docs form one wedge + one closed triangle; an
    isolated duplicate pair adds an edge but no wedge."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    other = "completely different content about distributed systems and parquet files here"
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base),
            (3, base),
            (4, other),
            (5, other),
            (6, "unrelated third text that matches nothing else in this corpus at all"),
        ],
        "doc_id long, text string",
    )
    row = dedup.near_dup_triangles(df).collect()[0]
    assert row.n_edges == 4  # (1,2),(1,3),(2,3),(4,5)
    # the 3-clique holds one wedge per middle vertex (sum C(deg,2) = 3);
    # the isolated pair holds none — so closure 3*tri/wedges == 1
    assert row.n_wedges == 3
    assert row.n_triangles == 1


def test_triangle_census_counts_hub_wedges(spark):
    """A hub whose id is the minimum of its neighbors: the wedge 2-1-3
    must still be counted (the id-ordered join would miss it)."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    # docs 2 and 3 are near-dups of 1 but not of each other
    b2 = base + " first extra tail words here"
    b3 = base + " second other ending tokens now"
    df = spark.createDataFrame(
        [(1, base), (2, b2), (3, b3)], "doc_id long, text string"
    )
    row = dedup.near_dup_triangles(df, threshold=0.5).collect()[0]
    assert row.n_edges >= 2
    # hub wedge(s) visible; if (2,3) also paired this is a closed clique
    if row.n_edges == 2:
        assert row.n_wedges == 1 and row.n_triangles == 0
    else:
        assert row.n_wedges == 3 and row.n_triangles == 1


def test_triangle_census_open_wedge(spark):
    """A chain a~b, b~c without a~c: the wedge stays open — exactly the
    accidental-chain shape the census exists to expose."""
    w = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    a = w  # w1..w12
    b = w + " nu xi omicron"  # jaccard(a,b) = 10/13
    # c replaces the head: shares b's interior+tail (10/16 = 0.625)
    # but too little of a (7/16 = 0.44 < 0.5)
    c = "one two three " + " ".join(w.split()[3:]) + " nu xi omicron"
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    row = dedup.near_dup_triangles(df, threshold=0.5).collect()[0]
    assert row.n_edges == 2  # (1,2), (2,3) — no (1,3)
    assert row.n_wedges == 1  # the open chain 1-2-3
    assert row.n_triangles == 0


def test_incremental_near_dup_probes_corpus_only(spark):
    """Cross-batch near-dups are reported; within-batch and
    within-corpus pairs are NOT (those belong to the batch's own dedup
    pass / the corpus's history)."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    other = "completely different content about distributed systems and parquet files"
    corpus = spark.createDataFrame(
        [(2, base), (4, other), (6, other)], "doc_id long, text string"
    )
    incoming = spark.createDataFrame(
        [(1, base), (3, base), (5, "fresh unseen text nothing like the rest of them here")],
        "doc_id long, text string",
    )
    out = dedup.incremental_near_dup(incoming, corpus).collect()
    pairs = {(r.doc_new, r.doc_old) for r in out}
    # both incoming copies of `base` hit corpus doc 2...
    assert (1, 2) in pairs and (3, 2) in pairs
    # ...but the (1,3) within-batch pair and (4,6) corpus pair are absent
    assert all(p[0] in {1, 3, 5} and p[1] in {2, 4, 6} for p in pairs)
    assert len(pairs) == 2
    assert all(r.jaccard >= 0.8 for r in out)


def test_ngram_jaccard_matches_python_reference(spark):
    """Operator-level differential: LSH-free exact Jaccard pairs over a
    fixed-seed random corpus must equal an independent pure-Python
    computation of the same semantics (3-gram string sets)."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    docs = [
        (
            i,
            " ".join(
                rng.choice(vocab) for _ in range(rng.randint(5, 25))
            ),
        )
        for i in range(20)
    ]

    def shingles(t):
        toks = t.split(" ")
        if len(toks) < 3:
            return set()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    want = {}
    for idx, (a, ta) in enumerate(docs):
        for b, tb in docs[idx + 1 :]:
            sa, sb = shingles(ta), shingles(tb)
            if not (sa | sb):
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= 0.2:
                want[(a, b)] = j

    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            spark.createDataFrame(docs, "doc_id long, text string"),
            threshold=0.2,
        ).collect()
    }
    assert set(got) == set(want)
    for k, j in want.items():
        assert abs(got[k] - j) < 1e-6, (k, got[k], j)


def test_containment_catches_subset_jaccard_misses(spark):
    """A short excerpt fully embedded in a long doc: containment ≈ 1.0
    on the excerpt side while Jaccard stays far below any dedup
    threshold — the asymmetric pair class this operator exists for."""
    base = " ".join(f"w{i}" for i in range(200))
    excerpt = " ".join(f"w{i}" for i in range(40, 60))  # 20 tokens inside base
    df = spark.createDataFrame(
        [(1, base), (2, excerpt), (3, "x y z q r s t u v")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_a, r.doc_b): (r.cont_a, r.cont_b)
        for r in dedup.ngram_containment_pairs(df, threshold=0.8).collect()
    }
    assert set(got) == {(1, 2)}
    cont_a, cont_b = got[(1, 2)]
    # all 18 of the excerpt's 3-gram shingles appear in base
    assert cont_b == 1.0
    assert cont_a < 0.2  # base side is NOT contained in the excerpt
    # symmetric Jaccard misses the same pair at any dedup-grade threshold
    jac = dedup.ngram_jaccard_pairs(df, threshold=0.5).collect()
    assert (1, 2) not in {(r.doc_a, r.doc_b) for r in jac}


def test_containment_direction_and_bounds(tables):
    rows = dedup.ngram_containment_pairs(tables["documents"], threshold=0.8).collect()
    for r in rows:
        assert r.doc_a < r.doc_b
        assert 0.0 <= r.cont_a <= 1.0 and 0.0 <= r.cont_b <= 1.0
        assert max(r.cont_a, r.cont_b) >= 0.8
    # the fixture's planted near-dups (high jaccard) are containment pairs too
    jac = {
        (r.doc_a, r.doc_b)
        for r in dedup.ngram_jaccard_pairs(tables["documents"], threshold=0.8).collect()
    }
    got = {(r.doc_a, r.doc_b) for r in rows}
    assert jac <= got


def test_intra_doc_repetition_planted(spark):
    """A doc that repeats its own 10-word paragraph is flagged; a
    non-repeating doc reports zero duplicate segments."""
    para = " ".join(f"p{i}" for i in range(10))
    other = " ".join(f"q{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, f"{para} {para} {para}"), (2, f"{para} {other}")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in dedup.intra_doc_repetition(df).collect()}
    assert rows[1].n_segs == 3 and rows[1].n_distinct == 1
    assert rows[1].max_mult == 3 and rows[1].dup_seg_bp == 6667
    assert rows[2].n_segs == 2 and rows[2].dup_seg_bp == 0


def test_near_dup_degree_hist_star(spark):
    """A planted star (one template near-dup'd by 3 pages) yields one
    degree-3 hub and three degree-1 leaves."""
    base = " ".join(f"t{i}" for i in range(40))
    variants = [base.replace(f"t{i} ", f"x{i} ", 1) for i in (5, 15, 25)]
    rows = [(0, base)] + [(i + 1, v) for i, v in enumerate(variants)] + [
        (10, "entirely different content " + " ".join(f"z{i}" for i in range(30)))
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    hist = {r.degree: r.n_docs for r in
            dedup.near_dup_degree_hist(df, threshold=0.8).collect()}
    assert hist.get(3) == 1  # the template hub
    assert hist.get(1, 0) >= 3  # leaves (variants may also pair up)


def test_duplicate_provenance_sources(spark):
    df = spark.createDataFrame(
        [
            (1, "web", "same content here"),
            (2, "books", "Same   Content here"),
            (3, "web", "same content here"),
            (4, "web", "unique text"),
        ],
        "doc_id long, source string, text string",
    )
    rows = dedup.duplicate_provenance(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.keep_id == 1 and r.n_copies == 3
    assert r.n_sources == 2 and r.sources == "books,web"


def test_near_dup_provenance_cross_source(spark):
    """Near-identical docs from two sources form one cluster whose
    provenance lists both sources sorted."""
    base = " ".join(f"t{i}" for i in range(40))
    variant = base.replace("t5 ", "x5 ", 1)
    df = spark.createDataFrame(
        [(1, "web", base), (2, "books", variant), (3, "web", "unrelated " * 20)],
        "doc_id long, source string, text string",
    )
    rows = dedup.near_dup_provenance(df, threshold=0.8).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.cluster_id == 1 and r.n_docs == 2
    assert r.n_sources == 2 and r.sources == "books,web"


def test_duplicate_spans_islands(spark):
    """A shared 10-token run inside otherwise-unique docs merges into
    ONE maximal span covering exactly the shared tokens; spans agree
    with substring_dup_stats' gram counts."""
    shared = " ".join(f"s{i}" for i in range(10))
    a_pre = " ".join(f"a{i}" for i in range(6))
    a_post = " ".join(f"A{i}" for i in range(6))
    b_pre = " ".join(f"b{i}" for i in range(4))
    df = spark.createDataFrame(
        [(1, f"{a_pre} {shared} {a_post}"), (2, f"{b_pre} {shared}")],
        "doc_id long, text string",
    )
    spans = {r.doc_id: r for r in dedup.duplicate_spans(df, k=5).collect()}
    # doc 1: shared run occupies tokens 6..15 -> grams 6..11 (k=5)
    r1 = spans[1]
    assert (r1.span_start, r1.span_end, r1.n_grams) == (6, 15, 6)
    r2 = spans[2]
    assert (r2.span_start, r2.span_end, r2.n_grams) == (4, 13, 6)
    # per-doc dup-gram totals match the stats tier
    stats = {r.doc_id: r.n_dup_grams
             for r in dedup.substring_dup_stats(df, k=5).collect()}
    assert stats == {1: 6, 2: 6}


def test_prefix_filter_equals_exact_pairs(tables):
    """Prefix filtering is exact: its pair set must be IDENTICAL to the
    ground-truth shingle self-join at the same threshold — no false
    negatives (the prefix theorem) and no false positives (the verify
    stage applies the exact predicate)."""
    exact = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.ngram_jaccard_pairs(
            tables["documents"], threshold=0.6
        ).collect()
    }
    pf = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.prefix_filter_jaccard_pairs(
            tables["documents"], threshold=0.6
        ).collect()
    }
    assert pf == exact
    assert len(pf) > 0


def test_prefix_filter_planted_and_boundary(spark):
    """Planted near-identical pair found; a float-boundary size (5
    shingles at t=0.6 -> prefix length must be exactly 5-3+1=3) does
    not drop qualifying pairs."""
    a = "w1 w2 w3 w4 w5 w6 w7"          # 5 3-gram shingles
    b = "w1 w2 w3 w4 w5 w6 zz"          # shares 4 of its 5 shingles
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, "x1 x2 x3 x4 x5 x6 x7")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.prefix_filter_jaccard_pairs(df, threshold=0.6).collect()
    }
    # |A∩B|=4, |A∪B|=6 -> j=0.666667 >= 0.6; the unrelated doc pairs with nothing
    assert set(got) == {(1, 2)}
    assert abs(got[(1, 2)] - 0.666667) < 1e-6


def test_prefix_positional_filter_prunes_without_loss(tables):
    """The PPJoin positional filter must only REMOVE candidates (never
    add), must measurably shrink the candidate set on the fixture
    corpus, and must lose no qualifying pair: the surviving candidates
    still contain every exact-Jaccard pair at the threshold."""
    from fractions import Fraction

    docs = tables["documents"]
    fr = Fraction(0.6).limit_denominator(10_000)
    sh = dedup.shingle_hashes(docs, "text", dedup.DEFAULT_NGRAM)
    with_pos = dedup._prefix_candidates(sh, fr.numerator, fr.denominator)
    without = dedup._prefix_candidates(
        sh, fr.numerator, fr.denominator, positional=False
    )
    s_with = {(r.doc_a, r.doc_b) for r in with_pos.collect()}
    s_without = {(r.doc_a, r.doc_b) for r in without.collect()}
    assert s_with <= s_without
    assert len(s_with) < len(s_without), (
        f"positional filter pruned nothing ({len(s_without)} candidates)"
    )
    truth = {
        (r.doc_a, r.doc_b)
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.6).collect()
    }
    assert truth <= s_with


def test_duplicate_spans_overlapping_islands_merge(spark):
    """Two islands separated by a gram-position gap < k produce
    overlapping token intervals — the merge pass must union them into
    ONE disjoint span (the advisor's k=5 / positions 0-2 and 4-5
    double-cut case), and all emitted spans must be pairwise disjoint
    per doc."""
    # doc 1 plants two shared 5-gram runs whose flagged gram positions
    # are 0..2 (x-run shared with doc 2) and 4..5 (tail shared with
    # doc 3): token intervals [0,6] and [4,9] -> one merged span [0,9]
    df = spark.createDataFrame(
        [
            (1, "x0 x1 x2 x3 x4 x5 x6 u0 u1 u2"),
            (2, "x0 x1 x2 x3 x4 x5 x6 z0 z1 z2"),
            (3, "v0 v1 v2 v3 x4 x5 x6 u0 u1 u2"),
        ],
        "doc_id long, text string",
    )
    out = [r for r in dedup.duplicate_spans(df, k=5).collect()]
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: grams 0-2 (x-run with doc 2) and 4-5 (tail with doc 3)
    # are flagged; islands [0,2] and [4,5] -> token spans [0,6] and
    # [4,9] overlap -> merged to a single [0,9] with 5 flagged grams
    assert [(r.span_start, r.span_end, r.n_grams) for r in by_doc[1]] == [
        (0, 9, 5)
    ]
    # disjointness law across every doc
    for doc_id, rows in by_doc.items():
        rows = sorted(rows, key=lambda r: r.span_start)
        for prev, nxt in zip(rows, rows[1:]):
            assert nxt.span_start > prev.span_end, (doc_id, rows)


def test_remove_duplicate_spans_planted(spark):
    """Removal cuts exactly the flagged disjoint spans: the merged-span
    doc loses tokens 0-9, untouched docs pass through whole, and
    n_tokens/n_removed account for every token."""
    df = spark.createDataFrame(
        [
            (1, "x0 x1 x2 x3 x4 x5 x6 u0 u1 u2"),
            (2, "x0 x1 x2 x3 x4 x5 x6 z0 z1 z2"),
            (3, "v0 v1 v2 v3 x4 x5 x6 u0 u1 u2"),
            (4, "w0 w1 w2 w3"),  # < k tokens: no grams, untouched
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup.remove_duplicate_spans(df, k=5).collect()}
    assert set(out) == {1, 2, 3, 4}
    # doc 1's merged span [0, 9] covers the whole doc
    assert out[1].clean_text == "" and out[1].n_removed == 10
    # doc 2: span [0, 6] from the x-run -> tail survives
    assert out[2].clean_text == "z0 z1 z2" and out[2].n_removed == 7
    # doc 3: span [4, 9] -> head survives
    assert out[3].clean_text == "v0 v1 v2 v3" and out[3].n_removed == 6
    assert out[4].clean_text == "w0 w1 w2 w3" and out[4].n_removed == 0
    for r in out.values():
        n_clean = len(r.clean_text.split(" ")) if r.clean_text else 0
        assert r.n_tokens == n_clean + r.n_removed


def test_snm_catches_what_token_blocking_misses(spark):
    """The complementarity claim, demonstrated: 'cold gear' vs
    'coldgear' shares NO whitespace token (token blocking structurally
    misses it) but is adjacent in sort order — SNM finds it. And SNM's
    window is honest: a pair further than window-1 ranks apart is not
    emitted even if within edit distance."""
    from training_etl_demo_2_spark.operators import dedup

    df = spark.createDataFrame(
        [(1, "cold gear"), (2, "coldgear"), (3, "red bolt"), (4, "zz top")],
        "id long, p_name string",
    )
    token = {
        (r.name_a, r.name_b)
        for r in dedup.fuzzy_name_pairs(df, "p_name", max_dist=3).collect()
    }
    snm = {
        (r.name_a, r.name_b)
        for r in dedup.snm_fuzzy_pairs({"part": df}, max_dist=3).collect()
    }
    assert ("cold gear", "coldgear") not in token
    assert ("cold gear", "coldgear") in snm

    # window honesty: names 'aa','ab' adjacent; stuffing the gap with
    # names sorting between them pushes the pair out of window reach
    fillers = [(10 + i, f"aa{c}") for i, c in enumerate("cdef")]
    df2 = spark.createDataFrame(
        [(1, "aa"), (2, "ab")] + fillers, "id long, p_name string"
    )
    out2 = {
        (r.name_a, r.name_b)
        for r in dedup.snm_fuzzy_pairs(
            {"part": df2}, window=3, max_dist=2
        ).collect()
    }
    assert ("aa", "ab") not in out2  # 5 ranks apart > window
    # rank_gap is always within the declared window
    all_rows = dedup.snm_fuzzy_pairs({"part": df2}, window=3).collect()
    assert all(1 <= r.rank_gap <= 2 for r in all_rows)


def test_lpa_splits_weakly_bridged_communities(spark):
    """Two near-dup cliques joined by a single bridge pair form ONE
    connected component but TWO LPA communities after fixed sync
    rounds — the structure CC cannot see. Built directly on a synthetic
    edge relation via the same recurrence the operator uses."""
    from pyspark.sql import functions as F

    from training_etl_demo_2_spark.operators import dedup

    # clique A = {0,1,2}, clique B = {10,11,12}, bridge 2-10
    base = [(0, 1), (0, 2), (1, 2), (10, 11), (10, 12), (11, 12), (2, 10)]
    pairs = spark.createDataFrame(base, "doc_a long, doc_b long")
    # run the operator's recurrence on these pairs by monkey-wiring:
    # reuse the public function on a corpus engineered to produce them
    # is brittle; instead exercise the label rounds directly.
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .distinct()
    )
    from pyspark.sql import Window

    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(dedup.LPA_ITERS):
        votes = (
            edges.join(
                labels.select(F.col("node").alias("dst"), F.col("label").alias("nl")),
                "dst",
            )
            .groupBy(F.col("src").alias("node"), F.col("nl"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("nl"))
        labels = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", F.col("nl").alias("label"))
        )
    comm = {r.node: r.label for r in labels.collect()}
    assert len({comm[0], comm[1]}) == 1  # clique A agrees
    assert len({comm[11], comm[12]}) == 1  # clique B agrees
    assert comm[0] != comm[11]  # the bridge did not merge them
    # while CC would put all 7 nodes in one cluster
    cc = dedup.connected_components(pairs)
    assert cc.select("cluster_id").distinct().count() == 1


def test_lpa_fixture_refines_connected_components(tables):
    """On the real fixture: every LPA community sits INSIDE one CC
    (labels only travel along edges), and the community count is >=
    the CC count (LPA refines, never coarsens across components)."""
    from training_etl_demo_2_spark.operators import dedup

    docs = tables["documents"]
    comm = {
        r.doc_id: r.community
        for r in dedup.lpa_communities(docs).collect()
    }
    cc = {
        r.doc_id: r.cluster_id
        for r in dedup.near_dup_clusters(docs).collect()
    }
    assert set(comm) == set(cc)
    # community -> set of CCs it spans must be singleton
    span: dict[int, set] = {}
    for d, c in comm.items():
        span.setdefault(c, set()).add(cc[d])
    assert all(len(s) == 1 for s in span.values())
    assert len(set(comm.values())) >= len(set(cc.values()))
