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
    assert all(0 <= v < 2**32 for v in fp.values())


def test_simhash_banding_is_exact_for_hamming_3(spark, tables):
    """Banded pairs == brute-force pairs for hamming<=3 (pigeonhole)."""
    docs = tables["documents"].limit(60)
    fps = {r.doc_id: r.simhash for r in dedup.simhash_fingerprints(docs).collect()}
    brute = set()
    ids = sorted(fps)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if bin(fps[a] ^ fps[b]).count("1") <= 3:
                brute.add((a, b))
    banded = {
        (p.doc_a, p.doc_b)
        for p in dedup.simhash_near_pairs(docs, max_hamming=3).collect()
    }
    assert banded == brute
