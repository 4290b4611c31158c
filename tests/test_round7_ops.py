"""Planted tests for round-7 fixes: short-doc shingle semantics and
the posting-list TF-IDF verify."""

from __future__ import annotations

from pyspark.sql import functions as F

from training_etl_demo_2_spark.operators import dedup


# --- short docs (< n tokens) must vanish from the array shingle path --------


def test_shingle_arrays_drops_short_docs(spark):
    """A doc with fewer than n tokens has NO n-gram shingles: the
    exploded path (explode of an empty array) drops it, so the
    row-local array path must drop it too — an empty-array row would
    flow NULL array_min signatures and NULL band keys downstream."""
    df = spark.createDataFrame(
        [(1, "just two"), (2, "alpha beta gamma delta epsilon")],
        "doc_id long, text string",
    )
    rows = dedup._shingle_arrays(df).collect()
    assert [r.doc_id for r in rows] == [2]
    sigs = dedup.minhash_signatures(df).collect()
    assert [r.doc_id for r in sigs] == [2]
    assert all(v is not None for v in sigs[0].asDict().values())


def test_lsh_cost_advisor_short_doc_matches_oracle(spark):
    """The exact ADVICE repro: a corpus with one 2-token doc used to
    yield a phantom NULL-bk bucket per band (Spark n_buckets one high,
    n_docs counting the shingle-less doc) vs the exploded-semantics
    DuckDB twin. Pin engine-vs-twin equality on that corpus."""
    import duckdb

    rows = [
        (1, "too short"),
        (2, "alpha beta gamma delta epsilon"),
        (3, "alpha beta gamma delta epsilon"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r.band, r.n_buckets, r.n_docs, r.max_bucket, r.candidate_pairs)
        for r in dedup.lsh_cost_advisor({"documents": df}).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = con.sql(dedup.lsh_cost_advisor_sql()).fetchall()
    assert got == [tuple(w) for w in want]
    # docs 2 and 3 are identical -> every band has exactly one bucket
    # of size 2 (one candidate pair); the 2-token doc contributes nothing
    assert all(r == (b, 1, 2, 2, 1) for b, r in zip(range(len(got)), got))


# --- tfidf posting-list verify ----------------------------------------------


def test_tfidf_cosine_hot_split_exact(spark):
    """The round-7 verify splits the dot on the stop-shingle boundary:
    the non-hot part rides the candidate-generating co-shingle join,
    the hot part (df > df_max — needed for exactness) folds over
    hot-ONLY per-doc maps. Pin the split against the twin, which
    computes the same total in ONE relation: with df_max=2 the shared
    'x y z' trigram is hot (df=3), docs 1/2 are candidates through
    their non-hot 'p q r'/'q r s' shingles, and their cosine must
    still include the hot contribution; doc 3 shares ONLY the hot
    shingle and must not be emitted."""
    import duckdb

    rows = [
        (1, "p q r s a1 x y z"),
        (2, "p q r s b1 x y z"),
        (3, "m n o c1 x y z"),
        (4, "u v w d1 e1 f1 g1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.tfidf_cosine_pairs(df, df_max=2, threshold=0.0)
    got = sorted((r.doc_a, r.doc_b, r.cosine) for r in out.collect())
    assert [(a, b) for a, b, _ in got] == [(1, 2)]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.sql(
            dedup.tfidf_cosine_pairs_sql(df_max=2, threshold=0.0)
        ).fetchall()
    )
    assert got == want
    # and the hot contribution is really in there: recomputing with the
    # hot shingle excluded from scoring entirely would change the value
    df_nohot = spark.createDataFrame(
        [(i, t.replace(" x y z", "")) for i, t in rows],
        "doc_id long, text string",
    )
    nohot = {(r.doc_a, r.doc_b): r.cosine
             for r in dedup.tfidf_cosine_pairs(
                 df_nohot, df_max=2, threshold=0.0).collect()}
    assert nohot[(1, 2)] != got[0][2]


# --- corpus_pipeline_e2e composition semantics -------------------------------


def _pipeline_corpus(spark):
    """Four docs, all of which pass Gopher + language + PII tiers
    INDIVIDUALLY, constructed to expose two composition effects:

    * docs 1/2 differ ONLY in their email address — distinct raw texts
      (exact dedup alone keeps both) but identical after the scrub tier,
      so the composed pipeline collapses them to doc 1;
    * docs 3/4: doc 4 contains doc 3 verbatim plus a 22-word suffix —
      below the 0.8 near-dup threshold (both survive the LSH tier), but
      the span tier removes the shared run, leaving doc 3 EMPTY; the
      composition drops it even though no single tier "drops" it.
    """
    def stops(tag):
        # en marker/stopword hits interleaved with per-doc fillers so no
        # 5-gram span is shared across docs by accident; fillers are
        # 4-char so the Gopher mean-word-length >= 3 bound holds despite
        # the 2-char stopwords
        return (f"the {tag}001 and {tag}002 of {tag}003 to {tag}004 is "
                f"{tag}005 in {tag}006")

    def fill(tag, lo, hi):
        return " ".join(f"{tag}{i:03d}" for i in range(lo, hi))

    base_a = f"{stops('a')} {fill('a', 7, 45)}"          # 50 words
    doc1 = f"{base_a} alice@example.com"                  # 51 words
    doc2 = f"{base_a} bob@test.org"                       # scrub-identical
    doc3 = f"{stops('c')} {fill('c', 7, 45)}"            # 50 words
    doc4 = f"{doc3} {fill('d', 0, 22)}"                   # doc3 + suffix
    return spark.createDataFrame(
        [(1, doc1, "en"), (2, doc2, "en"), (3, doc3, "en"), (4, doc4, "en")],
        "doc_id long, text string, lang string",
    )


def test_corpus_pipeline_composition_effects(spark):
    from training_etl_demo_2_spark.operators import dedup
    from training_etl_demo_2_spark.plans.corpus_pipeline import (
        corpus_pipeline_e2e,
    )

    docs = _pipeline_corpus(spark)
    out = {r.doc_id: r for r in
           corpus_pipeline_e2e({"documents": docs}).collect()}
    # scrub-before-dedup: doc 2 collapses into doc 1 (exact dedup on the
    # RAW text keeps both — the composition is what drops it)
    raw_survivors = {r.doc_id for r in
                     dedup.drop_exact_duplicates(docs).collect()}
    assert {1, 2} <= raw_survivors
    assert 1 in out and 2 not in out
    # span-tier emptying: doc 3 survives every tier individually but is
    # ALL duplicated spans against doc 4 -> empty -> dropped; doc 4 keeps
    # exactly its 22-word suffix
    assert 3 not in out
    assert out[4].n_tokens == 22
    # doc 1's scrubbed text is untouched by the span tier (51 tokens)
    assert out[1].n_tokens == 51


def test_corpus_pipeline_matches_twin_on_planted_corpus(spark):
    """Engine vs composed DuckDB twin on the planted corpus — the twin
    is assembled from the per-tier oracle generators (_nest), so this
    pins the REBASING, not just the fixture path the CI sweep covers."""
    import duckdb

    from training_etl_demo_2_spark.plans.corpus_pipeline import (
        corpus_pipeline_e2e,
        corpus_pipeline_e2e_sql,
    )

    docs = _pipeline_corpus(spark)
    got = sorted(
        (r.doc_id, r.n_tokens, r.pack_id)
        for r in corpus_pipeline_e2e({"documents": docs}).collect()
    )
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = sorted(tuple(r) for r in
                  con.sql(corpus_pipeline_e2e_sql()).fetchall())
    assert got == want and len(got) == 2


# --- near_dup_source_matrix ---------------------------------------------------


def _near_dup_text(tag, suffix):
    # >= 0.8 jaccard needs a long shared base + tiny per-doc suffix
    base = " ".join(f"{tag}{i:02d}" for i in range(50))
    return f"{base} {suffix}"


def test_near_dup_source_matrix_cells(spark):
    from training_etl_demo_2_spark.operators import dedup

    docs = spark.createDataFrame(
        [
            (1, _near_dup_text("m", "one"), "en", "siteA"),
            (2, _near_dup_text("m", "two"), "en", "siteB"),   # cross-source
            (3, _near_dup_text("q", "one"), "en", "siteA"),
            (4, _near_dup_text("q", "two"), "en", "siteA"),   # within-source
            (5, "totally unrelated tiny document here", "en", "siteC"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    out = {(r.source_a, r.source_b): (r.n_pairs, r.n_docs)
           for r in dedup.near_dup_source_matrix({"documents": docs}).collect()}
    assert out == {("siteA", "siteB"): (1, 2), ("siteA", "siteA"): (1, 2)}


# --- split_leakage_audit ------------------------------------------------------


def test_split_leakage_audit_flags_cross_split_pairs(spark):
    from training_etl_demo_2_spark.operators import curation

    # find doc ids landing in different splits under the REAL hash rule
    probe = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    )
    split_of = {r.doc_id: r.split
                for r in curation.dataset_split(probe).collect()}
    train_ids = [i for i, s in split_of.items() if s == "train"]
    test_ids = [i for i, s in split_of.items() if s == "test"]
    a, b = train_ids[0], test_ids[0]     # cross-split near-dup pair
    c, d = train_ids[1], train_ids[2]    # within-train pair
    docs = spark.createDataFrame(
        [
            (a, _near_dup_text("m", "one"), "en", "s"),
            (b, _near_dup_text("m", "two"), "en", "s"),
            (c, _near_dup_text("q", "one"), "en", "s"),
            (d, _near_dup_text("q", "two"), "en", "s"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    out = {(r.split_a, r.split_b): (r.n_pairs, r.is_leak)
           for r in curation.split_leakage_audit({"documents": docs}).collect()}
    assert out[("test", "train")] == (1, True)
    assert out[("train", "train")] == (1, False)


# --- packing_efficiency_curve -------------------------------------------------


def test_packing_efficiency_curve_exact_small_case(spark):
    import duckdb

    from training_etl_demo_2_spark.operators import curation

    # all ids = 0 mod PACK_GROUPS -> ONE deterministic greedy sequence;
    # 5 docs of 100 tokens each
    g = curation.PACK_GROUPS
    docs = spark.createDataFrame(
        [(i * g, " ".join(f"w{j}" for j in range(100))) for i in range(5)],
        "doc_id long, text string",
    )
    out = {r.budget: r for r in
           curation.packing_efficiency_curve(docs).collect()}
    # budget 128: 1 doc/pack -> 5 packs, waste 28 each, fill 7812 bp
    assert (out[128].n_packs, out[128].waste_tokens, out[128].fill_bp) == (
        5, 140, (5 * 128 - 140) * 10000 // (5 * 128))
    # budget 256: 2+2+1 -> 3 packs, waste 56+56+156
    assert (out[256].n_packs, out[256].waste_tokens) == (3, 268)
    # budget 512: 5 docs fit one pack (500 <= 512)
    assert (out[512].n_packs, out[512].waste_tokens, out[512].n_oversized) \
        == (1, 12, 0)
    assert all(r.total_tokens == 500 and r.n_docs == 5
               for r in out.values())
    # twin agrees on the same corpus
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = {r[0]: r for r in
            con.sql(curation.packing_efficiency_curve_sql()).fetchall()}
    for b, r in out.items():
        assert tuple(r) == tuple(want[b])


def test_packing_oversized_doc_gets_own_pack(spark):
    from training_etl_demo_2_spark.operators import curation

    g = curation.PACK_GROUPS
    docs = spark.createDataFrame(
        [(0, " ".join(f"w{j}" for j in range(300))),
         (g, " ".join(f"v{j}" for j in range(50)))],
        "doc_id long, text string",
    )
    out = {r.budget: r for r in
           curation.packing_efficiency_curve(docs).collect()}
    assert out[128].n_oversized == 1          # the 300-token doc
    assert out[512].n_oversized == 0


# --- token_loop_stats ---------------------------------------------------------


def test_token_loop_stats_planted(spark):
    import duckdb

    from training_etl_demo_2_spark.operators import text as t

    docs = spark.createDataFrame(
        [
            (1, "a a a a b"),              # run 4, trigram 'a a a' x2
            (2, "x y x y x y x y"),        # run 1, trigram 'x y x' x3
            (3, "z z z z z z"),            # run 6 -> loopy
            (4, "solo"),                   # 1 token, no trigram
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in t.token_loop_stats(docs).collect()}
    assert (out[1].max_token_run, out[1].max_trigram_count,
            out[1].is_loopy) == (4, 2, False)
    assert (out[2].max_token_run, out[2].max_trigram_count) == (1, 3)
    assert (out[3].max_token_run, out[3].is_loopy) == (6, True)
    assert (out[4].n_tokens, out[4].max_token_run,
            out[4].max_trigram_count) == (1, 1, 0)
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = {r[0]: r for r in con.sql(t.token_loop_stats_sql()).fetchall()}
    for i, r in out.items():
        assert tuple(r) == tuple(want[i])


# --- span_corruption_stats ------------------------------------------------------


def test_span_corruption_stats_deterministic_and_twin_exact(spark):
    import duckdb

    from training_etl_demo_2_spark.operators import curation

    docs = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(5 + (i * 7) % 40)))
         for i in range(1, 40)],
        "doc_id long, text string",
    )
    out = sorted(tuple(r) for r in
                 curation.span_corruption_stats(docs).collect())
    # layout is a pure function of (doc_id, block): physical layout must
    # not matter
    out2 = sorted(
        tuple(r)
        for r in curation.span_corruption_stats(docs.repartition(7)).collect()
    )
    assert out == out2
    # structural invariants: masked tokens bounded by full blocks; span
    # count bounded by masked blocks
    for (_i, n, m, s, bp) in out:
        assert 0 <= m <= n and s >= (1 if m else 0)
        assert bp == m * 10000 // n
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = sorted(tuple(r) for r in
                  con.sql(curation.span_corruption_stats_sql()).fetchall())
    assert out == want


def test_span_corruption_rate_near_target(spark, tables):
    """On the fixture corpus the empirical mask rate sits near the 15%
    design point — the mix hash really does produce i.i.d.-looking
    block decisions (a striped/linear hash would drift or band)."""
    from pyspark.sql import functions as F

    from training_etl_demo_2_spark.operators import curation

    row = (
        curation.span_corruption_stats(tables["documents"])
        .agg(
            F.sum("n_masked").alias("m"),
            F.sum("n_tokens").alias("n"),
        )
        .collect()[0]
    )
    rate = row.m / row.n
    assert 0.11 < rate < 0.19, rate


# --- centroid_pair_cosine -------------------------------------------------------


def test_centroid_pair_cosine_planted(spark):
    from training_etl_demo_2_spark.operators import similarity

    def vec(x, y):
        v = [0.0] * 64
        v[0], v[1] = x, y
        return v

    # label 0 along +x, label 1 along +y (orthogonal), label 2 = label 0
    # direction (confusable twin)
    emb = spark.createDataFrame(
        [(1, vec(1.0, 0.0), 0), (2, vec(2.0, 0.0), 0),
         (3, vec(0.0, 1.0), 1), (4, vec(0.0, 3.0), 1),
         (5, vec(5.0, 0.0), 2)],
        "vec_id long, embedding array<float>, label int",
    )
    out = {(r.label_a, r.label_b): r.cosine
           for r in similarity.centroid_pair_cosine(
               {"embeddings": emb}).collect()}
    assert out[(0, 1)] == 0.0
    assert out[(0, 2)] == 1.0
    assert out[(1, 2)] == 0.0


# --- semdedup_threshold_curve ---------------------------------------------------


def test_semdedup_threshold_curve_monotone_and_exact(spark, tables):
    from training_etl_demo_2_spark.operators import similarity

    rows = similarity.semdedup_threshold_curve(
        {"embeddings": tables["embeddings"]}).collect()
    taus = [r.tau for r in rows]
    assert taus == sorted(taus)
    # raising tau can only shrink both counts
    for a, b in zip(rows, rows[1:]):
        assert a.n_pairs >= b.n_pairs and a.n_docs >= b.n_docs
    # every doc counted at tau participates in >= 1 pair at tau
    assert all(r.n_docs <= 2 * r.n_pairs for r in rows if r.n_pairs)


# --- mixture_epochs_plan --------------------------------------------------------


def test_mixture_epochs_plan_small_source_hits_cap(spark):
    import duckdb

    from training_etl_demo_2_spark.operators import curation

    # big: 9 docs x 100 tokens; tiny: 1 doc x 10 tokens. alpha=0.7
    # upweights tiny enough that a 2x budget asks it for > 4 epochs.
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(100)), "big")
         for i in range(9)]
        + [(99, " ".join(f"t{j}" for j in range(10)), "tiny")],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in
           curation.mixture_epochs_plan(docs).collect()}
    assert out["tiny"].over_cap and not out["big"].over_cap
    assert out["tiny"].granted_tokens == 10 * 4  # capped at 4.0 epochs
    assert out["tiny"].requested_tokens > out["tiny"].granted_tokens
    # invariants: grants never exceed requests; epochs math exact
    for r in out.values():
        assert r.granted_tokens <= r.requested_tokens
        assert r.epochs_micro == r.requested_tokens * 10**6 // r.n_tokens
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = {r[0]: tuple(r) for r in
            con.sql(curation.mixture_epochs_plan_sql()).fetchall()}
    for s, r in out.items():
        assert tuple(r) == want[s]


# --- cluster_chain_audit / dedup_cluster_size_hist ------------------------------


def test_cluster_chain_audit_path_cluster(spark):
    """A-B-C chain: A~B and B~C verified, A-C only by transitivity.
    One 3-doc cluster, 2 direct pairs, 3 possible, 1 chained
    (chain_bp = 3333)."""
    from training_etl_demo_2_spark.operators import dedup

    base = [f"w{i:02d}" for i in range(60)]
    a = " ".join(base[:50])                       # docs 0..49
    b = " ".join(base[5:55])                      # overlap 45/55 with both
    c = " ".join(base[10:60])
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    # pick a threshold where adjacent pairs pass but the ends don't
    pairs = {(r.doc_a, r.doc_b)
             for r in dedup.minhash_lsh_pairs(docs, threshold=0.7).collect()}
    assert pairs == {(1, 2), (2, 3)}
    out = dedup.cluster_chain_audit(
        {"documents": docs}, threshold=0.7).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_docs, r.direct_pairs, r.possible_pairs,
            r.chained_pairs, r.chain_bp) == (3, 2, 3, 1, 3333)
    hist = dedup.dedup_cluster_size_hist(
        {"documents": docs}, threshold=0.7).collect()
    assert [(h.cluster_size, h.n_clusters, h.n_docs) for h in hist] \
        == [(3, 1, 3)]


def test_gopher_rule_overlap_matrix_planted(spark):
    """Doc A fails word-count AND stopwords (too short, no stopwords);
    doc B fails stopwords only; doc C passes everything. The
    (ok_stopwords, ok_word_count) cell must show both=1 with marginals
    2 and 1."""
    from training_etl_demo_2_spark.operators import text as t

    good = ("the data and the rest of it to go is here in full " +
            " ".join(f"fill{i:02d}" for i in range(40)))
    docs = spark.createDataFrame(
        [
            (1, "tiny doc without markers"),                      # A
            (2, " ".join(f"blob{i:02d}" for i in range(60))),     # B
            (3, good),                                            # C
        ],
        "doc_id long, text string",
    )
    out = {(r.rule_a, r.rule_b): r for r in
           t.gopher_rule_overlap_matrix(docs).collect()}
    cell = out[("ok_word_count", "ok_stopwords")]  # declared rule order
    assert (cell.n_fail_a, cell.n_fail_b, cell.n_fail_both) == (1, 2, 1)
    assert len(out) == 10


# --- decontaminate_spans --------------------------------------------------------


def test_decontaminate_spans_cuts_probe_overlap_only(spark):
    """Probe doc 1 contains phrase P; train doc 10 embeds P verbatim
    between its own prefix/suffix -> exactly P's span is cut, the rest
    survives; train doc 11 shares nothing -> untouched. Matches the
    twin on the same corpus."""
    import duckdb

    from training_etl_demo_2_spark.operators import dedup

    phrase = " ".join(f"p{i:02d}" for i in range(8))        # 8 tokens
    pre = " ".join(f"a{i:02d}" for i in range(6))
    suf = " ".join(f"z{i:02d}" for i in range(6))
    rows = [
        (1, f"probe prefix {phrase} probe suffix"),          # probe doc
        (10, f"{pre} {phrase} {suf}"),                       # contaminated
        (11, " ".join(f"q{i:02d}" for i in range(20))),      # clean
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           dedup.decontaminate_spans({"documents": docs}).collect()}
    assert set(out) == {10, 11}                              # probe excluded
    assert out[11].n_removed == 0
    assert out[10].n_removed == 8
    assert out[10].clean_text == f"{pre} {suf}"
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = {r[0]: tuple(r) for r in
            con.sql(dedup.decontaminate_spans_sql()).fetchall()}
    for i, r in out.items():
        assert tuple(r) == want[i]


# --- shard_skew_report ----------------------------------------------------------


def test_shard_skew_report_conserves_totals(spark):
    import duckdb

    from training_etl_demo_2_spark.operators import curation

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(40 + i % 30)))
         for i in range(60)],
        "doc_id long, text string",
    )
    out = curation.shard_skew_report(docs).collect()
    total_tokens = sum(40 + i % 30 for i in range(60))
    assert sum(r.n_docs for r in out) == 60
    assert sum(r.n_tokens for r in out) == total_tokens
    assert all(0 <= r.shard < curation.SHARD_COUNT for r in out)
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = sorted(tuple(r) for r in
                  con.sql(curation.shard_skew_report_sql()).fetchall())
    assert sorted(tuple(r) for r in out) == want
