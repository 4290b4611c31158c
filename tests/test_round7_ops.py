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


def test_tfidf_cosine_verify_ships_no_maps(spark):
    """The round-6 verify shipped per-doc weight MAPS through the
    candidate join (measured 16.2x at R=10 — a spill constant). Pin
    the rewritten plan: no MapType anywhere, and the dot product is a
    partial-aggregated SUM (HashAggregate on the pair keys), mirroring
    the twin's posting-join dots CTE."""
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "eta theta iota kappa lambda"),
        ],
        "doc_id long, text string",
    )
    out = dedup.tfidf_cosine_pairs(df, threshold=0.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "map_from_entries" not in plan
    assert "array_intersect" not in plan
    got = {(r.doc_a, r.doc_b): r.cosine for r in out.collect()}
    assert got[(1, 2)] > got.get((1, 3), 0.0)


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
