"""Planted tests for the round-7 session-6 additions: normalization
sensitivity, chunk-boundary overlap, and the CMS accuracy audit."""

from __future__ import annotations

import duckdb

from training_etl_demo_2_spark.operators import curation, dedup, similarity, sketches
from training_etl_demo_2_spark.operators import text as text_ops


def _duck(rows, sql, schema="doc_id BIGINT, text VARCHAR"):
    con = duckdb.connect()
    con.execute(f"CREATE TABLE documents ({schema})")
    con.executemany(
        f"INSERT INTO documents VALUES ({', '.join('?' * len(rows[0]))})", rows
    )
    return con.sql(sql).fetchall()


# --- normalization_dup_gain --------------------------------------------------

# One planted duplicate per tier: 0/1 collapse at casefold, 2 joins at
# whitespace, 3 at strip_punct, 4 at token_sort; 5 stays unique.
NORM_ROWS = [
    (0, "Hello World"),
    (1, "hello world"),
    (2, "  hello   world "),
    (3, "hello, world!"),
    (4, "world hello"),
    (5, "something else entirely"),
]


def test_normalization_dup_gain_planted(spark):
    df = spark.createDataFrame(NORM_ROWS, "doc_id long, text string")
    got = [tuple(r) for r in dedup.normalization_dup_gain(df).collect()]
    # (tier_id, tier, n_groups, n_dup_docs, gain_docs)
    assert got == [
        (0, "raw", 6, 0, 0),
        (1, "casefold", 5, 1, 1),
        (2, "whitespace", 4, 2, 1),
        (3, "strip_punct", 3, 3, 1),
        (4, "token_sort", 2, 4, 1),
    ]


def test_normalization_dup_gain_matches_twin(spark):
    df = spark.createDataFrame(NORM_ROWS, "doc_id long, text string")
    got = sorted(tuple(r) for r in dedup.normalization_dup_gain(df).collect())
    want = sorted(
        tuple(r) for r in _duck(NORM_ROWS, dedup.normalization_dup_gain_sql())
    )
    assert got == want


def test_normalization_dup_mass_is_monotone(tables):
    out = dedup.normalization_dup_gain(tables["documents"]).collect()
    dups = [r.n_dup_docs for r in sorted(out, key=lambda r: r.tier_id)]
    assert dups == sorted(dups)  # cumulative tiers can only find more
    assert all(r.gain_docs >= 0 for r in out)


# --- chunk_overlap_pairs -----------------------------------------------------


def test_chunk_overlap_directional_pair(spark):
    rows = [
        (1, "a b c x y z"),       # ends with x y z
        (2, "x y z d e f"),       # starts with x y z -> 2 continues 1
        (3, "p q r s t u"),       # unrelated
        (4, "m n m n m n"),       # own suffix "m n m" != prefix "m n m"? it IS
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.doc_a, r.doc_b, r.overlap_chars)
        for r in dedup.chunk_overlap_pairs(df).collect()
    )
    # (1 -> 2) is the only cross-doc boundary; doc 4's self-overlap
    # ("m n m" both ends) is excluded by doc_a != doc_b; no reverse pair.
    assert got == [(1, 2, 5)]
    want = sorted(tuple(r) for r in _duck(rows, dedup.chunk_overlap_pairs_sql()))
    assert got == want


def test_chunk_overlap_short_docs_dropped(spark):
    df = spark.createDataFrame(
        [(1, "x y"), (2, "x y z a b")], "doc_id long, text string"
    )
    assert dedup.chunk_overlap_pairs(df).count() == 0


# --- cms_error_audit ---------------------------------------------------------


def test_cms_error_audit_no_collisions_at_full_width(tables):
    """Fixture vocabulary (~31 words) vs W=1024: every estimate exact."""
    out = sketches.cms_error_audit(tables["documents"]).collect()
    assert out, "audit must produce buckets"
    assert all(r.n_exact == r.n_words for r in out)
    assert all(r.sum_overest == 0 and r.max_overest == 0 for r in out)


def test_cms_error_audit_narrow_width_forces_overestimates(spark):
    """W=2 with >2 distinct words MUST collide in every row; CMS never
    underestimates, so overestimate mass appears and stays >= 0."""
    rows = [(0, "aa bb cc dd aa bb cc dd ee ff gg hh")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sketches.cms_error_audit(df, width=2).collect()
    assert sum(r.sum_overest for r in out) > 0
    assert all(r.max_overest >= 0 for r in out)
    want = sorted(tuple(r) for r in _duck(rows, sketches.cms_error_audit_sql(width=2)))
    got = sorted(tuple(r) for r in out)
    assert got == want


# --- ngram_novelty_curve -----------------------------------------------------


def test_ngram_novelty_planted(spark):
    """Two buckets: doc 0 introduces its grams, doc 1 repeats doc 0
    verbatim (zero novelty), doc 2's content overlaps partially."""
    rows = [
        (0, "a b c d"),            # grams: abc, bcd  (new: 2)
        (1, "a b c d"),            # same grams, nothing new
        (2, "b c d e"),            # grams: bcd, cde  (new: 1)
        (3, "a b c d e"),          # grams: abc,bcd,cde — nothing new
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.bucket: (r.n_occ, r.n_distinct, r.n_new, r.novelty_bp, r.cum_new)
        for r in text_ops.ngram_novelty_curve(df, n=3, n_buckets=2).collect()
    }
    # bucket 0 = docs 0..1, bucket 1 = docs 2..3
    assert out[0] == (4, 2, 2, 10000, 2)
    assert out[1] == (5, 3, 1, 3333, 3)
    want = {
        r[0]: tuple(r[1:])
        for r in _duck(rows, text_ops.ngram_novelty_curve_sql(n=3, n_buckets=2))
    }
    assert out == want


def test_ngram_novelty_cum_matches_totals(tables):
    out = text_ops.ngram_novelty_curve(tables["documents"]).collect()
    assert [r.n_new <= r.n_distinct for r in out] == [True] * len(out)
    last = max(out, key=lambda r: r.bucket)
    assert last.cum_new == sum(r.n_new for r in out)


# --- pii_source_report -------------------------------------------------------


def test_pii_source_report_planted(spark):
    rows = [
        (0, "contact bob@example.com or +1 (555) 123-4567 now", "x", "s1"),
        (1, "server at 10.0.0.1 and 192.168.1.1 up", "x", "s1"),
        (2, "nothing sensitive here", "x", "s2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    got = {
        (r.source, r.kind): (r.n_docs, r.n_docs_matched, r.n_matches, r.docs_bp)
        for r in text_ops.pii_source_report(df).collect()
    }
    assert got[("s1", "email")] == (2, 1, 1, 5000)
    assert got[("s1", "phone")] == (2, 1, 1, 5000)
    assert got[("s1", "ipv4")] == (2, 1, 2, 5000)
    assert got[("s2", "email")] == (1, 0, 0, 0)  # zero cells present
    want = {
        (r[0], r[1]): tuple(r[2:])
        for r in _duck(
            rows,
            text_ops.pii_source_report_sql(),
            schema="doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR",
        )
    }
    assert got == want


# --- lexical_semantic_agreement ----------------------------------------------


def test_lexical_semantic_agreement_planted(spark):
    """Docs 1-2 are lexical near-dups; embeddings make (1,2) also a
    semantic pair and (3,4) a semantic-only pair — jaccard = 1/2."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta iota"),
            (3, "completely different words go here tonight folks"),
            (4, "unrelated content fills this document body text"),
        ],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [1.0, 0.1, 0.0, 0.0]),
            (3, [0.0, 0.0, 1.0, 0.0]),
            (4, [0.0, 0.0, 1.0, 0.1]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = similarity.lexical_semantic_agreement(
        {"documents": docs, "embeddings": emb}, lex_threshold=0.5
    ).collect()[0]
    assert (out.n_lex, out.n_sem, out.n_both) == (1, 2, 1)
    assert out.union_pairs == 2 and out.jaccard_bp == 5000


# --- shard_mixing_audit --------------------------------------------------


def test_shard_mixing_totals_and_dominance(tables):
    out = curation.shard_mixing_audit(tables["documents"]).collect()
    docs = tables["documents"].count()
    assert sum(r.n_docs for r in out) == docs  # every doc lands once
    for r in out:
        assert 1 <= r.n_sources
        assert r.top_docs * 10000 // r.n_docs == r.top_share_bp
        assert r.top_share_bp >= 10000 // r.n_sources  # max >= mean


def test_shard_mixing_pure_shard_alarm(spark):
    """A source-pure corpus must audit as 100% dominant everywhere."""
    rows = [(i, f"w{i} " * 30, "en", "only_src", 30) for i in range(40)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = curation.shard_mixing_audit(df).collect()
    assert all(r.top_share_bp == 10000 and r.top_source == "only_src" for r in out)


# --- ivf_cell_balance ----------------------------------------------------


def test_ivf_cell_balance_conservation(tables):
    from training_etl_demo_2_spark.operators.similarity import (
        IVF_MULTI_ASSIGN,
    )

    out = similarity.ivf_cell_balance(tables).collect()
    n_vecs = tables["embeddings"].count()
    assert sum(r.n_vecs for r in out) == n_vecs * IVF_MULTI_ASSIGN
    assert all(0 < r.share_bp <= 10000 or r.n_vecs * 10000 < sum(
        x.n_vecs for x in out) for r in out)
    assert len(out) <= 16


# --- stream_funnel_two_sided ----------------------------------------------


def test_full_outer_boundary_emission(spark, tmp_path):
    """Pins the two-sided emission rules at the watermark boundary
    W = min(max click ts, max purchase ts) − 2h:

    * a purchase exactly AT W emits (purchase_ts <= W — a matching
      click must strictly precede it, so state expires at W);
    * a purchase 1 s past W is withheld;
    * an unmatched click needs click_ts + gap < W (none qualifies
      here, so no null-purchase rows at all).
    """
    import datetime as dt
    import os

    from pyspark.sql import functions as F

    from training_etl_demo_2_spark.streaming.fixture_queries import (
        _replay_partitions,
    )
    from training_etl_demo_2_spark.streaming.stateful import (
        correlate_streams_full_outer,
    )

    t0 = dt.datetime(2025, 1, 1)

    def ts(h, s=0):
        return t0 + dt.timedelta(hours=h, seconds=s)

    # max click = 10h, max purchase = 12h  ->  W = 10h - 2h = 8h
    rows = [
        (1, ts(10), 100, "click", 0.0, ""),
        (2, ts(12), 101, "purchase", 1.0, ""),  # > W: withheld
        (3, ts(8), 200, "purchase", 1.0, ""),   # == W: emits
        (4, ts(8, -1), 201, "purchase", 1.0, ""),  # < W: emits
        (5, ts(8, 1), 202, "purchase", 1.0, ""),   # > W: withheld
    ]
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    df = spark.createDataFrame(rows, schema)
    src_dir = os.path.join(str(tmp_path), "ev")
    df.repartition(1).write.parquet(src_dir)
    src = spark.readStream.schema(df.schema).parquet(src_dir)
    joined = correlate_streams_full_outer(
        src.filter(F.col("event_type") == "click"),
        src.filter(F.col("event_type") == "purchase"),
        max_gap="1 hour",
    )
    with _replay_partitions(spark):
        q = (
            joined.select("user_id", "click_id", "purchase_id")
            .writeStream.format("memory")
            .queryName("t_fo_edge")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(120.0)
        finally:
            q.stop()
    got = sorted(tuple(r) for r in spark.table("t_fo_edge").collect())
    assert got == [(200, None, 3), (201, None, 4)]


def test_two_sided_funnel_matches_one_sided_tiers(spark, sf_dir):
    """The full outer's matched set equals the left outer's; its
    null-purchase rows equal the left outer's; and it ADDS null-click
    rows (the organic purchases) that the left tier cannot emit."""
    from training_etl_demo_2_spark.streaming import fixture_queries

    full = fixture_queries.stream_funnel_two_sided(spark, sf_dir).collect()
    left = fixture_queries.stream_click_funnel_loss(spark, sf_dir).collect()
    f_matched = {(r.click_id, r.purchase_id) for r in full if r.matched == 1}
    l_matched = {
        (r.click_id, r.purchase_id) for r in left if r.purchase_id is not None
    }
    assert f_matched == l_matched
    f_orphan_clicks = {
        r.click_id for r in full if r.purchase_id is None
    }
    l_orphan_clicks = {r.click_id for r in left if r.purchase_id is None}
    assert f_orphan_clicks == l_orphan_clicks
    organic = [r for r in full if r.click_id is None]
    assert organic  # the two-sided capability actually fires
    assert all(r.matched == 0 for r in organic)


# --- pack_boundary_audit --------------------------------------------------


def test_pack_boundary_counts(spark):
    """4 same-size docs, budget fits 2 per pack, alternating sources:
    every within-pack boundary is cross-source; langs all match."""
    rows = [
        (0, "a b c d", "en", "s1", 7),
        (4, "e f g h", "en", "s2", 7),   # same group (doc_id % 8 = 4)? no —
        (8, "i j k l", "en", "s1", 7),   # groups differ; use one group:
        (16, "m n o p", "en", "s2", 7),
    ]
    # put all docs in ONE pack group (doc_id % PACK_GROUPS equal) so the
    # greedy packs them sequentially: budget 8 -> packs (0,4+?),.. use
    # doc_ids 0,8,16,24 (all % 8 == 0).
    rows = [
        (0, "a b c d", "en", "s1", 7),
        (8, "e f g h", "en", "s2", 7),
        (16, "i j k l", "en", "s1", 7),
        (24, "m n o p", "en", "s2", 7),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = curation.pack_boundary_audit(df, budget=8).collect()[0]
    # two packs of two docs -> 2 boundaries, both cross-source, same lang
    assert (
        out.n_boundaries,
        out.cross_source,
        out.cross_lang,
        out.cross_source_bp,
        out.cross_lang_bp,
    ) == (2, 2, 0, 10000, 0)


def test_pack_boundary_conservation(tables):
    from training_etl_demo_2_spark.operators.curation import pack_sequences

    out = curation.pack_boundary_audit(tables["documents"]).collect()[0]
    packs = pack_sequences(tables["documents"])
    n_docs = packs.count()
    n_packs = packs.select("pack_id").distinct().count()
    assert out.n_boundaries == n_docs - n_packs
    assert 0 <= out.cross_source <= out.n_boundaries


# --- quantization_error_curve ----------------------------------------------


def test_quantization_error_monotone_in_bits(tables):
    out = {
        r.bits: r for r in similarity.quantization_error_curve(tables).collect()
    }
    assert sorted(out) == [4, 6, 8]
    # more bits -> closer to the original vector, never worse
    assert out[4].mean_cos_micro <= out[6].mean_cos_micro <= out[8].mean_cos_micro
    assert out[8].mean_cos_micro > 995000  # int8 is near-lossless
    for r in out.values():
        assert r.min_cos_micro <= r.mean_cos_micro
        assert r.n_vecs == tables["embeddings"].count()


def test_quantization_zero_vector_safe(spark):
    emb = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0, 0.0]), (1, [1.0, 2.0, -3.0, 0.5])],
        "vec_id long, embedding array<float>",
    )
    out = similarity.quantization_error_curve({"embeddings": emb}).collect()
    # the zero vector's cosine is NULL (0/0) and is filtered, not crashed
    assert all(r.n_vecs == 1 for r in out)


# --- ingestion_drift_curve --------------------------------------------------


def test_ingestion_drift_planted(spark):
    """Bucket 0 (docs 0-1): long docs, one exact dup; bucket 1 (docs
    2-3): short stopword-heavy docs, no dups."""
    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "ALPHA  beta gamma delta epsilon zeta"),  # normalized dup of 0
        (2, "the of the"),
        (3, "a to in"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.bucket: (r.n_docs, r.sum_tokens, r.mean_tokens, r.stop_bp, r.dup_bp)
        for r in text_ops.ingestion_drift_curve(df, n_buckets=2).collect()
    }
    # bucket 0: 2 docs, 6+7 ws tokens (double space -> empty token), 0 stop
    assert out[0] == (2, 13, 6, 0, 5000)
    assert out[1] == (2, 6, 3, 10000, 0)
    want = {
        r[0]: tuple(r[1:])
        for r in _duck(rows, text_ops.ingestion_drift_curve_sql(n_buckets=2))
    }
    assert out == want


def test_ingestion_drift_totals(tables):
    out = text_ops.ingestion_drift_curve(tables["documents"]).collect()
    docs = tables["documents"]
    assert sum(r.n_docs for r in out) == docs.count()
    assert all(0 <= r.stop_bp <= 10000 and 0 <= r.dup_bp < 10000 for r in out)
