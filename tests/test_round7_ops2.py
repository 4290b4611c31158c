"""Planted tests for the round-7 session-6 additions: normalization
sensitivity, chunk-boundary overlap, and the CMS accuracy audit."""

from __future__ import annotations

import duckdb

from training_etl_demo_2_spark.operators import dedup, sketches


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
