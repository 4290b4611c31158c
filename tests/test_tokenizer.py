"""BPE tokenizer invariants: deterministic merges, lossless encoding,
compression over plain characters, and distributed==local agreement."""

from __future__ import annotations

from training_etl_demo_2_spark.operators import tokenizer
from training_etl_demo_2_spark.operators.tokenizer import (
    END_OF_WORD,
    _encode_word,
    train_bpe,
)


def test_train_bpe_deterministic(tables):
    docs = tables["documents"]
    m1 = train_bpe(docs, n_merges=15)
    m2 = train_bpe(docs, n_merges=15)
    assert m1 == m2
    assert len(m1) == 15


def test_encode_word_is_lossless_and_merges_compress():
    merges = [("t", "h"), ("th", "e"), ("the", END_OF_WORD)]
    ranks = {p: i for i, p in enumerate(merges)}
    toks = _encode_word("the", ranks)
    assert toks == ["the</w>"]
    # an unseen word falls back to characters + terminator, losslessly
    toks = _encode_word("xyz", ranks)
    assert toks == ["x", "y", "z", END_OF_WORD]
    assert "".join(toks) == "xyz" + END_OF_WORD


def test_bpe_token_counts_mass_conservation(tables):
    """Total encoded symbol mass equals what a local re-encode of every
    word occurrence produces, and learned merges strictly compress the
    corpus below the raw character count."""
    docs = tables["documents"]
    merges = train_bpe(docs, n_merges=20)
    ranks = {p: i for i, p in enumerate(merges)}
    out = tokenizer.bpe_token_counts(docs, merges=merges).collect()
    spark_total = sum(r.cnt for r in out)

    local_total = 0
    char_total = 0
    for r in docs.select("text").collect():
        for w in r.text.lower().split(" "):
            if not w:
                continue
            local_total += len(_encode_word(w, ranks))
            char_total += len(w) + 1  # chars + terminator
    assert spark_total == local_total
    assert spark_total < char_total  # merges actually compressed
    # every emitted token is non-empty and reconstructible
    assert all(r.token for r in out)


def test_train_bpe_min_count_floor_bounds_collect(spark):
    """min_count drops sub-floor words BEFORE the driver collect:
    training with the floor equals training on a corpus with those
    words removed — the floor is a vocabulary filter, not a new
    algorithm."""
    common = ["banana banana banana", "bandana bandana", "banana bandana"]
    rare = ["zzyzzxq"]  # singleton: below the floor
    full = spark.createDataFrame(
        [(i, t) for i, t in enumerate(common + rare)], "doc_id long, text string"
    )
    pruned = spark.createDataFrame(
        [(i, t) for i, t in enumerate(common)], "doc_id long, text string"
    )
    floored = train_bpe(full, n_merges=10, min_count=2)
    manual = train_bpe(pruned, n_merges=10, min_count=1)
    assert floored == manual
    # and the floor actually removed the singleton from the word table
    from training_etl_demo_2_spark.operators.tokenizer import _word_counts

    words = dict(_word_counts(full, "text", min_count=2))
    assert "zzyzzxq" not in words and words["banana"] == 4


def test_floored_row_shrinks_collect_and_matches_oracle(spark, tmp_path):
    """The production-profile floor (bpe_token_counts_floored's
    min_count=2) on a corpus where the floor BITES (the shipped fixture
    vocabulary has no singletons — min word count 26 — so the shrink
    must be shown on a constructed corpus): (a) the trainer collect is
    strictly smaller, (b) the floored Spark result equals the floored
    DuckDB twin, i.e. train-on-floored / encode-everything agree
    cross-engine including the words the trainer never saw."""
    import duckdb

    from training_etl_demo_2_spark.operators import oracle_text
    from training_etl_demo_2_spark.operators.tokenizer import _word_counts

    docs = spark.createDataFrame(
        [
            (0, "banana banana bandana"),
            (1, "banana bandana"),
            (2, "qxkrw banana"),  # qxkrw: singleton, floored out
        ],
        "doc_id long, text string",
    )
    assert len(_word_counts(docs, "text", min_count=2)) < len(
        _word_counts(docs, "text", min_count=1)
    )

    got = {
        (r.token, r.cnt)
        for r in tokenizer.bpe_token_counts(
            docs, n_merges=10, min_count=2
        ).collect()
    }
    # singleton word still tokenizes (via merges + leftover chars)
    assert sum(c for t, c in got) > 0
    pq = str(tmp_path / "docs.parquet")
    docs.toPandas().to_parquet(pq)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}')"
    )
    want = {
        (t, int(c))
        for t, c in con.execute(
            oracle_text.bpe_token_counts_sql(n_merges=10, min_count=2)
        ).fetchall()
    }
    assert got == want


def test_fertility_mass_identities(spark, tables):
    """Fertility invariants: n_tokens summed over languages equals the
    total BPE token mass from bpe_token_counts; fertility >= 1 (a word
    never encodes to zero tokens) and chars/token <= chars/word."""
    from pyspark.sql import functions as F

    docs = tables["documents"]
    merges = train_bpe(docs, n_merges=30)
    fert = tokenizer.bpe_fertility_by_lang(docs, merges=merges).collect()
    total_tokens = sum(r.n_tokens for r in fert)
    mass = (
        tokenizer.bpe_token_counts(docs, merges=merges)
        .agg(F.sum("cnt"))
        .collect()[0][0]
    )
    assert total_tokens == mass
    for r in fert:
        assert r.fertility_r6 >= 1.0
        assert r.n_chars / r.n_tokens <= r.n_chars / r.n_words + 1e-9


def test_fertility_underserved_language_fragments(spark):
    """A language whose words the merges never saw fragments into
    near-character tokens: higher fertility than the trained-on
    language."""
    rows = [(i, "aaaa bbbb aaaa bbbb", "en") for i in range(20)]
    rows += [(100 + i, "qxzw vkjy", "xx") for i in range(2)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {
        r.lang: r.fertility_r6
        for r in tokenizer.bpe_fertility_by_lang(df, n_merges=10).collect()
    }
    assert out["xx"] > out["en"]
