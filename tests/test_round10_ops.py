"""Planted-value tests for the round-10 operators: intra-document
paragraph dedup (MassiveText repetition removal)."""

from __future__ import annotations


def test_paragraph_dedup_planted(spark):
    """Hand-computed keep-first removal at seg_words=3."""
    from training_etl_demo_2_spark.operators.dedup import paragraph_dedup

    df = spark.createDataFrame(
        [
            # segments: "a b c" | "a b c" | "d e f" -> pos-1 dup dropped
            (1, "a b c a b c d e f"),
            # one short segment, nothing repeated
            (2, "x y"),
            # trailing partial segment; "p q r" repeats at pos 2
            (3, "p q r s t u p q r"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in paragraph_dedup(df).collect()}
    assert set(out) == {1, 2, 3}  # every input doc is reported

    assert out[1].clean_text == "a b c d e f"
    assert out[1].n_paras == 3 and out[1].n_dup_paras == 1
    assert out[1].dup_para_share_bp == 3333  # floor(10000/3)
    assert out[1].dup_char_share_bp == 3333  # 5 of 15 chars

    assert out[2].clean_text == "x y"
    assert out[2].n_paras == 1 and out[2].n_dup_paras == 0
    assert out[2].dup_para_share_bp == 0
    assert out[2].dup_char_share_bp == 0

    assert out[3].clean_text == "p q r s t u"
    assert out[3].n_paras == 3 and out[3].n_dup_paras == 1


def test_paragraph_dedup_order_preserved_and_idempotent(spark):
    """Survivors keep original order; re-running on cleaned text is a
    fixed point (no further dups at the same grain)."""
    from training_etl_demo_2_spark.operators.dedup import paragraph_dedup

    df = spark.createDataFrame(
        [(1, "z z z a a a z z z b b b a a a")],
        "doc_id long, text string",
    )
    first = paragraph_dedup(df).collect()[0]
    assert first.clean_text == "z z z a a a b b b"
    again = paragraph_dedup(
        spark.createDataFrame(
            [(1, first.clean_text)], "doc_id long, text string"
        )
    ).collect()[0]
    assert again.clean_text == first.clean_text
    assert again.n_dup_paras == 0
