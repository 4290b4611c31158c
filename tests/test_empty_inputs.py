"""Empty-input robustness: every doc/embedding operator must return an
empty (or well-defined) result on zero rows — not crash. Empty
partitions are routine at scale (filters, skew, small tails)."""

from __future__ import annotations

import pytest

from training_etl_demo_2_spark.operators import (
    dedup,
    multimodal,
    similarity,
    text,
    wordcount,
)

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], DOC_SCHEMA)


@pytest.fixture(scope="module")
def empty_emb(spark):
    return spark.createDataFrame([], EMB_SCHEMA)


def test_text_ops_empty(empty_docs):
    assert text.language_id(empty_docs).count() == 0
    assert text.text_quality(empty_docs).count() == 0
    assert text.token_stats(empty_docs).count() == 0
    assert text.doc_fingerprints(empty_docs).count() == 0
    assert text.ngram_counts(empty_docs).count() == 0


def test_wordcount_empty(empty_docs):
    assert wordcount.word_counts(empty_docs).count() == 0
    assert wordcount.word_counts_salted(empty_docs).count() == 0


def test_dedup_empty(empty_docs):
    assert dedup.exact_dedup_groups(empty_docs).count() == 0
    assert dedup.ngram_jaccard_pairs(empty_docs).count() == 0
    assert dedup.minhash_lsh_pairs(empty_docs).count() == 0
    assert dedup.simhash_fingerprints(empty_docs).count() == 0
    assert dedup.simhash_near_pairs(empty_docs).count() == 0


def test_similarity_empty(empty_emb):
    assert similarity.brute_topk(empty_emb).count() == 0
    assert similarity.brute_topk_pandas(empty_emb).count() == 0
    assert similarity.lsh_topk(empty_emb).count() == 0
    assert similarity.cosine_near_pairs(empty_emb).count() == 0
    assert similarity.ivf_topk(empty_emb).count() == 0


def test_multimodal_empty(empty_docs):
    media = multimodal.attach_fake_payload(empty_docs)
    assert multimodal.extract_features(media).count() == 0
    assert multimodal.resize_images(media).count() == 0
    assert multimodal.sample_frames(media).count() == 0
    assert multimodal.audio_features(media).count() == 0
