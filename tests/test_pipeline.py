"""clean_corpus composition: quality filter + keep-first dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from training_etl_demo_2_spark.operators import dedup, pipeline, text


def test_clean_corpus_subset_and_dedup(tables):
    out = pipeline.clean_corpus(tables, min_quality=0.85)
    rows = out.collect()
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids))
    # every survivor passes the quality bar
    q = {
        r.doc_id: r.quality_score
        for r in text.text_quality(tables["documents"]).collect()
    }
    assert all(q[i] >= 0.85 for i in ids)
    # survivors contain no exact duplicates among themselves
    survivors = tables["documents"].join(
        out.select("doc_id"), "doc_id", "semi"
    )
    fps = dedup.exact_dedup_groups(survivors).collect()
    assert all(r.n_copies == 1 for r in fps)


def test_clean_corpus_keeps_min_doc_id(tables):
    """The representative of each dup group is its smallest doc_id."""
    out = {r.doc_id for r in pipeline.clean_corpus(tables, min_quality=0.0).collect()}
    groups = dedup.exact_dedup_groups(tables["documents"]).collect()
    for g in groups:
        assert g.keep_id in out


def test_corpus_report_metrics_consistent(tables):
    """The data card's metrics must agree with the individual operators
    they summarize (dup rate vs exact dedup, token totals vs tf)."""
    from pyspark.sql import functions as F

    from training_etl_demo_2_spark.operators.dedup import exact_dedup_groups
    from training_etl_demo_2_spark.operators.pipeline import corpus_report

    docs = tables["documents"]
    m = {r.metric: r.value for r in corpus_report(tables).collect()}
    n_docs = docs.count()
    assert m["n_docs"] == float(n_docs)
    assert m["distinct_content"] == float(exact_dedup_groups(docs).count())
    assert abs(m["dup_rate"] - (1 - m["distinct_content"] / n_docs)) < 1e-9
    assert 0 <= m["pct_en"] <= 1
    assert m["mean_doc_tokens"] > 0


def test_clean_corpus_observed_metrics(tables):
    """df.observe(): pipeline observability without a second pass —
    the cleaning plan reports its own survivor count and quality mass
    as accumulator-backed metrics on the SAME job that produces the
    output (at 100 TB a separate metrics query would re-scan the
    corpus)."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from training_etl_demo_2_spark.operators.pipeline import clean_corpus

    obs = Observation("clean_metrics")
    cleaned = clean_corpus(tables).observe(
        obs,
        F.count(F.lit(1)).alias("n_survivors"),
        F.sum("n_chars").alias("total_chars"),
    )
    n = cleaned.count()  # one job: output + metrics together
    assert obs.get["n_survivors"] == n
    assert obs.get["total_chars"] > 0
