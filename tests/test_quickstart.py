"""Keeps the README quickstart honest: the three documented examples
must run and produce the documented shapes (tools/quickstart_examples.py
is the runnable source of the README snippets)."""

from __future__ import annotations

from tools.quickstart_examples import (
    example_1_reference_workflow,
    example_2_near_dup_dedup,
    example_3_ann_with_ndcg,
)


def test_example_1_reference_workflow(spark, tmp_path):
    runs, kv = example_1_reference_workflow(spark, str(tmp_path))
    assert [r.state for r in runs] == ["SUCCEEDED", "SUCCEEDED"]
    assert {"id", "word", "count", "loaded_at", "analysis_metadata"} <= set(
        kv.columns
    )
    assert kv.count() > 0


def test_example_2_near_dup_clusters(spark):
    rows = {
        r.doc_id: r.cluster_id
        for r in example_2_near_dup_dedup(spark).collect()
    }
    # docs 0/1/3 cluster together; doc 2 is a singleton (not emitted)
    assert set(rows) == {0, 1, 3}
    assert len({rows[0], rows[1], rows[3]}) == 1


def test_example_3_ann_ndcg(spark):
    topk, grade = example_3_ann_with_ndcg(spark)
    assert {"query_id", "neighbor_id", "sim", "rnk"} <= set(topk.columns)
    g = grade.collect()
    assert g and all(0.0 <= r.ndcg_r6 <= 1.0 for r in g)
