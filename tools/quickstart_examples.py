"""The three README quickstart examples, runnable end-to-end — kept as
a script so the README snippets can never silently rot: CI runs this
file (tests/test_quickstart.py) and asserts each example's documented
output shape.

Usage: python tools/quickstart_examples.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def example_1_reference_workflow(spark, work_dir: str):
    """The reference two-job pipeline: word-frequency ETL → parquet →
    batched key-value sink, with retries/conditional-trigger semantics."""
    from training_etl_demo_2_spark.plans.reference_pipeline import (
        build_reference_workflow,
    )

    wf = build_reference_workflow(
        input_path="/root/testdata/sf0.001/documents.parquet",
        work_root=work_dir,
    )
    runs = wf.run(spark)
    for r in runs:
        print(f"{r.job_name}: {r.state} (attempts={r.attempts})")
    kv = spark.read.parquet(os.path.join(work_dir, "kv_table"))
    kv.orderBy("id").show(3, truncate=False)
    return runs, kv


def example_2_near_dup_dedup(spark):
    """MinHash-LSH near-duplicate clustering on a toy corpus."""
    from training_etl_demo_2_spark.operators import dedup

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog tonight"),
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "a completely different document about spark internals"),
            (3, "the quick brown fox jumps over the lazy dog tonight"),
        ],
        "doc_id long, text string",
    )
    clusters = dedup.near_dup_clusters(docs, threshold=0.5)
    clusters.orderBy("doc_id").show()
    return clusters


def example_3_ann_with_ndcg(spark):
    """LSH ANN top-k over the embeddings fixture + NDCG@5 grade of the
    approximate ranking against the exact brute-force ranking."""
    from training_etl_demo_2_spark.io import load_tables
    from training_etl_demo_2_spark.operators import similarity

    t = load_tables(spark, "/root/testdata/sf0.001")
    topk = similarity.lsh_topk(t["embeddings"], k=5)
    topk.orderBy("query_id", "rnk").show(5)
    grade = similarity.ann_ndcg_eval(t, k=5)
    grade.orderBy("query_id").show(3)
    return topk, grade


def main() -> int:
    from training_etl_demo_2_spark.session import get_spark

    spark = get_spark(app_name="quickstart")
    with tempfile.TemporaryDirectory(prefix="quickstart_") as work:
        print("=== example 1: reference two-job workflow ===")
        example_1_reference_workflow(spark, work)
    print("=== example 2: near-dup dedup on a toy corpus ===")
    example_2_near_dup_dedup(spark)
    print("=== example 3: ANN top-k + NDCG grade ===")
    example_3_ann_with_ndcg(spark)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
