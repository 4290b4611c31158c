"""The reference's two-job pipeline, packaged as a Workflow.

Job A (word-frequency ETL, demo-etl-2a-notebook.py): read a text source
→ split/explode → groupBy.count → orderBy → parquet under a timestamped
run directory with a metadata.json sidecar.

Job B (key-value load, process_tsv.py): discover the latest run, read
its parquet, enrich rows with id/count/timestamp/metadata, and write
them through the batched key-value sink.

The reference recomputed its whole plan per action (3 actions in job A
with no cache — SURVEY §3.1); here each job triggers exactly one action.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import SparkSession

from .. import io
from ..operators.wordcount import word_counts
from ..sinks.keyvalue import enrich_word_counts, write_keyed_parquet
from .workflow import Job, Workflow


def job_a_word_frequency(spark: SparkSession, args: dict[str, Any]) -> dict[str, Any]:
    """args: input_path (parquet with a text column | csv/tsv), text_col,
    output_root."""
    path = args["input_path"]
    if path.endswith(".csv") or path.endswith(".tsv"):
        sep = "\t" if path.endswith(".tsv") else ","
        df = io.read_csv(spark, path, sep=sep)
    else:
        df = spark.read.parquet(path)
    counts = word_counts(df, text_col=args.get("text_col", "text"))
    run = io.write_run(
        counts,
        args["output_root"],
        run_id=args.get("run_id"),
        input_files=[path],
    )
    return {"run_id": run.run_id, "data_path": run.data_path}


def job_b_keyvalue_load(spark: SparkSession, args: dict[str, Any]) -> dict[str, Any]:
    """args: output_root (job A's), sink_path."""
    run = io.latest_run(args["output_root"])
    if run is None:
        raise FileNotFoundError(f"no completed run under {args['output_root']}")
    counts = io.read_parquet(spark, run.data_path)
    items = enrich_word_counts(
        counts, {"run_id": run.run_id, "source": ",".join(run.metadata.get("input_files", []))}
    )
    write_keyed_parquet(items, args["sink_path"], key_col="id")
    n = spark.read.parquet(args["sink_path"]).count()
    return {"run_id": run.run_id, "items_written": n}


def build_reference_workflow(
    input_path: str, work_root: str, text_col: str = "text"
) -> Workflow:
    output_root = os.path.join(work_root, "analysis_results")
    sink_path = os.path.join(work_root, "kv_table")
    return Workflow(
        "demo-etl-2",
        [
            Job(
                "job-a-word-frequency",
                job_a_word_frequency,
                {"input_path": input_path, "text_col": text_col, "output_root": output_root},
            ),
            Job(
                "job-b-keyvalue-load",
                job_b_keyvalue_load,
                {"output_root": output_root, "sink_path": sink_path},
            ),
        ],
    )
