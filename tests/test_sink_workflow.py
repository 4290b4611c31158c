"""Sink batching edge cases (mirrors process_tsv.py:92,108 semantics:
<batch, exactly batch, 0 items) + workflow retry/conditional-trigger
behavior + the packaged two-job reference pipeline end-to-end."""

from __future__ import annotations

import pytest

from training_etl_demo_2_spark.plans.reference_pipeline import build_reference_workflow
from training_etl_demo_2_spark.plans.workflow import Job, Workflow
from training_etl_demo_2_spark.sinks.keyvalue import write_keyvalue

# collects batches written by executors; works on local mode via a
# temp-dir spool (executor == same machine here, but the code path is
# the real foreachPartition one)
import json
import os
import tempfile


def _spool_factory(spool_dir):
    def factory():
        def put_batch(items):
            fd, path = tempfile.mkstemp(dir=spool_dir, suffix=".json")
            with os.fdopen(fd, "w") as f:
                json.dump([{k: str(v) for k, v in it.items()} for it in items], f)

        return put_batch

    return factory


def _batches(spool_dir):
    out = []
    for name in os.listdir(spool_dir):
        with open(os.path.join(spool_dir, name)) as f:
            out.append(json.load(f))
    return out


@pytest.mark.parametrize("n_rows,batch_size", [(7, 25), (25, 25), (0, 25), (60, 25)])
def test_sink_batching(spark, tmp_path, n_rows, batch_size):
    spool = tmp_path / "spool"
    spool.mkdir()
    df = spark.range(n_rows).withColumnRenamed("id", "k")
    write_keyvalue(
        df, _spool_factory(str(spool)), batch_size=batch_size, num_partitions=2
    )
    batches = _batches(str(spool))
    assert sum(len(b) for b in batches) == n_rows
    assert all(len(b) <= batch_size for b in batches)


def test_workflow_conditional_skip(spark):
    def ok(s, a):
        return 1

    def boom(s, a):
        raise RuntimeError("boom")

    wf = Workflow(
        "t", [Job("a", ok), Job("b", boom, max_retries=1), Job("c", ok)]
    )
    runs = wf.run(spark)
    assert [r.state for r in runs] == ["SUCCEEDED", "FAILED", "SKIPPED"]
    assert runs[1].attempts == 2  # initial + 1 retry


def test_workflow_retry_then_success(spark):
    calls = {"n": 0}

    def flaky(s, a):
        calls["n"] += 1
        if calls["n"] < 2:
            raise RuntimeError("transient")
        return "ok"

    runs = Workflow("t", [Job("flaky", flaky)]).run(spark)
    assert runs[0].state == "SUCCEEDED" and runs[0].attempts == 2


def test_reference_pipeline_end_to_end(spark, tmp_path, sf_dir):
    wf = build_reference_workflow(
        f"{sf_dir}/documents.parquet", str(tmp_path), text_col="text"
    )
    runs = wf.run(spark)
    assert [r.state for r in runs] == ["SUCCEEDED", "SUCCEEDED"], [
        (r.state, r.error) for r in runs
    ]
    sink = spark.read.parquet(str(tmp_path / "kv_table"))
    # item shape of process_tsv.py:81-87
    assert set(sink.columns) == {"id", "word", "count", "loaded_at", "analysis_metadata"}
    rows = {r.id: r for r in sink.collect()}
    assert all(rid.startswith("word_") for rid in rows)
    some = next(iter(rows.values()))
    assert some.analysis_metadata.get("run_id")
    # rerun job B: keyed overwrite is idempotent
    runs2 = wf.run(spark)
    assert [r.state for r in runs2] == ["SUCCEEDED", "SUCCEEDED"]
    assert spark.read.parquet(str(tmp_path / "kv_table")).count() == len(rows)
