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


def test_workflow_timeout_kills_hung_job(spark):
    """W1 timeout is enforced DURING the run (reference: Glue kills the
    job at 60 min, demo2a-stack.ts:119), not checked after it returns."""
    import time as _time

    def hung(s, a):
        _time.sleep(30)
        return "never"

    t0 = _time.monotonic()
    runs = Workflow("t", [Job("hung", hung, timeout_s=1.0), Job("b", lambda s, a: 1)]).run(spark)
    elapsed = _time.monotonic() - t0
    assert runs[0].state == "TIMEOUT"
    assert "exceeded" in runs[0].error
    assert elapsed < 10  # did not wait for the 30s sleep
    assert runs[1].state == "SKIPPED"  # W4: downstream gated on success


def test_workflow_timeout_bounds_retries(spark):
    """A job that keeps failing stops retrying once the deadline passes."""
    import time as _time

    calls = {"n": 0}

    def slow_fail(s, a):
        calls["n"] += 1
        _time.sleep(0.6)
        raise RuntimeError("always")

    runs = Workflow(
        "t", [Job("sf", slow_fail, max_retries=50, timeout_s=1.0)]
    ).run(spark)
    # deadline mid-attempt -> TIMEOUT; between attempts -> FAILED
    assert runs[0].state in ("TIMEOUT", "FAILED")
    assert calls["n"] < 5  # deadline cut the retry loop, not max_retries


def test_anomaly_hook_notifies_and_stays_silent(spark):
    """reqdef.yaml:11,15 — anomaly detection notifies (SNS analog) on
    trigger and stays silent otherwise; hook only sees SUCCEEDED jobs."""
    from training_etl_demo_2_spark.plans.workflow import AnomalyHook

    notes = []

    def notifier(msg, result):
        notes.append((msg, result))

    def job_ok(s, a):
        return {"error_rows": 0}

    def job_bad(s, a):
        return {"error_rows": 7}

    hook = AnomalyHook(
        predicate=lambda res: res["error_rows"] > 0, notifier=notifier
    )
    runs = Workflow(
        "wf", [Job("clean", job_ok), Job("dirty", job_bad)], anomaly_hook=hook
    ).run(spark)
    assert [r.state for r in runs] == ["SUCCEEDED", "SUCCEEDED"]
    assert [r.anomaly for r in runs] == [False, True]
    assert len(notes) == 1
    assert "dirty" in notes[0][0] and notes[0][1] == {"error_rows": 7}


def test_anomaly_hook_job_scoping(spark):
    """jobs= restricts the hook; anomalies in unlisted jobs are ignored."""
    from training_etl_demo_2_spark.plans.workflow import AnomalyHook

    notes = []
    hook = AnomalyHook(
        predicate=lambda res: True,
        notifier=lambda m, r: notes.append(m),
        jobs={"watched"},
    )
    runs = Workflow(
        "wf",
        [Job("unwatched", lambda s, a: 1), Job("watched", lambda s, a: 2)],
        anomaly_hook=hook,
    ).run(spark)
    assert len(notes) == 1 and "watched" in notes[0]
    assert [r.anomaly for r in runs] == [False, True]


def test_prune_runs_keeps_newest(spark, tables, tmp_path):
    from training_etl_demo_2_spark.io import latest_run, prune_runs, write_run

    root = str(tmp_path / "runs")
    for i in range(5):
        write_run(tables["region"], root, run_id=f"2024010{i}_000000")
    removed = prune_runs(root, keep_n=2)
    assert removed == ["20240100_000000", "20240101_000000", "20240102_000000"]  # ascending
    assert latest_run(root).run_id == "20240104_000000"
    # idempotent
    assert prune_runs(root, keep_n=2) == []


def test_corpus_release_workflow(spark, tables, tmp_path):
    """End-to-end training-data release through the Workflow layer:
    clean → split → release stats, each stage persisted as a run
    directory with a metadata sidecar and discovered by the next stage
    via latest_run — the reference's job-A→job-B lineage pattern
    (timestamped run dir + metadata.json, demo-etl-2a-notebook.py:63-82
    / process_tsv.py:33-55) applied to the north-star curation DAG."""
    from training_etl_demo_2_spark.io import latest_run, write_run
    from training_etl_demo_2_spark.operators import curation, pipeline
    from training_etl_demo_2_spark.plans.workflow import (
        AnomalyHook,
        Job,
        Workflow,
    )

    root = tmp_path / "release"
    notifications = []

    def clean_job(spark, args):
        cleaned = pipeline.clean_corpus(tables)
        return write_run(
            cleaned, str(root / "clean"), extra_metadata={"stage": "clean"}
        )

    def split_job(spark, args):
        src = latest_run(str(root / "clean"))
        assert src is not None and src.metadata["stage"] == "clean"
        docs = spark.read.parquet(src.data_path)
        split = curation.dataset_split(docs).join(docs, "doc_id")
        return write_run(
            split,
            str(root / "split"),
            input_files=[src.data_path],
            extra_metadata={"stage": "split", "upstream_run": src.run_id},
        )

    def stats_job(spark, args):
        src = latest_run(str(root / "split"))
        return (
            spark.read.parquet(src.data_path)
            .groupBy("split")
            .count()
            .collect()
        )

    wf = Workflow(
        "corpus-release",
        [
            Job("clean", clean_job),
            Job("split", split_job),
            Job("stats", stats_job),
        ],
        anomaly_hook=AnomalyHook(
            predicate=lambda res: isinstance(res, list)
            and (len(res) < 3 or any(r["count"] == 0 for r in res)),
            notifier=lambda msg, res: notifications.append(msg),
            jobs={"stats"},
        ),
    )
    runs = wf.run(spark)
    assert [r.state for r in runs] == ["SUCCEEDED"] * 3, [
        (r.state, r.error) for r in runs
    ]
    # lineage: the split run records its upstream clean run id
    split_run = latest_run(str(root / "split"))
    assert split_run.metadata["upstream_run"] == latest_run(
        str(root / "clean")
    ).run_id
    # all three splits populated at sf0.001 -> no anomaly notification
    counts = {r["split"]: r["count"] for r in runs[2].result}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == pipeline.clean_corpus(tables).count()
    assert not notifications and not runs[2].anomaly
