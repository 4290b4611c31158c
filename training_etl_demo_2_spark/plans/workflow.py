"""Job/Workflow orchestration — the reference's Glue workflow layer
(SURVEY §2.11, W1-W6) as plain Python over one shared SparkSession.

Reference mapping:
* W1 Job definition (name, script, args, maxRetries=2, timeout=60min)
  — ``/root/reference/infra/lib/demo2a-stack.ts:104-144`` → ``Job``.
* W2 Workflow container — ``demo2a-stack.ts:147-150`` → ``Workflow``.
* W3 ON_DEMAND trigger — ``demo2a-stack.ts:153-160`` → ``Workflow.run``.
* W4 CONDITIONAL trigger (B iff A SUCCEEDED) — ``demo2a-stack.ts:163-180``
  → sequential execution, downstream jobs run only while the workflow
  state is all-SUCCEEDED; retry loop honors ``max_retries``.
* W5 job params — ``demo2a-stack.ts:115,136-137`` → ``Job.args`` dict.
* W6 job commit — ``demo-etl-2a-notebook.py:90`` → a run-manifest entry
  appended on success.

Unlike Glue (one cluster per job), all jobs share the caller's
SparkSession — at scale this is simply a driver program; the DAG of
Spark stages inside each job is where the distribution happens.
"""

from __future__ import annotations

import threading
import time
import traceback
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession

JobFn = Callable[[SparkSession, dict[str, Any]], Any]


@dataclass
class Job:
    """W1: a named unit of work with args, retries and a timeout."""

    name: str
    fn: JobFn
    args: dict[str, Any] = field(default_factory=dict)
    max_retries: int = 2  # reference default, demo2a-stack.ts:118
    timeout_s: float = 3600.0  # reference: 60 min, demo2a-stack.ts:119


@dataclass
class JobRun:
    job_name: str
    state: str  # SUCCEEDED | FAILED | TIMEOUT | SKIPPED
    attempts: int
    elapsed_s: float
    result: Any = None
    error: str | None = None
    anomaly: bool = False  # set by the workflow's anomaly hook


@dataclass
class AnomalyHook:
    """Post-job anomaly detection + notification (reqdef.yaml:11,15:
    Step Functions detects anomalies, notifies via SNS, saves to S3).

    ``predicate`` inspects a SUCCEEDED job's result (typically a
    DataFrame — aggregate it down before deciding; never collect a big
    relation just to test it) and returns True on anomaly; ``notifier``
    is the SNS-analog callable invoked with a human-readable message
    and the offending result. Persisting the result (the S3-save leg)
    belongs in the notifier — ``io.write_run`` is the natural fit.
    ``jobs`` restricts the hook to specific job names (None = all).
    """

    predicate: Callable[[Any], bool]
    notifier: Callable[[str, Any], None]
    jobs: set[str] | None = None


class Workflow:
    """W2-W4: ordered jobs; each runs iff all previous SUCCEEDED."""

    def __init__(
        self,
        name: str,
        jobs: list[Job],
        anomaly_hook: AnomalyHook | None = None,
    ):
        self.name = name
        self.jobs = jobs
        self.anomaly_hook = anomaly_hook

    def run(self, spark: SparkSession) -> list[JobRun]:
        runs: list[JobRun] = []
        healthy = True
        for job in self.jobs:
            if not healthy:  # W4: conditional trigger not satisfied
                runs.append(JobRun(job.name, "SKIPPED", 0, 0.0))
                continue
            run = self._run_job(spark, job)
            self._apply_anomaly_hook(job, run)
            runs.append(run)
            healthy = run.state == "SUCCEEDED"
        return runs

    def _apply_anomaly_hook(self, job: Job, run: JobRun) -> None:
        hook = self.anomaly_hook
        if (
            hook is None
            or run.state != "SUCCEEDED"
            or (hook.jobs is not None and job.name not in hook.jobs)
        ):
            return
        if hook.predicate(run.result):
            run.anomaly = True
            hook.notifier(
                f"workflow {self.name}: anomaly detected in job {job.name}",
                run.result,
            )

    def _run_job(self, spark: SparkSession, job: Job) -> JobRun:
        """Run ``job.fn`` under a REAL wall-clock timeout.

        The fn runs in a daemon worker thread; on deadline we cancel its
        Spark job group (``interruptOnCancel``) so cluster resources are
        reclaimed — the reference's 60-min Glue timeout kills the job,
        not just flags it (demo2a-stack.ts:119). PySpark pins Python
        threads to JVM threads (PYSPARK_PIN_THREAD default), so the job
        group set in the worker thread scopes exactly this job's stages.
        """
        start = time.monotonic()
        deadline = start + job.timeout_s
        last_err = None
        for attempt in range(1, job.max_retries + 2):  # initial + retries
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            group = f"{self.name}.{job.name}.{attempt}"
            outcome: dict[str, Any] = {}

            def target(group_id: str = group, out: dict[str, Any] = outcome) -> None:
                try:
                    spark.sparkContext.setJobGroup(
                        group_id,
                        f"workflow {self.name} job {job.name}",
                        interruptOnCancel=True,
                    )
                    out["result"] = job.fn(spark, job.args)
                except BaseException:
                    out["error"] = traceback.format_exc()

            worker = threading.Thread(
                target=target, name=group, daemon=True
            )
            worker.start()
            worker.join(remaining)
            if worker.is_alive():
                # Hung past the deadline: kill its Spark stages; the
                # (daemon) thread is abandoned.
                try:
                    spark.sparkContext.cancelJobGroup(group)
                except Exception:
                    pass
                return JobRun(
                    job.name, "TIMEOUT", attempt,
                    time.monotonic() - start,
                    error=f"exceeded {job.timeout_s}s",
                )
            if "error" not in outcome:
                return JobRun(
                    job.name, "SUCCEEDED", attempt,
                    time.monotonic() - start, result=outcome.get("result"),
                )
            last_err = outcome["error"]
        return JobRun(
            job.name,
            "TIMEOUT" if last_err is None else "FAILED",
            job.max_retries + 1,
            time.monotonic() - start,
            error=last_err or f"exceeded {job.timeout_s}s",
        )
