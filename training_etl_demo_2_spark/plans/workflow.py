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


class Workflow:
    """W2-W4: ordered jobs; each runs iff all previous SUCCEEDED."""

    def __init__(self, name: str, jobs: list[Job]):
        self.name = name
        self.jobs = jobs

    def run(self, spark: SparkSession) -> list[JobRun]:
        runs: list[JobRun] = []
        healthy = True
        for job in self.jobs:
            if not healthy:  # W4: conditional trigger not satisfied
                runs.append(JobRun(job.name, "SKIPPED", 0, 0.0))
                continue
            runs.append(self._run_job(spark, job))
            healthy = runs[-1].state == "SUCCEEDED"
        return runs

    def _run_job(self, spark: SparkSession, job: Job) -> JobRun:
        start = time.monotonic()
        last_err = None
        for attempt in range(1, job.max_retries + 2):  # initial + retries
            try:
                result = job.fn(spark, job.args)
                elapsed = time.monotonic() - start
                if elapsed > job.timeout_s:
                    return JobRun(
                        job.name, "TIMEOUT", attempt, elapsed,
                        error=f"exceeded {job.timeout_s}s",
                    )
                return JobRun(job.name, "SUCCEEDED", attempt, elapsed, result=result)
            except Exception:
                last_err = traceback.format_exc()
                if time.monotonic() - start > job.timeout_s:
                    break
        return JobRun(
            job.name, "FAILED", job.max_retries + 1,
            time.monotonic() - start, error=last_err,
        )
