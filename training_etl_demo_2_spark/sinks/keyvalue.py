"""Batched key-value sink — portable re-expression of the reference's
DynamoDB loader (``/root/reference/infra/scripts/process_tsv.py:70-135``).

The reference's shape: ``df.repartition(10).foreachPartition(fn)`` where
``fn`` buffers rows and flushes 25-item batches to ``table.batch_writer``
(batch loop ``process_tsv.py:92-96``, remainder flush ``:108-113``).

Here the same executor-side pattern is kept, but the endpoint is
pluggable: any ``put_batch(items: list[dict])`` callable factory. Two
writers ship:

* ``parquet_kv_writer`` — a keyed parquet table (local stand-in for the
  key-value store; last-write-wins via overwrite of the key partition).
* user-supplied factory — e.g. a boto3 DynamoDB table in a real
  deployment; the factory runs ON THE EXECUTOR (one client per
  partition, never serialized from the driver).

Enrichment (``process_tsv.py:81-87``: ``id=f"word_{word}"``, int cast,
timestamp, metadata map) is done as DataFrame columns *before* the sink
— JVM-side, codegen'd — instead of per-row Python dict building.

Scale: ``repartition(n)`` bounds sink concurrency (respect the
endpoint's write-throughput ceiling, not the cluster's); batches bound
request size. At 100 TB the knobs are ``num_partitions`` (parallel
writers) × ``batch_size`` (items/request) — identical to the
reference's NUM_PARTITIONS=10 × 25.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PutBatch = Callable[[list[dict[str, Any]]], None]


def enrich_word_counts(df: DataFrame, metadata: dict[str, str]) -> DataFrame:
    """Job-B item shape as declarative columns (process_tsv.py:81-87):
    id='word_'||word, count as long, load timestamp, metadata map."""
    meta_kv: list = []
    for k, v in sorted(metadata.items()):
        meta_kv += [F.lit(k), F.lit(v)]
    return df.select(
        F.concat(F.lit("word_"), F.col("word")).alias("id"),
        F.col("word"),
        F.col("cnt").cast("long").alias("count"),
        F.current_timestamp().alias("loaded_at"),
        F.create_map(*meta_kv).alias("analysis_metadata") if meta_kv else F.create_map().alias("analysis_metadata"),
    )


def write_keyvalue(
    df: DataFrame,
    put_batch_factory: Callable[[], PutBatch],
    batch_size: int = 25,
    num_partitions: int = 10,
) -> None:
    """``repartition(n).foreachPartition`` batched writer.

    ``put_batch_factory`` is called once per partition on the executor to
    build the endpoint client; rows are flushed every ``batch_size`` and
    the remainder at the end (mirrors process_tsv.py:92-113).
    """

    def write_partition(rows: Iterator) -> None:
        put_batch = put_batch_factory()
        buf: list[dict[str, Any]] = []
        for row in rows:
            buf.append(row.asDict(recursive=True))
            if len(buf) >= batch_size:
                put_batch(buf)
                buf = []
        if buf:  # remainder flush
            put_batch(buf)

    df.repartition(num_partitions).foreachPartition(write_partition)


def write_keyed_parquet(df: DataFrame, path: str, key_col: str = "id") -> None:
    """Local keyed-table sink: idempotent upsert semantics via full
    overwrite keyed on ``key_col`` (the reference blindly re-puts items,
    which is also last-write-wins; see SURVEY §7 risk notes)."""
    df.dropDuplicates([key_col]).write.mode("overwrite").parquet(path)
