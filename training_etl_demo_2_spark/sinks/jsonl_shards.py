"""Custom Python DataSourceWriter: transactional JSONL shard export.

The write half of the connector template (`sources/synthetic_docs.py`
is the read half): each task streams its partition into a UNIQUELY
NAMED staging shard (task-attempt-safe — retried/speculative attempts
write different files), returns a commit message with the shard path
and row count, and the DRIVER commit publishes a `manifest.json`
naming exactly the committed shards. Readers trust only the manifest,
so a failed/duplicated task attempt can never surface rows — the
standard two-phase output-commit protocol, implemented in ~60 lines.

Why JSONL shards: the interchange format training stacks ingest
(HuggingFace datasets, WebDataset-adjacent tooling); the writer bounds
rows per shard so downstream loaders get uniform work units.

At 100 TB the same protocol applies with an object store: staging
keys, a manifest PUT as the atomic commit point, and abort() deleting
orphaned staging keys.

Usage::

    spark.dataSource.register(JsonlShardDataSource)
    df.write.format("jsonl_shards").option("path", out).mode("append").save()
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


@dataclass
class _ShardCommit(WriterCommitMessage):
    shards: list  # [(staging_path, n_rows)], possibly several per task
    n_rows: int


class JsonlShardWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_shards requires option 'path'")
        self.max_rows = int(options.get("max_rows_per_shard", 10000))

    def write(self, iterator) -> _ShardCommit:
        """One task = one partition; rotates to a new staging shard
        every ``max_rows_per_shard`` rows so downstream loaders get
        uniform work units."""
        os.makedirs(os.path.join(self.path, "_staging"), exist_ok=True)
        shards: list = []
        fh, n_in_shard, shard = None, 0, None
        try:
            for row in iterator:
                if fh is None or n_in_shard >= self.max_rows:
                    if fh is not None:
                        fh.close()
                        shards.append((shard, n_in_shard))
                    shard = os.path.join(
                        self.path, "_staging", f"{uuid.uuid4().hex}.jsonl"
                    )
                    fh = open(shard, "w", encoding="utf-8")
                    n_in_shard = 0
                fh.write(json.dumps(row.asDict(), default=str) + "\n")
                n_in_shard += 1
        finally:
            if fh is not None:
                fh.close()
                shards.append((shard, n_in_shard))
        return _ShardCommit(shards=shards, n_rows=sum(n for _, n in shards))

    def commit(self, messages) -> None:
        """Driver-side atomic publish: staging shards are renamed into
        place and the manifest names exactly the committed set."""
        shards = []
        total = 0
        i = 0
        for m in messages:
            if m is None:
                continue
            for staging, n in m.shards:
                final = os.path.join(self.path, f"shard-{i:05d}.jsonl")
                os.replace(staging, final)
                shards.append(
                    {"file": os.path.basename(final), "n_rows": n}
                )
                total += n
                i += 1
        with open(os.path.join(self.path, "manifest.json"), "w") as fh:
            json.dump({"shards": shards, "n_rows": total}, fh, indent=2)

    def abort(self, messages) -> None:
        for m in messages:
            if m is None:
                continue
            for staging, _ in m.shards:
                if os.path.exists(staging):
                    os.remove(staging)


class JsonlShardDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_shards"

    def writer(self, schema: StructType, overwrite: bool) -> JsonlShardWriter:
        return JsonlShardWriter(self.options)
