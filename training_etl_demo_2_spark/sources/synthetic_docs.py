"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API): a
deterministic synthetic-document generator with partition-parallel
reads and doc_id filter pushdown.

Why it exists: the engine's other sources (csv/tsv/parquet/jsonl) ride
on built-in readers; this is the template for the sources a training
pipeline actually has to hand-roll — internal record services, vector
stores, annotation queues — showing the three things such a connector
must get right at 100 TB:

* **partition-parallel reads** — `partitions()` splits the id range
  into fixed-size slices; each `read()` call touches only its slice,
  so a 1000-executor cluster fans the scan out with no coordination.
* **filter pushdown** — `pushFilters()` absorbs doc_id range/equality
  predicates into the planned id range, so `WHERE doc_id < 1000`
  never generates, serializes, or ships the other 999M rows. (Handled
  filters are removed from Spark's post-scan re-check; everything else
  is returned and evaluated by Spark normally.)
* **determinism** — content is a pure function of doc_id (no RNG
  state), so retried/speculative tasks produce identical rows — the
  property every idempotent-rerun guarantee downstream relies on.

Usage::

    spark.dataSource.register(SyntheticDocsDataSource)
    spark.read.format("synthetic_docs").option("n_docs", 1000).load()
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)
_VOCAB = (
    "the data spark join stream table row group sort merge filter key "
    "batch window hash scan value query fast slow big small line part"
).split()
_LANGS = ["en", "de", "fr", "es", "zh"]


def _doc_row(doc_id: int) -> tuple:
    n_words = 20 + (doc_id * 7) % 30
    words = [
        _VOCAB[(doc_id * 31 + j * 17) % len(_VOCAB)] for j in range(n_words)
    ]
    text = " ".join(words)
    return (
        doc_id,
        text,
        _LANGS[doc_id % len(_LANGS)],
        f"src{doc_id % 5}",
        len(text),
    )


@dataclass
class _IdSlice(InputPartition):
    start: int
    end: int


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 1000))
        self.rows_per_partition = int(options.get("rows_per_partition", 250))
        self.lo = 0  # inclusive planned id range, narrowed by pushdown
        self.hi = self.n_docs  # exclusive

    def pushFilters(self, filters):
        for f in filters:
            col = getattr(f, "attribute", None)
            if col == ("doc_id",) or col == "doc_id":
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, int(f.value))
                    self.hi = min(self.hi, int(f.value) + 1)
                    continue
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, int(f.value) + 1)
                    continue
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, int(f.value))
                    continue
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, int(f.value))
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, int(f.value) + 1)
                    continue
            yield f  # unsupported: Spark re-applies it post-scan

    def partitions(self):
        step = self.rows_per_partition
        lo, hi = self.lo, max(self.lo, self.hi)
        return [
            _IdSlice(s, min(s + step, hi)) for s in range(lo, hi, step)
        ] or [_IdSlice(0, 0)]

    def read(self, partition: _IdSlice):
        for doc_id in range(partition.start, partition.end):
            yield _doc_row(doc_id)


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema: StructType) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> "SyntheticDocsStreamReader":
        return SyntheticDocsStreamReader(self.options)


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the connector template: a resumable
    micro-batch feed over the same deterministic id space.

    The offset is ``{"next_id": n}`` — the connector contract in
    miniature: `initialOffset` anchors a new query, `read(start)`
    advances by at most ``batch_rows`` ids and returns the planned end
    offset, and `readBetweenOffsets(start, end)` regenerates EXACTLY
    the rows of a committed-but-lost batch during recovery (possible
    only because rows are a pure function of id — the same determinism
    the batch reader guarantees). ``n_docs`` bounds the feed so
    ``availableNow`` replays terminate.
    """

    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 1000))
        self.batch_rows = int(options.get("batch_rows", 100))

    def initialOffset(self) -> dict:
        return {"next_id": 0}

    def read(self, start: dict):
        lo = int(start["next_id"])
        hi = min(lo + self.batch_rows, self.n_docs)
        return (iter([_doc_row(i) for i in range(lo, hi)]), {"next_id": hi})

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [_doc_row(i) for i in range(int(start["next_id"]), int(end["next_id"]))]
        )
