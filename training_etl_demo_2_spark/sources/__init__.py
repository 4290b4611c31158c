"""Source connectors (SURVEY §2.1).

The reference reads exactly two formats — headered TSV via Glue's
DynamicFrame shim (``demo-etl-2a-notebook.py:25-35``) and parquet
(``process_tsv.py:62-64``). Those live in :mod:`..io` (with the
run-directory discovery that replaces the boto3 listing) and are
re-exported here; this package adds the formats a training-data
pipeline ingests beyond the reference: JSON-lines and a generic
format dispatcher. Streaming sources live in :mod:`..streaming`.

All readers take an EXPLICIT schema: schema inference is an extra
full pass over the data — unaffordable at 100 TB, and nondeterministic
under sampling. A reader without a schema falls back to all-string
(CSV) or engine inference (JSON) for exploration only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..io import (  # noqa: F401  (public re-exports)
    RunInfo,
    latest_run,
    load_tables,
    new_run_id,
    read_csv,
    read_parquet,
    read_tsv,
    register_views,
    write_parquet,
    write_run,
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    multiline: bool = False,
) -> DataFrame:
    """JSON-lines scan. One JSON object per line parallelizes by byte
    range like CSV; ``multiline=True`` (whole-file JSON documents) does
    NOT split — avoid it at scale."""
    reader = spark.read.option("multiLine", multiline)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


_FORMATS = {"parquet", "csv", "tsv", "json", "jsonl", "orc", "xml"}


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options,
) -> DataFrame:
    """Format-dispatching reader — the engine's single entry point for
    batch sources (what the reference's ``create_dynamic_frame
    .from_options(connection_type=..., format=...)`` was for Glue)."""
    fmt = fmt.lower()
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {sorted(_FORMATS)}")
    if fmt == "tsv":
        return read_csv(spark, path, schema=schema, sep="\t", **options)
    if fmt == "csv":
        return read_csv(spark, path, schema=schema, **options)
    if fmt in ("json", "jsonl"):
        return read_jsonl(spark, path, schema=schema, **options)
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.format(fmt).load(path)


def read_text_corpus(
    spark: SparkSession,
    path: str,
    whole_files: bool = False,
) -> DataFrame:
    """Raw text ingestion — the front door for filesystem corpora
    (.txt / .txt.gz dumps) before they become a ``documents`` table.

    Line mode (default) splits by byte range exactly like CSV: a 100 TB
    directory parallelizes to one task per ~128 MB split, each row one
    line. ``whole_files=True`` emits one row per FILE (doc-per-file
    corpora); whole-file reads cannot split, so pair it with many small
    files, never few huge ones. Gzipped inputs are decompressed
    transparently but are splittable in NEITHER mode — at scale,
    recompress to zstd-parquet on first touch (``io.write_parquet``)
    and do every downstream pass against that.

    Output columns: (path, doc_text) in whole-file mode, (doc_text) in
    line mode — stable names for downstream fingerprint/quality ops.
    """
    if whole_files:
        df = spark.read.text(path, wholetext=True)
        from pyspark.sql import functions as F

        return df.select(
            F.input_file_name().alias("path"),
            F.col("value").alias("doc_text"),
        )
    return spark.read.text(path).withColumnRenamed("value", "doc_text")


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
) -> DataFrame:
    """Raw-file ingestion for multimodal corpora: one row per file with
    (path, modificationTime, length, content BINARY) — the front door
    that turns an image/audio/video directory into the opaque-binary
    column layout the ``multimodal`` operators consume.

    Spark's built-in ``binaryFile`` source parallelizes per FILE (a
    file never splits), so it pairs with many small-to-medium objects;
    ``spark.sql.files.maxPartitionBytes`` packs small files per task.
    Filter with ``glob`` (e.g. ``*.png``) BEFORE the scan — it prunes
    the file listing, not rows. At 100 TB, ingest once into parquet
    with the blob as a binary column (``io.write_parquet``) and run
    every downstream pass on that: the parquet layout splits row
    groups, prunes metadata columns, and avoids re-listing object
    storage per query.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
