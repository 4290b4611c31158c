"""Word-frequency pipeline — the reference's flagship query.

Re-expresses ``/root/reference/infra/scripts/demo-etl-2a-notebook.py:53-59``
(``select(explode(split(review_body, " "))) → groupBy("word").count() →
orderBy desc``) over the ``documents.text`` column.

Physical shape (verified via ``.explain("formatted")``):
  parquet scan (only ``text`` read — column pruning reaches the scan)
  → generate(explode)           narrow, pipelined in whole-stage codegen
  → partial HashAggregate       map-side combine kills the Zipf skew early
  → shuffle on word
  → final HashAggregate
  → TakeOrderedAndProject       (for top-k: no global sort materialized)

At 100 TB: the partial aggregate reduces shuffle volume to ~|vocab| per
task; AQE coalesces the post-shuffle side. Stopword-heavy keys are fine
because count partials commute; no salting needed for an algebraic agg.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import explode_words


def word_counts(df: DataFrame, text_col: str = "text", sep: str = " ") -> DataFrame:
    """Token frequency: explode(split(text)) → groupBy.count → sort.

    Like the reference, keeps empty tokens from consecutive separators
    (``demo-etl-2a-notebook.py:53`` splits on a literal single space).
    Ordered (count desc, word asc) — the word tie-break makes top-k
    deterministic, unlike the reference's bare ``orderBy("count")``.
    """
    return (
        df.select(explode_words(text_col, sep).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
    )


def top_k_words(df: DataFrame, k: int = 10, text_col: str = "text") -> DataFrame:
    """Top-k display (reference shows 10: ``demo-etl-2a-notebook.py:59``).
    sort+limit fuses into TakeOrderedAndProject — no global sort."""
    return word_counts(df, text_col).limit(k)


def word_counts_salted(
    df: DataFrame, text_col: str = "text", sep: str = " ", salt_buckets: int = 16
) -> DataFrame:
    """Skew-resistant word frequency: identical result to ``word_counts``
    via two-stage salted aggregation.

    Stage 1 groups on (word, salt) where salt = crc32(word·position-ish
    noise) % buckets — here a deterministic hash of the row's token
    index surrogate via monotonically_increasing_id is overkill, so we
    salt on a hash of the partition-local row: spark_partition_id. Each
    hot key's partials land on ``salt_buckets`` different reducers;
    stage 2 merges the (word, salt) partials on word alone, whose
    cardinality is |vocab × buckets| — tiny.

    For an ALGEBRAIC aggregate like count, map-side partial aggregation
    already handles Zipfian skew, so this exists as the template for
    the non-algebraic cases (collect_list / exact distinct per key /
    large-state UDAFs) where map-side combine can't help and AQE's skew
    handling doesn't apply to aggregations.
    """
    salted = df.select(explode_words(text_col, sep).alias("word")).withColumn(
        "salt", F.pmod(F.crc32(F.concat(F.col("word"), F.spark_partition_id())), F.lit(salt_buckets))
    )
    partial = salted.groupBy("word", "salt").agg(F.count(F.lit(1)).alias("c"))
    return (
        partial.groupBy("word")
        .agg(F.sum("c").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
    )
