"""skew_join must be result-identical to the plain join, hot keys or not."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from training_etl_demo_2_spark.operators import skew


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def fact_dim(spark):
    # key 1 is massively hot; 2/3 cold; 99 has no dim row
    fact = spark.createDataFrame(
        [(1, i * 1.0) for i in range(500)]
        + [(2, 10.0), (3, 20.0), (99, 30.0)],
        "k long, v double",
    )
    dim = spark.createDataFrame(
        [(1, "hot"), (2, "a"), (3, "b"), (4, "unused")], "k long, name string"
    )
    return fact, dim


def test_inner_equivalence_with_explicit_hot_keys(spark, fact_dim):
    fact, dim = fact_dim
    plain = fact.join(dim, "k", "inner")
    salted = skew.skew_join(fact, dim, "k", "inner", buckets=4, hot_keys=[1])
    assert _rows(salted) == _rows(plain)
    assert salted.columns == plain.columns


def test_left_equivalence_keeps_unmatched(spark, fact_dim):
    fact, dim = fact_dim
    plain = fact.join(dim, "k", "left")
    salted = skew.skew_join(fact, dim, "k", "left", buckets=4, hot_keys=[1])
    assert _rows(salted) == _rows(plain)


def test_no_hot_keys_degenerates_to_plain_join(spark, fact_dim):
    fact, dim = fact_dim
    out = skew.skew_join(fact, dim, "k", hot_keys=[])
    assert _rows(out) == _rows(fact.join(dim, "k", "inner"))


def test_detect_hot_keys_finds_the_heavy_hitter(spark, fact_dim):
    fact, _ = fact_dim
    hot = skew.detect_hot_keys(fact, "k", hot_fraction=0.25)
    assert hot == [1]


def test_detect_hot_keys_immune_to_storage_order(spark):
    """Hot keys clustered at the END of input order (time-ordered
    ingest with a newly-hot key) must still be detected — the failure
    mode of prefix-limit sampling."""
    rows = [(i, 0.0) for i in range(400)] + [(777, 1.0)] * 600
    fact = spark.createDataFrame(rows, "k long, v double").coalesce(1)
    hot = skew.detect_hot_keys(fact, "k", hot_fraction=0.25)
    assert hot == [777]


def test_detect_hot_keys_small_table_uses_actual_total(spark):
    """Threshold must scale with the ACTUAL row count: on a 40-row
    table a key with 30 rows is hot at fraction 0.5 even though any
    fixed requested-sample bar (e.g. 3,125) dwarfs the table."""
    fact = spark.createDataFrame(
        [(8, 1.0)] * 30 + [(i, 0.0) for i in range(10)], "k long, v double"
    )
    assert skew.detect_hot_keys(fact, "k", hot_fraction=0.5) == [8]


def test_auto_detection_path_is_equivalent(spark, fact_dim):
    fact, dim = fact_dim
    salted = skew.skew_join(fact, dim, "k", buckets=3)
    assert _rows(salted) == _rows(fact.join(dim, "k", "inner"))


def test_hot_fact_rows_spread_over_salts(spark, fact_dim):
    """The point of salting: a hot key's rows must land on >1 (key,
    salt) bucket, or the straggler remains."""
    fact, _ = fact_dim
    f = fact.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(4)),
    )
    n_salts = (
        f.filter(F.col("k") == 1).select("__salt").distinct().count()
    )
    assert n_salts > 1
