"""Columnar-format round-trips: ORC read/write with pushdown parity,
zstd parquet, and mergeSchema evolution."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from training_etl_demo_2_spark import io


def test_orc_roundtrip_and_pushdown(spark, tmp_path, tables):
    path = os.path.join(str(tmp_path), "orders_orc")
    src = tables["orders"].select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    io.write_orc(src, path)
    back = io.read_orc(spark, path)
    assert back.count() == src.count()
    assert sorted(back.columns) == sorted(src.columns)
    # values survive the round-trip exactly (cents-summed)
    s1 = src.agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)))
    ).collect()[0][0]
    s2 = back.agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)))
    ).collect()[0][0]
    assert s1 == s2
    # filter + projection reach the ORC scan
    plan = (
        back.filter(F.col("o_orderkey") < 100)
        .select("o_orderkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(o_orderkey), LessThan(o_orderkey" in plan
    assert "o_custkey" not in plan.split("ReadSchema")[1][:200]


def test_parquet_zstd_roundtrip(spark, tmp_path, tables):
    path = os.path.join(str(tmp_path), "nation_zstd")
    io.write_parquet_zstd(tables["nation"], path)
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert files and all(".zstd." in f for f in files)
    back = spark.read.parquet(path)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, tables["nation"].collect())
    )


def test_merge_schema_evolution(spark, tmp_path):
    old = os.path.join(str(tmp_path), "evo", "batch=1")
    new = os.path.join(str(tmp_path), "evo", "batch=2")
    spark.createDataFrame(
        [(1, "a")], "id long, name string"
    ).write.parquet(old)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.parquet(new)
    got = io.read_parquet_evolved(spark, old, new).orderBy("id").collect()
    assert [r["id"] for r in got] == [1, 2]
    assert got[0]["score"] is None  # old rows surface the new column
    assert got[1]["score"] == 9.5


def test_jsonl_quarantine_split(spark, tmp_path):
    import os

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    p = os.path.join(str(tmp_path), "docs.jsonl")
    with open(p, "w") as f:
        f.write('{"doc_id": 1, "text": "ok"}\n')
        f.write('{"doc_id": "not-a-number", "text": "bad type"}\n')
        f.write('{broken json\n')
        f.write('{"doc_id": 2, "text": "fine"}\n')
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("text", StringType(), True),
        ]
    )
    got = io.read_jsonl_with_quarantine(spark, p, schema)
    good = sorted(r["doc_id"] for r in got.good.collect())
    bad = got.bad.collect()
    assert good == [1, 2]
    assert len(bad) == 2
    assert any("broken" in r["raw_record"] for r in bad)
    got.unpersist()
