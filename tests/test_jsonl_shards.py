"""Custom DataSourceWriter: transactional JSONL shard export —
manifest names exactly the committed rows, shard rotation bounds shard
size, staging never leaks into the published set."""

from __future__ import annotations

import json
from pathlib import Path

from training_etl_demo_2_spark.sinks.jsonl_shards import JsonlShardDataSource


def test_jsonl_shard_export_roundtrip(spark, tables, tmp_path):
    spark.dataSource.register(JsonlShardDataSource)
    out = str(tmp_path / "export")
    docs = tables["documents"].select("doc_id", "lang", "source")
    (
        docs.write.format("jsonl_shards")
        .option("path", out)
        .option("max_rows_per_shard", 100)
        .mode("append")
        .save()
    )
    manifest = json.loads((Path(out) / "manifest.json").read_text())
    n_docs = docs.count()
    assert manifest["n_rows"] == n_docs
    # every published shard is in the manifest and bounded; staging empty
    files = sorted(p.name for p in Path(out).glob("shard-*.jsonl"))
    assert files == sorted(s["file"] for s in manifest["shards"])
    assert all(s["n_rows"] <= 100 for s in manifest["shards"])
    assert list(Path(out, "_staging").glob("*")) == []
    # the rows round-trip
    back = spark.read.json(str(Path(out) / "shard-*.jsonl"))
    assert back.count() == n_docs
    assert {r.doc_id for r in back.select("doc_id").collect()} == {
        r.doc_id for r in docs.select("doc_id").collect()
    }


def test_jsonl_shard_rotation_counts(spark, tmp_path):
    spark.dataSource.register(JsonlShardDataSource)
    out = str(tmp_path / "rot")
    df = spark.range(0, 1000).repartition(2)
    (
        df.write.format("jsonl_shards")
        .option("path", out)
        .option("max_rows_per_shard", 150)
        .mode("append")
        .save()
    )
    manifest = json.loads((Path(out) / "manifest.json").read_text())
    assert manifest["n_rows"] == 1000
    assert all(s["n_rows"] <= 150 for s in manifest["shards"])
    # 2 partitions x ceil(500/150)=4 shards
    assert len(manifest["shards"]) >= 7
