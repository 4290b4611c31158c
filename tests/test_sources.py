"""Source connector tests: format dispatch, JSONL round-trip, explicit
schemas, TSV parity with the reference's reader semantics."""

from __future__ import annotations

import pytest

from training_etl_demo_2_spark import sources


def test_read_table_parquet(spark, sf_dir):
    df = sources.read_table(spark, f"{sf_dir}/region.parquet", fmt="parquet")
    assert df.count() == 5


def test_jsonl_roundtrip(spark, tables, tmp_path):
    out = str(tmp_path / "docs.jsonl")
    tables["documents"].limit(20).write.mode("overwrite").json(out)
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    df = sources.read_jsonl(spark, out, schema=schema)
    assert df.count() == 20
    assert df.schema.simpleString().startswith("struct<doc_id:bigint")


def test_tsv_all_string_without_schema(spark, tmp_path):
    p = tmp_path / "t.tsv"
    p.write_text("a\tb\n1\tx y\n2\tz\n")
    df = sources.read_tsv(spark, str(p))
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["string", "string"]
    assert df.count() == 2


def test_read_table_rejects_unknown_format(spark):
    with pytest.raises(ValueError, match="unsupported format"):
        sources.read_table(spark, "/tmp/x", fmt="avro")
