"""Scalar pandas UDF and Python UDTF surfaces."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from training_etl_demo_2_spark.operators import udfs


def test_cosine_to_query_matches_numpy(spark, tables):
    emb = tables["embeddings"].limit(50)
    rows = emb.collect()
    q = rows[0].embedding
    got = {
        r.vec_id: r.sim
        for r in emb.select(
            "vec_id", udfs.cosine_to_query(q)(F.col("embedding")).alias("sim")
        ).collect()
    }
    qv = np.asarray(q, dtype=np.float64)
    for r in rows:
        v = np.asarray(r.embedding, dtype=np.float64)
        want = round(float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv))), 6)
        assert abs(got[r.vec_id] - want) < 1e-9


def test_sentence_split_udtf_from_sql(spark):
    udfs.register_udtfs(spark)
    rows = spark.sql(
        "SELECT * FROM sentence_split('One two. Three! Four five six?')"
    ).collect()
    assert [(r.sent_idx, r.sentence, r.n_words) for r in rows] == [
        (0, "One two.", 2),
        (1, "Three!", 1),
        (2, "Four five six?", 3),
    ]


def test_sentence_split_lateral_join(spark, tables):
    udfs.register_udtfs(spark)
    tables["documents"].limit(10).createOrReplaceTempView("docs10")
    rows = spark.sql(
        "SELECT d.doc_id, s.sent_idx, s.n_words "
        "FROM docs10 d, LATERAL sentence_split(d.text) s"
    ).collect()
    assert len(rows) >= 10
    assert all(r.n_words > 0 for r in rows)


def test_minmax_norm_matches_window_formulation(spark, tables):
    """applyInPandas result == the pure-SQL window min/max formulation
    (same expression tree, no Python) on the same session."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    got = udfs.minmax_norm_by_type(tables)
    w = Window.partitionBy("event_type")
    e = tables["events"].filter(F.col("value").isNotNull())
    ref = (
        e.withColumn("mn", F.min("value").over(w))
        .withColumn("mx", F.max("value").over(w))
        .select(
            "event_id",
            "event_type",
            F.when(F.col("mx") == F.col("mn"), F.lit(0))
            .otherwise(
                F.floor(
                    (F.col("value") - F.col("mn"))
                    / (F.col("mx") - F.col("mn"))
                    * 10000
                    + F.lit(0.5)
                )
            )
            .cast("long")
            .alias("norm_bp"),
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))
    assert got.count() == e.count()
    # bounds: basis points live in [0, 10000]
    assert got.filter((F.col("norm_bp") < 0) | (F.col("norm_bp") > 10000)).count() == 0
