"""Planted tests for the ANN NDCG@k evaluation harness."""

from __future__ import annotations

from training_etl_demo_2_spark.operators import similarity


def _emb(spark, rows):
    return {
        "embeddings": spark.createDataFrame(
            [(i, [float(x) for x in v], "l") for i, v in rows],
            "vec_id long, embedding array<float>, label string",
        )
    }


def _clustered(k_groups=4, per=6, dim=64):
    # well-separated orthogonal-ish clusters: group g lives on axes
    # [8g..8g+7] with tiny member-specific perturbation -> every
    # vector's true top-5 is its own group, all on the same side of
    # any hyperplane with overwhelming margin per axis block
    rows = []
    vid = 0
    for g in range(k_groups):
        for m in range(per):
            v = [0.0] * dim
            for a in range(8):
                v[(8 * g + a) % dim] = 10.0 + 0.001 * m * (a + 1)
            rows.append((vid, v))
            vid += 1
    return rows


def test_ndcg_bounds_and_hits(spark):
    out = similarity.ann_ndcg_eval(_emb(spark, _clustered()), k=5).collect()
    assert len(out) == 20  # query panel vec_id < 20
    for r in out:
        assert 0 <= r["n_hits"] <= 5
        if r["ndcg_r6"] is not None:
            assert 0.0 <= r["ndcg_r6"] <= 1.0 + 1e-9
        assert r["dcg_r6"] >= 0.0


def test_ndcg_perfect_when_lsh_finds_cluster(spark):
    # same-cluster members share every sign bit (identical dominant
    # block), so LSH returns exactly the brute list -> NDCG = 1
    out = similarity.ann_ndcg_eval(_emb(spark, _clustered()), k=5).collect()
    perfect = [r for r in out if r["ndcg_r6"] == 1.0]
    assert len(perfect) == len(out)


def test_ndcg_penalizes_missing_neighbors(spark):
    # isolated singleton clusters: queries whose true neighbors are in
    # OTHER buckets get low n_hits; identity n_hits=5 <=> every term
    # graded > 0 is impossible to fake since rel comes from truth join
    out = similarity.ann_ndcg_eval(_emb(spark, _clustered()), k=5).collect()
    for r in out:
        if r["n_hits"] == 0:
            assert r["dcg_r6"] == 0.0


def test_ivf_ndcg_same_scale(spark):
    out = similarity.ivf_ndcg_eval(_emb(spark, _clustered()), k=5).collect()
    assert len(out) == 20
    for r in out:
        assert 0 <= r["n_hits"] <= 5
        if r["ndcg_r6"] is not None:
            assert 0.0 <= r["ndcg_r6"] <= 1.0 + 1e-9
