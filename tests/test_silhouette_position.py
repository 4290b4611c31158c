"""Planted tests for the k-means simplified silhouette and U-shaped
position attribution."""

from __future__ import annotations

from training_etl_demo_2_spark.operators import behavior, similarity


def _emb(spark, rows):
    # rows: (vec_id, [floats])
    return {
        "embeddings": spark.createDataFrame(
            [(i, [float(x) for x in v], "l") for i, v in rows],
            "vec_id long, embedding array<float>, label string",
        )
    }


def test_silhouette_two_tight_far_clusters(spark):
    # k=2 (init = vec_ids 0 and 1, one in each blob), two well-
    # separated tight blobs -> mean silhouette near 1 in both clusters
    rows = [(0, [0.0, 0.1]), (2, [0.1, 0.0]), (4, [0.05, 0.05]),
            (1, [10.0, 10.1]), (3, [10.1, 10.0]), (5, [10.05, 10.05])]
    out = similarity.kmeans_silhouette(
        _emb(spark, rows), k=2, iters=3
    ).collect()
    assert len(out) == 2
    assert sum(r["n_members"] for r in out) == 6
    for r in out:
        assert r["mean_silhouette_r6"] > 0.9
        assert r["min_silhouette_r6"] > 0.9


def test_silhouette_coincident_centroids_zero(spark):
    # all points identical -> the two centroids coincide -> a = b = 0
    # for every vector -> s = 0 exactly (the guarded division)
    rows = [(i, [1.0, 2.0]) for i in range(6)]
    out = similarity.kmeans_silhouette(
        _emb(spark, rows), k=2, iters=2
    ).collect()
    assert sum(r["n_members"] for r in out) == 6
    for r in out:
        assert r["mean_silhouette_r6"] == 0.0
        assert r["min_silhouette_r6"] == 0.0


def test_silhouette_bounds(spark):
    rows = [(i, [float((i * 7) % 5), float((i * 3) % 4)]) for i in range(20)]
    out = similarity.kmeans_silhouette(
        _emb(spark, rows), k=4, iters=2
    ).collect()
    for r in out:
        assert -1.0 <= r["min_silhouette_r6"] <= 1.0
        assert -1.0 <= r["mean_silhouette_r6"] <= 1.0


def _events(spark, rows):
    # rows: (event_id, user_id, event_type, ts)
    import datetime

    return spark.createDataFrame(
        [
            (e, datetime.datetime.fromisoformat(ts), u, et, 1.0, "{}")
            for (e, u, et, ts) in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_position_single_click_full_credit(spark):
    rows = [
        (1, 7, "click", "2024-01-01 10:10:00"),
        (2, 7, "purchase", "2024-01-01 10:40:00"),
    ]
    out = behavior.position_attribution(_events(spark, rows)).collect()
    assert len(out) == 1
    assert out[0]["click_hour"] == "2024-01-01 10:00"
    assert out[0]["credit"] == 1.0


def test_position_u_shape_40_20_40(spark):
    # 4 clicks before one purchase: 0.4 / 0.1 / 0.1 / 0.4
    rows = [
        (1, 7, "click", "2024-01-01 10:05:00"),
        (2, 7, "click", "2024-01-01 10:10:00"),
        (3, 7, "click", "2024-01-01 10:15:00"),
        (4, 7, "click", "2024-01-01 10:20:00"),
        (5, 7, "purchase", "2024-01-01 10:40:00"),
    ]
    out = behavior.position_attribution(_events(spark, rows)).collect()
    assert len(out) == 1
    assert out[0]["n_credit_events"] == 4
    assert abs(out[0]["credit"] - 1.0) < 1e-6  # 0.4+0.1+0.1+0.4


def test_position_two_clicks_even_split_and_hours(spark):
    # first click in hour 9, last in hour 10 -> 0.5 credit each hour
    rows = [
        (1, 7, "click", "2024-01-01 09:55:00"),
        (2, 7, "click", "2024-01-01 10:05:00"),
        (3, 7, "purchase", "2024-01-01 10:30:00"),
    ]
    out = {
        r["click_hour"]: r
        for r in behavior.position_attribution(_events(spark, rows)).collect()
    }
    assert abs(out["2024-01-01 09:00"]["credit"] - 0.5) < 1e-6
    assert abs(out["2024-01-01 10:00"]["credit"] - 0.5) < 1e-6


def test_position_tie_timestamps_deterministic(spark):
    # 3 clicks at the SAME microsecond: order falls back to event_id,
    # so credits are 0.4/0.2/0.4 regardless of input order
    rows = [
        (3, 7, "click", "2024-01-01 10:10:00"),
        (1, 7, "click", "2024-01-01 10:10:00"),
        (2, 7, "click", "2024-01-01 10:10:00"),
        (9, 7, "purchase", "2024-01-01 10:40:00"),
    ]
    out = behavior.position_attribution(_events(spark, rows)).collect()
    assert len(out) == 1
    assert out[0]["n_credit_events"] == 3
    assert abs(out[0]["credit"] - 1.0) < 1e-6


def test_position_click_outside_window_ignored(spark):
    rows = [
        (1, 7, "click", "2024-01-01 08:00:00"),  # > 1h before
        (2, 7, "purchase", "2024-01-01 10:40:00"),
    ]
    out = behavior.position_attribution(_events(spark, rows)).collect()
    assert out == []
