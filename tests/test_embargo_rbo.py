"""Planted tests for the temporal embargo split and rank-biased
overlap."""

from __future__ import annotations

import datetime as dt
import math

from training_etl_demo_2_spark.operators import curation, validation


def _events(spark, rows):
    # rows: (event_id, ts, user_id)
    return {
        "events": spark.createDataFrame(
            [(i, t, u, "click", 1.0, "{}") for (i, t, u) in rows],
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        )
    }


def _docs(spark, rows):
    # rows: (doc_id, text, n_chars)
    return spark.createDataFrame(
        [(i, tx, "en", "s", n) for (i, tx, n) in rows],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )


def test_embargo_split_counts_and_overlap(spark):
    t = dt.datetime
    rows = [
        (1, t(2024, 1, 10), 1),  # train
        (2, t(2024, 1, 21, 23, 59), 2),  # train (strictly before t0)
        (3, t(2024, 1, 22), 3),  # embargo (>= t0)
        (4, t(2024, 1, 24, 23), 1),  # embargo, user 1 also in train
        (5, t(2024, 1, 25), 1),  # test, user 1 in train -> leakage
        (6, t(2024, 1, 28), 9),  # test, fresh user
    ]
    out = {
        r["split"]: r.asDict()
        for r in curation.temporal_embargo_split(
            _events(spark, rows)
        ).collect()
    }
    assert out["train"]["n_events"] == 2
    assert out["train"]["n_users"] == out["train"]["n_users_in_train"] == 2
    assert out["embargo"]["n_events"] == 2
    assert out["embargo"]["n_users"] == 2
    assert out["embargo"]["n_users_in_train"] == 1
    assert out["test"]["n_events"] == 2
    assert out["test"]["n_users"] == 2
    assert out["test"]["n_users_in_train"] == 1


def test_rbo_identical_rankings_is_one(spark):
    # richness == length order: doc i has i distinct words and
    # n_chars = i -> both rankings identical -> A_d = 1 for all d,
    # RBO@k = (1-p) * sum p^(d-1) = 1 - p^k
    rows = []
    for i in range(1, 9):
        rows.append((i, " ".join(f"w{j}" for j in range(i)), i))
    out = validation.rbo_rank_compare(_docs(spark, rows), k=8, p=0.9).collect()
    assert [r["n_common"] for r in out] == list(range(1, 9))
    assert all(r["agree_r6"] == 1.0 for r in out)
    expect = sum(
        math.floor(0.1 * 0.9 ** (d - 1) * 1.0 * 1e9 + 0.5) for d in range(1, 9)
    )
    assert out[-1]["rbo_nano"] == expect
    assert abs(out[-1]["rbo_r6"] - (1 - 0.9**8)) < 1e-6


def test_rbo_disjoint_rankings_is_zero(spark):
    # length picks docs 1..4 (chars high), richness picks docs 5..8
    # (distinct words high, chars low) -> top-4 lists are disjoint.
    rows = []
    for i in range(1, 5):
        rows.append((i, "only one word word word", 1000 + i))
    for i in range(5, 9):
        rows.append((i, " ".join(f"u{i}{j}" for j in range(20)), i))
    out = validation.rbo_rank_compare(_docs(spark, rows), k=4, p=0.9).collect()
    assert all(r["n_common"] == 0 for r in out)
    assert out[-1]["rbo_nano"] == 0
