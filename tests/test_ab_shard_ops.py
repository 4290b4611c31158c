"""Planted tests for the A/B z-test and the striped shard plan."""

from __future__ import annotations

from training_etl_demo_2_spark.operators import behavior, maintenance


def _events(spark, rows):
    # rows: (user_id, event_type)
    return {
        "events": spark.createDataFrame(
            [(u, et, "2024-01-01 00:00:00", 1.0, "s", "{}") for u, et in rows],
            "user_id long, event_type string, ts string, value double, "
            "session_id string, props string",
        )
    }


def test_ab_aa_test_is_null(spark):
    # Same conversion process in both buckets (every 5th user converts,
    # independent of the hash) -> |z| must stay below 1.96.
    rows = []
    for u in range(2000):
        rows.append((u, "view"))
        if u % 5 == 0:
            rows.append((u, "purchase"))
    out = {r["variant"]: r.asDict() for r in
           behavior.ab_test_zscore(_events(spark, rows)).collect()}
    assert set(out) == {"A", "B"}
    assert out["A"]["significant"] == 0 and out["B"]["significant"] == 0
    # assignment is a ~50/50 split
    assert abs(out["A"]["n_users"] - 1000) < 150
    # z is antisymmetric between the two rows
    assert abs(out["A"]["z_r6"] + out["B"]["z_r6"]) < 1e-9


def test_ab_planted_effect_detected(spark):
    # Boost ONLY variant-A users' conversion: replicate the assignment
    # hash to find each user's bucket, then give A 40% vs B 10%.
    from training_etl_demo_2_spark.operators.sketches import HLL_P1, HLL_P2

    def mix(x, seed):
        a1, a2, a3, b = seed
        x1 = (x % HLL_P1) * a1 % HLL_P1
        x1 ^= x1 >> 7
        x2 = (x1 % HLL_P2) * a2 % HLL_P2
        x2 ^= x2 >> 11
        return (x2 * a3 + b) % HLL_P1

    rows = []
    for u in range(3000):
        rows.append((u, "view"))
        in_a = mix(u, behavior.AB_SEED) % 2 == 0
        if (in_a and u % 5 < 2) or (not in_a and u % 10 == 0):
            rows.append((u, "purchase"))
    out = {r["variant"]: r.asDict() for r in
           behavior.ab_test_zscore(_events(spark, rows)).collect()}
    assert out["A"]["significant"] == 1 and out["B"]["significant"] == 1
    assert out["A"]["z_r6"] > 1.96  # A is the better arm
    assert out["A"]["conv_bp"] > out["B"]["conv_bp"]


def _docs(spark, sizes):
    return spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(s)), "en", "web", s)
         for i, s in enumerate(sizes)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_striped_shards_balanced(spark):
    # 64 docs with a 100:1 size spread stripe into 8 near-equal shards
    sizes = [400 - 6 * i for i in range(64)]
    out = maintenance.striped_shard_plan(_docs(spark, sizes)).collect()
    assert len(out) == 8
    assert sum(r["n_docs"] for r in out) == 64
    tok = [r["tokens_sum"] for r in out]
    assert max(tok) - min(tok) <= max(sizes) - min(sizes)
    shares = [r["share_bp"] for r in out]
    # 8 shards -> ~1250 bp each; striping keeps every shard close
    assert all(1100 <= s <= 1400 for s in shares)


def test_striped_shards_deterministic_and_exact_ranks(spark):
    sizes = [10, 10, 10, 50, 50, 50, 90, 90]
    a = sorted(
        r.asDict().items()
        for r in maintenance.striped_shard_plan(_docs(spark, sizes), 2).collect()
    )
    b = sorted(
        r.asDict().items()
        for r in maintenance.striped_shard_plan(_docs(spark, sizes), 2).collect()
    )
    assert a == b
    # ranks: sizes desc with doc_id tiebreak -> shard0 gets ranks 0,2,4,6
    out = {dict(x)["shard"]: dict(x) for x in a}
    assert out[0]["tokens_sum"] == 90 + 50 + 50 + 10
    assert out[1]["tokens_sum"] == 90 + 50 + 10 + 10
