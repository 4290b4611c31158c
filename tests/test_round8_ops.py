"""Round-8 additions: register-HLL re-basings of the former rows-only
sketch queries, and the shared-token-scan shingle_n_curve refactor."""

from __future__ import annotations

from pyspark.sql import functions as F

from training_etl_demo_2_spark.operators import dedup, sketches, validation


# ---------------------------------------------------------------------------
# user_stats_register_hll (re-based sketch_user_stats)
# ---------------------------------------------------------------------------


def test_user_stats_register_hll_accuracy(tables):
    out = {
        r["event_type"]: r
        for r in sketches.user_stats_register_hll(tables).collect()
    }
    exact = {
        r["event_type"]: (r["exact"], r["n"])
        for r in tables["events"]
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert set(out) == set(exact)
    for et, (ex, n) in exact.items():
        r = out[et]
        assert r["n_events"] == n
        # m=1024 registers -> ~3.2% RSE; allow ~4 sigma on small groups
        assert abs(r["approx_users_r6"] - ex) <= max(3, 0.13 * ex), (
            et, r["approx_users_r6"], ex,
        )


def test_user_stats_register_hll_matches_hll_user_estimate(tables):
    """Same registers, same fold: the re-based stats query's estimate
    must equal hll_user_estimate's est_r6 exactly (both rounded-6)."""
    stats = {
        r["event_type"]: r["approx_users_r6"]
        for r in sketches.user_stats_register_hll(tables).collect()
    }
    ref = {
        r["event_type"]: r["est_r6"]
        for r in sketches.hll_user_estimate(tables).collect()
    }
    assert stats == ref


# ---------------------------------------------------------------------------
# hll_column_profile (re-based data_profile_lineitem_approx)
# ---------------------------------------------------------------------------


def test_hll_column_profile_tracks_exact(tables):
    li = tables["lineitem"]
    exact = {r.col_name: r for r in validation.profile_columns(li).collect()}
    approx = {r.col_name: r for r in sketches.hll_column_profile(li).collect()}
    assert set(exact) == set(approx)
    for c, e in exact.items():
        a = approx[c]
        # base stats are shared logic with the exact tier minus Expand
        assert (a.n_rows, a.n_nulls) == (e.n_rows, e.n_nulls), c
        # numeric kinds expose min/max identically; strings NULL
        assert (a.min_num, a.max_num) == (e.min_num, e.max_num), c
        # register HLL at m=1024 -> ~3.2% RSE. The fixture's doubles are
        # 2-decimal money values and shipdate is date-valued, so the
        # canonical resolutions (cents/days) are lossless here and the
        # estimate targets the true distinct count.
        assert abs(a.n_distinct_est_r6 - e.n_distinct) <= max(
            2, 0.13 * e.n_distinct
        ), (c, a.n_distinct_est_r6, e.n_distinct)


def test_hll_column_profile_null_column(spark):
    df = spark.range(50).select(
        F.col("id"),
        F.when(F.col("id") < 10, F.col("id")).alias("sparse"),
        F.lit(None).cast("string").alias("allnull"),
    )
    prof = {r.col_name: r for r in sketches.hll_column_profile(df).collect()}
    assert prof["sparse"].n_nulls == 40
    assert abs(prof["sparse"].n_distinct_est_r6 - 10) <= 1
    # an all-null column has no registers: estimate is NULL, not 0
    assert prof["allnull"].n_nulls == 50
    assert prof["allnull"].n_distinct_est_r6 is None


# ---------------------------------------------------------------------------
# shingle_n_curve: shared token scan must not change values
# ---------------------------------------------------------------------------


def test_shingle_n_curve_matches_per_arm_recompute(tables):
    """The round-8 shared-token refactor is a pure plan change: each
    arm's row must equal what independent shingle_hashes +
    minhash_lsh_pairs runs produce."""
    docs = tables["documents"]
    out = {r["n"]: r for r in dedup.shingle_n_curve(docs).collect()}
    for n in (2, 3):
        sh = dedup.shingle_hashes(docs, "text", n)
        agg = sh.agg(
            F.count_distinct("doc_id").alias("d"),
            F.count_distinct("h").alias("s"),
        ).collect()[0]
        jac = dedup.minhash_lsh_pairs(docs, "text", n=n, threshold=0.5)
        pairs50 = jac.filter(F.col("jaccard") >= 0.5).count()
        r = out[n]
        assert (r["n_docs_with_shingles"], r["distinct_shingles"]) == (
            agg["d"], agg["s"],
        )
        assert r["pairs_j50"] == pairs50
