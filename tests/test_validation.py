"""Unit tests for the data-quality validation suite and keyed merge."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import assert_df_equal
from training_etl_demo_2_spark.operators import merge, validation


def test_profile_counts_nulls_distincts_minmax(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, None, "a"), (3, 30.0, None), (3, 30.0, "b")],
        "id long, x double, s string",
    )
    prof = {r.col_name: r for r in validation.profile_columns(df).collect()}
    assert prof["id"].n_rows == 4
    assert prof["id"].n_nulls == 0
    assert prof["id"].n_distinct == 3
    assert prof["id"].min_num == 1.0 and prof["id"].max_num == 3.0
    assert prof["x"].n_nulls == 1
    assert prof["x"].n_distinct == 2  # NULL not counted as a distinct value
    # non-numeric column: no min/max
    assert prof["s"].min_num is None and prof["s"].max_num is None
    assert prof["s"].n_nulls == 1


def test_profile_approx_mode_runs(spark):
    df = spark.range(100).select(F.col("id"), (F.col("id") % 7).alias("m"))
    prof = {r.col_name: r for r in validation.profile_columns(df, approx=True).collect()}
    # HLL estimate of 7 distinct values at this cardinality is exact
    assert prof["m"].n_distinct == 7


def test_profile_approx_within_hll_bounds(tables):
    """The registered 100 TB tier (data_profile_lineitem_approx) must
    track the exact profile: identical everywhere except n_distinct,
    which stays inside generous HLL bounds (default rsd 0.05 → assert
    ±15%, 3 sigma)."""
    li = tables["lineitem"]
    exact = {r.col_name: r for r in validation.profile_columns(li).collect()}
    approx = {
        r.col_name: r
        for r in validation.profile_columns(li, approx=True).collect()
    }
    assert exact.keys() == approx.keys()
    for c, e in exact.items():
        a = approx[c]
        assert (a.n_rows, a.n_nulls, a.min_num, a.max_num) == (
            e.n_rows,
            e.n_nulls,
            e.min_num,
            e.max_num,
        ), c
        assert abs(a.n_distinct - e.n_distinct) <= max(1, 0.15 * e.n_distinct), (
            c,
            a.n_distinct,
            e.n_distinct,
        )


def test_fk_orphans_counts_only_nonnull_misses(spark):
    t = {
        name: df
        for name, df in {
            "customer": spark.createDataFrame([(1, 10), (2, 99)], "c_custkey long, c_nationkey int"),
            "orders": spark.createDataFrame(
                [(100, 1), (101, 7), (102, None)], "o_orderkey long, o_custkey long"
            ),
            "lineitem": spark.createDataFrame(
                [(100, 1, 1), (999, 1, 1)],
                "l_orderkey long, l_partkey long, l_suppkey long",
            ),
            "part": spark.createDataFrame([(1,)], "p_partkey long"),
            "supplier": spark.createDataFrame([(1, 10)], "s_suppkey long, s_nationkey int"),
            "nation": spark.createDataFrame([(10, 0)], "n_nationkey int, n_regionkey int"),
            "region": spark.createDataFrame([(0,)], "r_regionkey int"),
        }.items()
    }
    out = {r.edge: r for r in validation.fk_orphans(t).collect()}
    # o_custkey=7 has no customer; NULL o_custkey is NOT an orphan
    assert out["orders.o_custkey->customer.c_custkey"].n_orphans == 1
    assert out["orders.o_custkey->customer.c_custkey"].n_child_rows == 3
    # lineitem 999 has no order
    assert out["lineitem.l_orderkey->orders.o_orderkey"].n_orphans == 1
    # customer nationkey 99 missing
    assert out["customer.c_nationkey->nation.n_nationkey"].n_orphans == 1
    assert out["nation.n_regionkey->region.r_regionkey"].n_orphans == 0
    assert len(out) == len(validation.FK_EDGES)


def test_rule_violations_null_is_violation(spark):
    t = {
        "lineitem": spark.createDataFrame(
            [
                (1.0, 0.1, 0.0, 5.0, "A", "2020-01-01"),
                (-2.0, 1.5, -0.1, 0.0, "X", None),
                (None, None, None, None, None, "2020-01-01"),
            ],
            "l_quantity double, l_discount double, l_tax double, "
            "l_extendedprice double, l_returnflag string, l_shipdate string",
        ).withColumn("l_shipdate", F.to_timestamp("l_shipdate")),
        "orders": spark.createDataFrame(
            [(1.0, "F", "2020-01-01", "1-URGENT")],
            "o_totalprice double, o_orderstatus string, o_orderdate string, "
            "o_orderpriority string",
        ).withColumn("o_orderdate", F.to_timestamp("o_orderdate")),
    }
    out = {r.rule: r for r in validation.rule_violations(t).collect()}
    assert out["lineitem_quantity_positive"].n_violations == 2  # -2 and NULL
    assert out["lineitem_discount_unit_range"].n_violations == 2  # 1.5 and NULL
    assert out["lineitem_returnflag_domain"].n_violations == 2  # X and NULL
    assert out["lineitem_shipdate_present"].n_violations == 1
    assert out["orders_totalprice_positive"].n_violations == 0
    assert all(r.n_rows == 3 for r in out.values() if r.rule.startswith("lineitem"))


def test_pk_duplicates_composite_key(spark):
    t = {
        name: spark.createDataFrame([(1,)], f"{k} long")
        for name, (k,) in [
            (n, ks) for n, ks in validation.PK_KEYS if len(ks) == 1
        ]
    }
    t["lineitem"] = spark.createDataFrame(
        [(1, 1), (1, 2), (1, 2), (2, 1)], "l_orderkey long, l_linenumber int"
    )
    out = {r.table_name: r for r in validation.pk_duplicates(t).collect()}
    assert out["lineitem"].n_rows == 4
    assert out["lineitem"].n_distinct_keys == 3
    assert out["lineitem"].n_dups == 1
    assert out["lineitem"].n_null_keys == 0
    assert out["orders"].n_dups == 0


def test_pk_duplicates_null_keys_match_oracle(spark):
    """NULL-keyed rows: GROUP BY semantics on both engines — 3 NULL
    rows form one group (2 dups), all surfaced in n_null_keys. This is
    exactly the case where the old count_distinct formulation diverged
    from the SQL twin."""
    import duckdb

    rows = [(None,), (None,), (None,), (5,), (5,), (7,)]
    t = {
        name: spark.createDataFrame([(1,)], f"{ks[0]} long")
        for name, ks in validation.PK_KEYS
        if len(ks) == 1
    }
    t["lineitem"] = spark.createDataFrame(
        [(1, 1)], "l_orderkey long, l_linenumber int"
    )
    t["orders"] = spark.createDataFrame(rows, "o_orderkey long")
    out = {r.table_name: r for r in validation.pk_duplicates(t).collect()}
    assert out["orders"].n_rows == 6
    assert out["orders"].n_distinct_keys == 3  # {NULL}, {5}, {7}
    assert out["orders"].n_dups == 3  # 2 extra NULLs + 1 extra 5
    assert out["orders"].n_null_keys == 3

    con = duckdb.connect()
    con.execute("CREATE TABLE orders (o_orderkey BIGINT)")
    con.executemany("INSERT INTO orders VALUES (?)", rows)
    sql = next(
        part
        for part in validation.pk_duplicates_sql().split(" UNION ALL ")
        if "'orders'" in part
    )
    oracle = con.sql(sql).fetchone()
    assert oracle == ("orders", 6, 3, 3, 3)


def test_value_anomalies_flags_outlier_only(spark):
    rows = [(i, 1, "click", 10.0 + (i % 3)) for i in range(20)]
    rows.append((99, 2, "click", 500.0))  # the outlier
    rows.append((100, 3, "view", 1.0))  # lone type: stddev undefined -> no flag
    events = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double"
    )
    out = validation.value_anomalies(events).collect()
    assert [r.event_id for r in out] == [99]
    assert out[0].z > 3


def test_tfidf_rare_term_beats_ubiquitous(spark):
    from training_etl_demo_2_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [
            (1, "common common zebra"),
            (2, "common common common"),
            (3, "common word word"),
        ],
        "doc_id long, text string",
    )
    out = text_ops.tfidf_top_terms(docs, k=1).collect()
    top = {r.doc_id: r.term for r in out}
    # 'common' appears in every doc -> low idf; rare terms win
    assert top[1] == "zebra"
    assert top[3] == "word"
    # doc 2 only has 'common': still emitted (top-k of what exists)
    assert top[2] == "common"


def test_merge_upsert_update_insert_keep(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, s string, v double",
    )
    updates = spark.createDataFrame(
        [(2, None, 99.0), (4, "d", 40.0)], "k long, s string, v double"
    )
    out = merge.merge_upsert(target, updates, "k")
    # update replaces the WHOLE row (s becomes NULL, not coalesced back)
    assert_df_equal(
        out,
        [(1, "a", 10.0), (2, None, 99.0), (3, "c", 30.0), (4, "d", 40.0)],
    )


def test_merge_scd2_close_open_insert_noop(spark):
    import datetime as dt

    ts = lambda s: dt.datetime.fromisoformat(s)
    hist = spark.createDataFrame(
        [
            (1, "a", ts("2020-01-01"), None),     # will change -> close+open
            (2, "b", ts("2020-01-01"), None),     # unchanged -> no-op
            (3, "c", ts("2019-01-01"), ts("2020-01-01")),  # past version
            (3, "c2", ts("2020-01-01"), None),    # current, no update
        ],
        "k long, attr string, valid_from timestamp, valid_to timestamp",
    )
    upd = spark.createDataFrame(
        [
            (1, "a9", ts("2021-06-01")),
            (2, "b", ts("2021-06-01")),   # identical attr: must NOT version
            (4, "new", ts("2021-06-01")),  # brand-new key
        ],
        "k long, attr string, eff_ts timestamp",
    )
    out = merge.merge_scd2(hist, upd, "k")
    rows = sorted(tuple(r) for r in out.collect())
    assert rows == sorted(
        [
            (1, "a", ts("2020-01-01"), ts("2021-06-01")),  # closed
            (1, "a9", ts("2021-06-01"), None),             # opened
            (2, "b", ts("2020-01-01"), None),              # untouched
            (3, "c", ts("2019-01-01"), ts("2020-01-01")),  # past kept
            (3, "c2", ts("2020-01-01"), None),             # current kept
            (4, "new", ts("2021-06-01"), None),            # inserted
        ]
    )


def test_merge_scd2_null_attr_is_a_change(spark):
    import datetime as dt

    ts = dt.datetime.fromisoformat
    hist = spark.createDataFrame(
        [(1, "x", ts("2020-01-01"), None)],
        "k long, attr string, valid_from timestamp, valid_to timestamp",
    )
    upd = spark.createDataFrame(
        [(1, None, ts("2021-01-01"))], "k long, attr string, eff_ts timestamp"
    )
    out = merge.merge_scd2(hist, upd, "k").collect()
    assert len(out) == 2  # closed + opened-with-null


def test_merge_upsert_broadcast_path_same_result(spark):
    target = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double")
    updates = spark.createDataFrame([(2, 9.0)], "k long, v double")
    a = sorted(tuple(r) for r in merge.merge_upsert(target, updates, "k").collect())
    b = sorted(
        tuple(r)
        for r in merge.merge_upsert(
            target, updates, "k", broadcast_updates=True
        ).collect()
    )
    assert a == b == [(1, 1.0), (2, 9.0)]


def test_winsorized_stats_clips_outliers(spark):
    from training_etl_demo_2_spark.operators.validation import winsorized_stats

    rows = [(i, "t", float(i)) for i in range(1, 100)]  # 1..99
    rows.append((100, "t", 1e9))  # the outlier that must be clipped
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    r = winsorized_stats(df).collect()[0]
    assert r.n_events == 100
    assert r.n_clipped_hi == 1  # only the outlier exceeds p99
    # hi threshold is the rank-ceil(0.99*100)=99 value: 99.0
    assert r.hi_t4 == 99_0000
    # winsorized sum is bounded by n * hi (the outlier cannot dominate)
    assert r.winsorized_sum_t4 <= 100 * r.hi_t4


def test_psi_zero_for_identical_and_large_for_shifted(spark):
    from training_etl_demo_2_spark.operators.validation import value_drift_psi

    base = [(i, "t", float(i % 50)) for i in range(1000)]
    shifted = [(i, "t", float(i % 50) + 200.0) for i in range(1000)]
    mk = lambda rows: spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )
    same = value_drift_psi(mk(base), mk(base)).collect()[0]
    assert abs(same.psi) < 1e-9  # identical distributions -> PSI 0
    moved = value_drift_psi(mk(base), mk(shifted)).collect()[0]
    assert moved.psi > 0.25  # fully disjoint support -> loud alarm


def test_k_anonymity_audit_flags_small_groups(spark):
    from training_etl_demo_2_spark.operators.validation import k_anonymity_audit

    df = spark.createDataFrame(
        [(1, "A")] * 6 + [(2, "B")] * 2 + [(3, "C")] * 4,
        "c_nationkey long, c_mktsegment string",
    )
    out = {
        (r.c_nationkey, r.c_mktsegment): r.group_size
        for r in k_anonymity_audit(
            df, quasi_identifiers=("c_nationkey", "c_mktsegment"), k=5
        ).collect()
    }
    # only the groups below k appear
    assert out == {(2, "B"): 2, (3, "C"): 4}


def test_robust_anomalies_flag_planted_outliers(spark):
    """Median/MAD flags planted spikes and — unlike the z-score — does
    not let a contamination burst mask itself."""
    from training_etl_demo_2_spark.operators.validation import (
        robust_value_anomalies,
    )

    rows = []
    # 60 well-behaved values in [100, 101]
    for i in range(60):
        rows.append((i, "m", 100.0 + (i % 10) / 10.0))
    # a 10-value outlier burst at 10x the level
    for i in range(60, 70):
        rows.append((i, "m", 1000.0 + i))
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    flagged = {r.event_id for r in robust_value_anomalies(df).collect()}
    assert flagged == set(range(60, 70))


def test_robust_anomalies_quiet_on_uniform_data(spark):
    from training_etl_demo_2_spark.operators.validation import (
        robust_value_anomalies,
    )

    rows = [(i, "m", 50.0 + (i % 7) / 10.0) for i in range(50)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    assert robust_value_anomalies(df).count() == 0


def test_l_diversity_flags_homogeneous_groups(spark):
    from training_etl_demo_2_spark.operators.validation import (
        l_diversity_audit,
    )

    rows = [
        # group A: 4 members, all the same sensitive value -> flagged
        (1, "A", 100.0), (2, "A", 100.0), (3, "A", 100.0), (4, "A", 100.0),
        # group B: 3 members, 3 distinct values -> passes at l=3
        (5, "B", 10.0), (6, "B", 20.0), (7, "B", 30.0),
        # group C: 2 distinct values -> flagged
        (8, "C", 1.0), (9, "C", 1.0), (10, "C", 2.0),
    ]
    df = spark.createDataFrame(rows, "id long, seg string, c_acctbal double")
    out = {
        r.seg: (r.group_size, r.n_sensitive)
        for r in l_diversity_audit(
            df, quasi_identifiers=("seg",), sensitive="c_acctbal", l=3
        ).collect()
    }
    assert out == {"A": (4, 1), "C": (3, 2)}


def test_lineitem_correlations_planted(spark):
    """Perfectly correlated, anti-correlated, and constant columns
    recover r=1, r=-1, and NULL from the single-pass statistics."""
    from training_etl_demo_2_spark.operators.validation import (
        lineitem_correlations,
    )

    rows = [
        # quantity q, price = 10q (r=1), discount = (0.10 - 0.01q)
        # (r=-1 vs quantity), tax constant
        (float(q), float(10 * q), 0.10 - 0.01 * q, 0.05)
        for q in range(1, 9)
    ]
    li = spark.createDataFrame(
        rows, "l_quantity double, l_extendedprice double, l_discount double, l_tax double"
    )
    out = {(r.col_a, r.col_b): r for r in
           lineitem_correlations({"lineitem": li}).collect()}
    assert out[("quantity", "price")].r == 1.0
    assert out[("quantity", "discount")].r == -1.0
    assert out[("quantity", "tax")].r is None  # zero-variance guard
    assert all(r.n == 8 for r in out.values())
    assert len(out) == 6


def test_scd2_pit_attributes_to_version_in_force(spark):
    """A fact inside the closed version's window attributes to the OLD
    version; one after the close attributes to the NEW one."""
    import datetime as dt

    hist = spark.createDataFrame(
        [(1, "A", dt.datetime(2026, 1, 1), None)],
        "k long, status string, valid_from timestamp, valid_to timestamp",
    )
    upd = spark.createDataFrame(
        [(1, "B", dt.datetime(2026, 2, 1))],
        "k long, status string, eff_ts timestamp",
    )
    merged = merge.merge_scd2(hist, upd, "k")
    facts = spark.createDataFrame(
        [(1, dt.datetime(2026, 1, 15)), (1, dt.datetime(2026, 3, 1))],
        "k long, ship_ts timestamp",
    )
    from pyspark.sql import functions as F

    pit = facts.join(merged, "k").filter(
        (F.col("ship_ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ship_ts") < F.col("valid_to")))
    )
    got = {r.ship_ts.month: r.status for r in pit.collect()}
    assert got == {1: "A", 3: "B"}


def test_lang_source_chi2_independent_vs_dependent(spark):
    """A perfectly independent contingency gives chi2 == 0; a fully
    source-determined language gives a large chi2 (== n * (k-1) for a
    k×k diagonal table)."""
    indep = spark.createDataFrame(
        [(i, "l%d" % (i % 2), "s%d" % ((i // 2) % 2), 10) for i in range(40)],
        "doc_id long, lang string, source string, n_chars long",
    )
    r = validation.lang_source_chi2({"documents": indep}).collect()[0]
    assert r.chi2 == 0.0
    assert r.dof == 1
    dep = spark.createDataFrame(
        [(i, "l%d" % (i % 2), "s%d" % (i % 2), 10) for i in range(40)],
        "doc_id long, lang string, source string, n_chars long",
    )
    r2 = validation.lang_source_chi2({"documents": dep}).collect()[0]
    assert r2.chi2 == 40.0  # n*(k-1) for a 2x2 diagonal table
    assert r2.dof == 1


def test_order_total_consistency_detects_and_passes(spark):
    """A reconciled order counts as consistent (within 1 cent); a
    broken one shows up in the diff stats."""
    li = spark.createDataFrame(
        [
            (1, 100.0, 0.1, 0.05),   # 100*1.1*0.95 = 104.50
            (1, 50.0, 0.0, 0.0),     # 50.00 -> order 1 total 154.50
            (2, 10.0, 0.0, 0.0),     # order 2 total 10.00
        ],
        "l_orderkey long, l_extendedprice double, l_tax double, l_discount double",
    )
    orders = spark.createDataFrame(
        [(1, 154.50), (2, 99.99)],
        "o_orderkey long, o_totalprice double",
    )
    r = validation.order_total_consistency(
        {"lineitem": li, "orders": orders}
    ).collect()[0]
    assert r.n_orders_with_items == 2
    assert r.n_consistent == 1
    assert r.max_abs_diff_cents == 8999          # 99.99 vs 10.00
    assert r.sum_abs_diff_cents == 8999


def test_lang_source_chi2_null_category(spark):
    """NULL lang is a real contingency category: its observed cell must
    rejoin the grid (null-safe), and dof must count it."""
    rows = [(i, "en", "s%d" % (i % 2), 10) for i in range(20)] + [
        (100 + i, None, "s0", 10) for i in range(4)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars long"
    )
    r = validation.lang_source_chi2({"documents": df}).collect()[0]
    assert r.dof == 1          # 2 langs (en, NULL) x 2 sources
    assert r.n_cells == 4
    # hand check: O = [[10,10],[4,0]]; margins rt=[20,4], ct=[14,10], n=24
    import math

    def term(o, e):
        return math.floor((o - e) * (o - e) / e * 1e9 + 0.5)

    exp = sum(
        term(o, rt * ct / 24)
        for o, rt, ct in [
            (10, 20.0, 14), (10, 20.0, 10), (4, 4.0, 14), (0, 4.0, 10)
        ]
    )
    assert r.chi2 == round(exp / 1e9, 4)


def test_conformal_interval_on_perfect_line(spark):
    """A perfectly linear revenue series: the OLS fit is exact, every
    residual collapses to ~0 on the micro lattice, the conformal
    radius is ~0, and the holdout is fully covered. Split arithmetic
    pinned: 10 days at 70% -> 7 calibration / 3 test."""
    from datetime import datetime

    from training_etl_demo_2_spark.operators import validation

    rows = []
    for day in range(10):
        # two orders per day summing to exactly (1000 + 50*day) dollars
        for part in (0.25, 0.75):
            rows.append(
                (
                    datetime(2024, 3, 1 + day),
                    (1000.0 + 50.0 * day) * part,
                )
            )
    orders = spark.createDataFrame(
        rows, "o_orderdate timestamp, o_totalprice double"
    )
    out = validation.conformal_revenue_interval({"orders": orders}).collect()[
        0
    ]
    assert out.n_cal == 7 and out.n_test == 3
    assert abs(out.slope_cents_per_day_r4 - 5000.0) < 0.01
    assert out.radius_usd_r2 <= 0.01
    assert out.coverage_bp == 10000
    assert out.nominal_bp == 9000
