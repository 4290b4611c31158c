"""Planted tests for the Pareto cumulative-share report, the
functional-dependency audit, the per-source Flesch readability score,
and the HLL pairwise-overlap sketch algebra."""

from __future__ import annotations

from training_etl_demo_2_spark.operators import (
    relational_ext,
    sketches,
    text,
    validation,
)


# ---------------------------------------------------------------------------
# revenue_pareto_cumshare
# ---------------------------------------------------------------------------


def _pareto_tables(spark):
    # 3 nations with revenue 70 / 20 / 10 dollars -> exact shares
    # 7000 / 2000 / 1000 bp, cum 7000 / 9000 / 10000 bp.
    nation = spark.createDataFrame(
        [(0, "ALPHA", 0, ""), (1, "BRAVO", 0, ""), (2, "CHARLIE", 0, "")],
        "n_nationkey long, n_name string, n_regionkey long, "
        "n_comment string",
    )
    customer = spark.createDataFrame(
        [(10, 0), (11, 1), (12, 2)],
        "c_custkey long, c_nationkey long",
    )
    orders = spark.createDataFrame(
        [(100, 10), (101, 11), (102, 12)],
        "o_orderkey long, o_custkey long",
    )
    lineitem = spark.createDataFrame(
        [(100, 70.0, 0.0), (101, 20.0, 0.0), (102, 10.0, 0.0)],
        "l_orderkey long, l_extendedprice double, l_discount double",
    )
    return {
        "nation": nation,
        "customer": customer,
        "orders": orders,
        "lineitem": lineitem,
    }


def test_pareto_cumshare_exact_bp(spark):
    rows = relational_ext.revenue_pareto_cumshare(
        _pareto_tables(spark)
    ).collect()
    assert [r["nation"] for r in rows] == ["ALPHA", "BRAVO", "CHARLIE"]
    assert [r["rank"] for r in rows] == [1, 2, 3]
    assert [r["share_bp"] for r in rows] == [7000, 2000, 1000]
    assert [r["cum_share_bp"] for r in rows] == [7000, 9000, 10000]
    # ALPHA enters with cum_before 0%, BRAVO with 70% (< 80% -> in),
    # CHARLIE with 90% (>= 80% -> out)
    assert [r["in_top80"] for r in rows] == [1, 1, 0]
    assert [r["revenue_usd"] for r in rows] == [70.0, 20.0, 10.0]


def test_pareto_cumshare_ties_break_on_name(spark):
    t = _pareto_tables(spark)
    # equal revenue everywhere -> rank purely by name
    t["lineitem"] = t["lineitem"].sparkSession.createDataFrame(
        [(100, 10.0, 0.0), (101, 10.0, 0.0), (102, 10.0, 0.0)],
        "l_orderkey long, l_extendedprice double, l_discount double",
    )
    rows = relational_ext.revenue_pareto_cumshare(t).collect()
    assert [r["nation"] for r in rows] == ["ALPHA", "BRAVO", "CHARLIE"]
    assert [r["share_bp"] for r in rows] == [3333, 3333, 3333]
    assert [r["cum_share_bp"] for r in rows] == [3333, 6666, 10000]


# ---------------------------------------------------------------------------
# functional_dependency_audit
# ---------------------------------------------------------------------------


def _fd_tables(spark, corrupt_nation=False):
    nation_rows = [(0, "ALPHA"), (1, "BRAVO")]
    if corrupt_nation:
        # key 0 maps to TWO names -> one violating LHS group
        nation_rows.append((0, "ALPHA-CORRUPT"))
    return {
        "nation": spark.createDataFrame(
            nation_rows, "n_nationkey long, n_name string"
        ),
        "customer": spark.createDataFrame(
            [(10, "c10"), (11, "c11")], "c_custkey long, c_name string"
        ),
        "part": spark.createDataFrame(
            [(1, "p1")], "p_partkey long, p_name string"
        ),
        "orders": spark.createDataFrame(
            [(100, 10), (101, 11)], "o_orderkey long, o_custkey long"
        ),
        "documents": spark.createDataFrame(
            [(1, "web"), (2, "web")], "doc_id long, source string"
        ),
        "lineitem": spark.createDataFrame(
            [(100, 1, 1), (100, 2, 1), (101, 1, 1)],
            "l_orderkey long, l_linenumber long, l_partkey long",
        ),
    }


def test_fd_audit_all_hold_on_clean_data(spark):
    rows = validation.functional_dependency_audit(_fd_tables(spark)).collect()
    assert len(rows) == len(validation.FD_RULES)
    assert all(r["n_violating"] == 0 and r["fd_holds"] == 1 for r in rows)
    by_tbl = {r["table_name"]: r for r in rows}
    assert by_tbl["lineitem"]["lhs"] == "l_orderkey+l_linenumber"
    assert by_tbl["lineitem"]["n_groups"] == 3


def test_fd_audit_planted_violation(spark):
    rows = validation.functional_dependency_audit(
        _fd_tables(spark, corrupt_nation=True)
    ).collect()
    by_tbl = {r["table_name"]: r for r in rows}
    assert by_tbl["nation"]["n_groups"] == 2
    assert by_tbl["nation"]["n_violating"] == 1
    assert by_tbl["nation"]["fd_holds"] == 0
    # the corruption must not leak into other rules
    assert by_tbl["customer"]["fd_holds"] == 1


# ---------------------------------------------------------------------------
# readability_by_source
# ---------------------------------------------------------------------------


def _docs(spark, rows):
    # rows: (doc_id, text, source)
    return {
        "documents": spark.createDataFrame(
            [(i, tx, "en", s, len(tx)) for (i, tx, s) in rows],
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        )
    }


def test_readability_known_flesch_score(spark):
    # "Hello world. Go now." -> words=4, sentence runs=2,
    # vowel groups: he|llo(2) wo|rld(1) go(1) now(1) = 5
    # score = 206.835 - 1.015*(4/2) - 84.6*(5/4) = 99.055
    out = text.readability_by_source(
        _docs(spark, [(1, "Hello world. Go now.", "web")])
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_docs"] == 1 and r["n_empty"] == 0 and r["n_words"] == 4
    assert abs(r["mean_flesch_r6"] - 99.055) < 1e-6


def test_readability_empty_doc_excluded(spark):
    out = {
        r["source"]: r
        for r in text.readability_by_source(
            _docs(
                spark,
                [
                    (1, "Hello world. Go now.", "web"),
                    (2, "", "web"),
                    (3, "   ", "blank"),
                ],
            )
        ).collect()
    }
    assert out["web"]["n_docs"] == 2
    assert out["web"]["n_empty"] == 1
    # empty doc does not drag the mean
    assert abs(out["web"]["mean_flesch_r6"] - 99.055) < 1e-6
    assert out["blank"]["n_empty"] == 1
    assert out["blank"]["mean_flesch_r6"] is None


def test_readability_sentence_floor(spark):
    # no terminal punctuation -> sentence count floored at 1, not 0
    out = text.readability_by_source(
        _docs(spark, [(1, "no punctuation here at all", "raw")])
    ).collect()[0]
    assert out["mean_flesch_r6"] is not None


# ---------------------------------------------------------------------------
# hll_source_overlap
# ---------------------------------------------------------------------------


def _events(spark, rows):
    # rows: (user_id, event_type)
    return {
        "events": spark.createDataFrame(
            [(u, et, "2024-01-01 00:00:00", 1.0, "s", "{}") for u, et in rows],
            "user_id long, event_type string, ts string, value double, "
            "session_id string, props string",
        )
    }


def test_hll_overlap_planted_half_overlap(spark):
    # view: users 0..999; purchase: users 500..1499
    # exact: |A|=|B|=1000, inter=500, union=1500, jaccard=1/3
    rows = [(u, "view") for u in range(1000)] + [
        (u, "purchase") for u in range(500, 1500)
    ]
    out = sketches.hll_source_overlap(_events(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["type_a"], r["type_b"]) == ("purchase", "view")
    assert r["exact_union"] == 1500
    assert r["exact_inter"] == 500
    assert abs(r["exact_jaccard_r6"] - 0.333333) < 1e-6
    # m=1024 -> RSE ~3.2%; 5-sigma bound on the union estimate for
    # ONE fixed seed; the intersection inherits ~3x that error
    assert abs(r["est_union_r6"] - 1500) / 1500 < 0.16
    assert abs(r["est_inter_r6"] - 500) / 500 < 0.5
    assert 0.0 <= r["est_jaccard_r6"] <= 1.0


def test_hll_overlap_duplicate_insensitive(spark):
    rows = [(u, "view") for u in range(300)] + [
        (u, "purchase") for u in range(150, 450)
    ]
    once = sketches.hll_source_overlap(_events(spark, rows)).collect()[0]
    thrice = sketches.hll_source_overlap(_events(spark, rows * 3)).collect()[0]
    assert once["est_union_r6"] == thrice["est_union_r6"]
    assert once["est_inter_r6"] == thrice["est_inter_r6"]
    assert once["exact_inter"] == thrice["exact_inter"]


def test_hll_overlap_disjoint_types(spark):
    # disjoint audiences -> exact_inter 0, estimate near 0 relative
    # to the union
    rows = [(u, "a") for u in range(800)] + [
        (u, "b") for u in range(10_000, 10_800)
    ]
    r = sketches.hll_source_overlap(_events(spark, rows)).collect()[0]
    assert r["exact_inter"] == 0
    assert r["exact_jaccard_r6"] == 0.0
    assert r["est_jaccard_r6"] < 0.15


def test_hll_overlap_three_types_pair_grid(spark):
    rows = (
        [(u, "a") for u in range(100)]
        + [(u, "b") for u in range(50, 150)]
        + [(u, "c") for u in range(200, 300)]
    )
    out = sketches.hll_source_overlap(_events(spark, rows)).collect()
    # 3 unordered pairs, lexicographic
    assert [(r["type_a"], r["type_b"]) for r in out] == [
        ("a", "b"),
        ("a", "c"),
        ("b", "c"),
    ]
    by = {(r["type_a"], r["type_b"]): r for r in out}
    assert by[("a", "b")]["exact_inter"] == 50
    assert by[("a", "c")]["exact_inter"] == 0
    assert by[("b", "c")]["exact_inter"] == 0
