"""Round-11 same-session inline A/B for the four sites VERDICT r10
flagged as unproven (the only trustworthy instrument on this
time-shared host — see OPTIMIZATION_r10.md "Method").

Arms are alternated A,B,A,B,... inside ONE Spark session with the
cache cleared between reps, so both arms see the same contention
window. Hash sites: arm A = composed per-token hashing
(word_ngram_hashes, r10), arm B = the pre-r10 string formulation
(transform(word_ngrams, rolling_hash)). lexical_semantic_agreement:
arm A = r10 persist on the semantic pair relation, arm B = no persist.

Usage: python tools/ab_r11_unproven.py [reps] [out.json]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import training_etl_demo_2_spark.functions as fns  # noqa: E402
import training_etl_demo_2_spark.operators.dedup as dedup  # noqa: E402
import training_etl_demo_2_spark.operators.text as text  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HASH_QUERIES = [
    "token_loop_stats",
    "substring_dup_stats",
    "duplicate_spans",
    "remove_duplicate_spans",
    "decontaminate_spans",
]


def old_hash(tokens, n, base=31, mod=fns.FNV_MOD):
    """Pre-r10 formulation: materialize each shingle string, char-fold it."""
    return F.transform(
        fns.word_ngrams(tokens, n), lambda g: fns.rolling_hash(g, base, mod)
    )


def lex_sem_nopersist(spark, sf_dir):
    """lexical_semantic_agreement with the r10 sem persist removed."""
    from training_etl_demo_2_spark.io import load_tables
    from training_etl_demo_2_spark.operators.dedup import minhash_lsh_pairs
    from training_etl_demo_2_spark.operators.similarity import (
        cosine_near_pairs,
    )

    t = load_tables(spark, sf_dir)
    lex = minhash_lsh_pairs(t["documents"], threshold=0.8).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    sem = cosine_near_pairs(t["embeddings"], threshold=0.45).select(
        F.col("vec_a").alias("a"), F.col("vec_b").alias("b")
    )
    both = lex.join(sem, ["a", "b"])
    counts = (
        lex.agg(F.count(F.lit(1)).cast("long").alias("n_lex"))
        .crossJoin(sem.agg(F.count(F.lit(1)).cast("long").alias("n_sem")))
        .crossJoin(both.agg(F.count(F.lit(1)).cast("long").alias("n_both")))
    )
    return counts.select(
        "n_lex",
        "n_sem",
        "n_both",
        (F.col("n_lex") + F.col("n_sem") - F.col("n_both")).alias(
            "union_pairs"
        ),
        F.when(
            F.col("n_lex") + F.col("n_sem") - F.col("n_both") > 0,
            F.expr("(n_both * 10000) div (n_lex + n_sem - n_both)"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("jaccard_bp"),
    )


def main() -> None:
    import numpy as np

    import __spark_entry__ as entrymod
    from training_etl_demo_2_spark.session import get_spark

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    spark = get_spark(app_name="ab_r11")
    reg = entrymod.queries()

    def calib() -> float:
        a = np.random.RandomState(0).rand(1200, 1200)
        t0 = time.perf_counter()
        for _ in range(4):
            a = 0.5 * (a @ a) / np.linalg.norm(a)
        return round(time.perf_counter() - t0, 3)

    def timed(build) -> tuple[float, int]:
        t0 = time.perf_counter()
        n = build().count()
        dt = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        return dt, n

    def patched_build(name):
        def build():
            saved = (dedup.word_ngram_hashes, text.word_ngram_hashes)
            dedup.word_ngram_hashes = old_hash
            text.word_ngram_hashes = old_hash
            try:
                return reg[name](spark, SF_DIR)
            finally:
                dedup.word_ngram_hashes, text.word_ngram_hashes = saved

        return build

    # Warm the session (JIT/codegen) on both formulations once.
    reg["token_loop_stats"](spark, "/root/testdata/sf0.001").count()
    patched_build("token_loop_stats")()  # build only; cheap
    spark.catalog.clearCache()

    results: dict[str, dict] = {}
    report = {"sf_dir": SF_DIR, "reps": reps, "calib_before": calib(),
              "results": results}

    cases: list[tuple[str, object, object]] = [
        (name, lambda nm=name: reg[nm](spark, SF_DIR), patched_build(name))
        for name in HASH_QUERIES
    ] + [
        (
            "lexical_semantic_agreement",
            lambda: reg["lexical_semantic_agreement"](spark, SF_DIR),
            lambda: lex_sem_nopersist(spark, SF_DIR),
        )
    ]

    for name, build_a, build_b in cases:
        a_times: list[float] = []
        b_times: list[float] = []
        rows = set()
        for _ in range(reps):
            dt, n = timed(build_a)
            a_times.append(dt)
            rows.add(("A", n))
            dt, n = timed(build_b)
            b_times.append(dt)
            rows.add(("B", n))
        med_a, med_b = statistics.median(a_times), statistics.median(b_times)
        results[name] = {
            "A_current": a_times,
            "B_old": b_times,
            "median_A": med_a,
            "median_B": med_b,
            "ratio_A_over_B": round(med_a / med_b, 3) if med_b else None,
            "rowcounts": sorted(str(r) for r in rows),
        }
        print(f"# {name}: A(current) med {med_a:.3f}s {a_times} | "
              f"B(old) med {med_b:.3f}s {b_times} | "
              f"A/B {med_a / med_b:.3f}", file=sys.stderr)

    report["calib_after"] = calib()
    line = json.dumps(report)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
