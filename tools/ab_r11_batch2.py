"""Round-11 same-session A/B batch 2: streaming checkpoint placement,
corpus_pipeline_e2e span-tier persist, and the spread_scan driver-probe
cost (VERDICT r10 items 5-7).

Arms alternate inside one session (the only trustworthy instrument on
this time-shared host).

Usage: python tools/ab_r11_batch2.py [reps] [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import training_etl_demo_2_spark.streaming.fixture_queries as fq  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

STREAM_QUERIES = ["stream_hourly_stats", "stream_session_stats",
                  "stream_near_dup", "stream_hll_users"]


def _replay_tmpfs(result, name, timeout_s=300.0, partitions=None):
    """_replay_to_table with an explicit tmpfs checkpoint (and an
    optional state-partition override)."""
    spark = result.sparkSession
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    spark.conf.set(key, str(partitions or fq.REPLAY_SHUFFLE_PARTITIONS))
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    ckpt = tempfile.mkdtemp(prefix=f"ab_ckpt_{name}_", dir=base)
    try:
        q = (
            result.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            if not q.awaitTermination(timeout_s):
                raise TimeoutError(f"stream {name} did not drain")
        finally:
            q.stop()
    finally:
        spark.conf.set(key, old)
        shutil.rmtree(ckpt, ignore_errors=True)


def corpus_e2e_s6_persist(spark, sf_dir):
    """corpus_pipeline_e2e with the span-cleaned relation (s6)
    persisted before packing (arm B)."""
    from training_etl_demo_2_spark.cache import tracked_persist
    from training_etl_demo_2_spark.io import load_tables
    from training_etl_demo_2_spark.operators.curation import pack_sequences
    from training_etl_demo_2_spark.operators.dedup import (
        drop_exact_duplicates,
        near_dup_clusters,
        remove_duplicate_spans,
    )
    from training_etl_demo_2_spark.operators.text import (
        gopher_quality_rules,
        language_id,
        scrub_pii,
    )
    from training_etl_demo_2_spark.plans.corpus_pipeline import (
        PIPE_BUDGET,
        PIPE_LANG,
    )

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    s1 = tracked_persist(
        docs.join(
            gopher_quality_rules(docs).filter("pass_all").select("doc_id"),
            "doc_id",
            "left_semi",
        )
    )
    s2 = s1.join(
        language_id(s1).filter(F.col("lang_pred") == PIPE_LANG).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    s3 = scrub_pii(s2).select("doc_id", F.col("clean_text").alias("text"))
    s4 = tracked_persist(drop_exact_duplicates(s3))
    members = near_dup_clusters(s4)
    sized = s4.select("doc_id", F.length("text").cast("long").alias("n_chars"))
    reps = (
        members.join(sized, "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.max(
                F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("neg_id"))
            ).alias("rep")
        )
        .select((-F.col("rep.neg_id")).cast("long").alias("doc_id"))
    )
    survivors = (
        s4.join(members.select("doc_id"), "doc_id", "left_anti")
        .select("doc_id")
        .unionByName(reps)
    )
    s5 = tracked_persist(s4.join(survivors, "doc_id", "left_semi"))
    s6 = tracked_persist(
        remove_duplicate_spans(s5)
        .filter(F.col("clean_text") != "")
        .select("doc_id", F.col("clean_text").alias("text"))
    )
    return pack_sequences(s6, budget=PIPE_BUDGET).select(
        "doc_id", "n_tokens", "pack_id"
    )


def main() -> None:
    import numpy as np

    import __spark_entry__ as entrymod
    from training_etl_demo_2_spark.io import load_tables
    from training_etl_demo_2_spark.session import get_spark

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    spark = get_spark(app_name="ab_r11_b2")
    reg = entrymod.queries()

    def calib() -> float:
        a = np.random.RandomState(0).rand(1200, 1200)
        t0 = time.perf_counter()
        for _ in range(4):
            a = 0.5 * (a @ a) / np.linalg.norm(a)
        return round(time.perf_counter() - t0, 3)

    def timed(build):
        t0 = time.perf_counter()
        n = build().count()
        dt = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        return dt, n

    results: dict[str, dict] = {}
    report = {"sf_dir": SF_DIR, "reps": reps, "calib_before": calib(),
              "results": results}

    # --- spread_scan probe cost (measure only) ---------------------------
    t = load_tables(spark, SF_DIR)
    docs = t["documents"]
    docs.count()  # warm file listing
    t0 = time.perf_counter()
    n_probe = 20
    for _ in range(n_probe):
        docs.rdd.getNumPartitions()
    dt_rdd = (time.perf_counter() - t0) / n_probe
    t0 = time.perf_counter()
    for _ in range(n_probe):
        (docs.sparkSession.sparkContext.applicationId,
         docs._jdf.queryExecution().analyzed().semanticHash())
    dt_hash = (time.perf_counter() - t0) / n_probe
    results["spread_scan_probe"] = {
        "rdd_getNumPartitions_s": round(dt_rdd, 4),
        "semanticHash_key_s": round(dt_hash, 5),
    }
    print(f"# probe: .rdd {dt_rdd:.4f}s vs semanticHash {dt_hash:.5f}s",
          file=sys.stderr)

    # --- corpus_pipeline_e2e: current vs s6-persist -----------------------
    cases = [(
        "corpus_pipeline_e2e",
        lambda: reg["corpus_pipeline_e2e"](spark, SF_DIR),
        lambda: corpus_e2e_s6_persist(spark, SF_DIR),
    )]
    # warmup
    reg["corpus_pipeline_e2e"](spark, "/root/testdata/sf0.001").count()
    spark.catalog.clearCache()
    for name, build_a, build_b in cases:
        a_times, b_times = [], []
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
            "A_current": a_times, "B_s6_persist": b_times,
            "median_A": med_a, "median_B": med_b,
            "ratio_B_over_A": round(med_b / med_a, 3),
            "rowcounts": sorted(str(r) for r in rows),
        }
        print(f"# {name}: A med {med_a:.3f} {a_times} | B med {med_b:.3f} "
              f"{b_times} | B/A {med_b / med_a:.3f}", file=sys.stderr)

    # --- streaming: default /tmp ckpt vs tmpfs ckpt vs tmpfs+4 parts ------
    orig_replay = fq._replay_to_table
    for qname in STREAM_QUERIES:
        fn = reg[qname]
        arms: dict[str, list[float]] = {"A_tmp": [], "B_shm": [], "C_shm4": []}
        for _ in range(reps):
            fq._replay_to_table = orig_replay
            dt, _n = timed(lambda: fn(spark, SF_DIR))
            arms["A_tmp"].append(dt)
            fq._replay_to_table = (
                lambda r, nm, timeout_s=300.0: _replay_tmpfs(r, nm, timeout_s)
            )
            dt, _n = timed(lambda: fn(spark, SF_DIR))
            arms["B_shm"].append(dt)
            fq._replay_to_table = (
                lambda r, nm, timeout_s=300.0: _replay_tmpfs(
                    r, nm, timeout_s, partitions=4
                )
            )
            dt, _n = timed(lambda: fn(spark, SF_DIR))
            arms["C_shm4"].append(dt)
        fq._replay_to_table = orig_replay
        meds = {k: statistics.median(v) for k, v in arms.items()}
        results[qname] = {**arms, "medians": meds,
                          "B_over_A": round(meds["B_shm"] / meds["A_tmp"], 3),
                          "C_over_A": round(meds["C_shm4"] / meds["A_tmp"], 3)}
        print(f"# {qname}: {meds} B/A "
              f"{meds['B_shm'] / meds['A_tmp']:.3f} C/A "
              f"{meds['C_shm4'] / meds['A_tmp']:.3f}", file=sys.stderr)

    report["calib_after"] = calib()
    line = json.dumps(report)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
