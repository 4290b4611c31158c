"""Benchmark harness: times every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output is truncation-proof (round-2 lesson: the per-query JSON line
outgrew the driver's stdout tail window and the round lost its
machine-readable total): stdout carries the COMPACT summary line LAST
(totals + calibration, guaranteed to fit any tail window) after the
full per-query line, and both lines are also written to BENCH.json in
the repo root so the numbers survive regardless of how stdout is
captured.

Each query is timed end-to-end (plan build + execution to a count-style
materialization). A warmup query first JIT-warms the session so timings
reflect steady-state execution, not JVM startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import __spark_entry__ as entrymod
    from training_etl_demo_2_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    spark = get_spark(app_name="bench")
    # Host calibration: the bench box is time-shared and its effective
    # CPU speed swings ~4-10x between runs (measured). A fixed
    # single-thread BLAS burst taken before and after the sweep gives
    # the reader a normalization denominator for cross-run comparisons.
    import numpy as np

    def calib() -> float:
        a = np.random.RandomState(0).rand(1200, 1200)
        t0 = time.perf_counter()
        for _ in range(4):
            a = 0.5 * (a @ a) / np.linalg.norm(a)
        return round(time.perf_counter() - t0, 3)

    calib_before = calib()

    # Warmup: JIT/codegen-warm the hot expression families (explode/agg,
    # shingle hashing, window ranking) at sf0.001 so first-timed queries
    # measure steady state, not C2 compilation.
    entrymod.entry(spark).count()
    warm = entrymod.queries()
    for wq in ("doc_fingerprints", "bigram_counts", "top_orders_per_customer"):
        try:
            warm[wq](spark, "/root/testdata/sf0.001").count()
        except Exception:
            pass

    # Error-isolated sweep (round-3 lesson: one AnalysisException aborted
    # the whole run before any summary printed, zeroing the round's bench
    # artifact): a failing query records an error entry and the sweep
    # keeps timing the rest.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in entrymod.queries().items():
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            n = df.count()
        except Exception as exc:  # noqa: BLE001 — sweep must survive
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"# {name}: ERROR {errors[name][:120]}", file=sys.stderr)
            continue
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)
        # Operators persist intra-query intermediates (shingle/band/edge
        # relations) for within-plan reuse and intentionally leave
        # unpersist to the harness: dropping the cache between queries
        # keeps 280+ queries' cached blocks from evicting each other and
        # makes per-query timings independent of sweep order.
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    compact = {
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "n_queries": len(timings),
        "n_errors": len(errors),
        "sf": sf_val,
        # single-thread matmul seconds before/after the sweep:
        # normalize cross-run comparisons on a noisy shared host
        "calib_matmul_s": [calib_before, calib()],
    }
    full = {**compact, "queries": timings, "errors": errors}
    # Compact line FIRST and LAST, full per-query line in between: a
    # stdout tail window that clips the (large) per-query line still
    # ends with a complete, parseable summary line, and a head-biased
    # parser finds one up front too.
    print(json.dumps(compact))
    print(json.dumps(full))
    print(json.dumps(compact))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH.json"), "w") as f:
        f.write(json.dumps(full) + "\n")


if __name__ == "__main__":
    main()
