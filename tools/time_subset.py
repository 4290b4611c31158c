"""Time a subset of registered queries with bench.py's methodology
(count() materialization, clearCache between queries, JIT warmup) —
the optimization round's before/after instrument. Does NOT touch
BENCH.json.

Usage: python tools/time_subset.py out.json query [query ...]
       SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import numpy as np

    import __spark_entry__ as entrymod
    from training_etl_demo_2_spark.session import get_spark

    out_path = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="time_subset")

    def calib() -> float:
        a = np.random.RandomState(0).rand(1200, 1200)
        t0 = time.perf_counter()
        for _ in range(4):
            a = 0.5 * (a @ a) / np.linalg.norm(a)
        return round(time.perf_counter() - t0, 3)

    entrymod.entry(spark).count()
    registry = entrymod.queries()
    for wq in ("doc_fingerprints", "bigram_counts", "top_orders_per_customer"):
        try:
            registry[wq](spark, "/root/testdata/sf0.001").count()
        except Exception:
            pass

    reps = int(os.environ.get("SUBSET_REPS", "2"))
    out: dict[str, dict] = {}
    c0 = calib()
    for name in names:
        fn = registry[name]
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            ts.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        out[name] = {"s": min(ts), "all": ts, "rows": n}
        print(f"# {name}: {min(ts):.3f}s {ts} ({n} rows)", file=sys.stderr)
    c1 = calib()
    payload = {"calib": [c0, c1], "sf_dir": sf_dir, "queries": out,
               "total_min_s": round(sum(v["s"] for v in out.values()), 3)}
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({"total_min_s": payload["total_min_s"],
                      "calib": [c0, c1]}))


if __name__ == "__main__":
    main()
