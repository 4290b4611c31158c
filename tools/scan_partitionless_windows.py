"""One-off scanner for the round-10 plan-audit extension: find every
registered query whose physical plan contains (a) a Window /
WindowGroupLimit node with NO partition spec over a not-provably-
bounded input, or (b) a global Sort whose child is not a fresh
Exchange — the shapes that funnel a whole relation through one task
WITHOUT emitting the `Exchange SinglePartition` node the round-9
detector keys on (post-limit or post-coalesce(1) children are already
single-partition, so no exchange is inserted and the round-9 audit is
blind to them).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import __spark_entry__ as entrymod  # noqa: E402

# The Window/WindowGroupLimit discriminators live in the CI detector
# (tests/test_plan_shapes.py) — import them so this one-off tool can
# never diverge from the assertion it mirrors. The tool adds only the
# broader global-Sort-without-exchange sweep the CI deliberately
# omits (global Sorts self-heal at scale: Spark inserts a range
# exchange the moment the child is multi-partition).
from test_plan_shapes import (  # noqa: E402
    _strip_node,
    _tree_depth,
    _unbounded_partitionless_windows,
)


def partitionless_window_sort_nodes(plan: str) -> list[str]:
    hits = ["W: " + n[:160] for n in _unbounded_partitionless_windows(plan)]
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        node = _strip_node(line)
        if node.startswith("Sort ") and ", true," in node:
            d = _tree_depth(line)
            child = None
            for j in range(i + 1, len(lines)):
                if _tree_depth(lines[j]) > d:
                    child = lines[j].strip(" :+-")
                    break
            if child is not None and not child.startswith(
                ("Exchange ", "ReusedExchange", "ShuffleQueryStage",
                 "AQEShuffleRead")
            ):
                hits.append(f"S: {node[:80]} <- {child[:80]}")
    return hits


STREAMING = {
    "stream_hourly_stats", "stream_user_nation_stats",
    "stream_value_anomalies", "stream_hourly_users",
    "stream_sliding_stats", "stream_click_attribution",
    "stream_session_stats", "stream_click_funnel_loss",
    "stream_funnel_two_sided", "stream_pack_sequences",
}


def main() -> int:
    from training_etl_demo_2_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/planscan.txt"
    spark = get_spark(app_name="plan-scan")
    n_hit = 0
    out = []
    for name, fn in entrymod.queries().items():
        if name in STREAMING:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            out.append(f"{name}: ERROR {e}")
            continue
        hits = partitionless_window_sort_nodes(plan)
        if hits:
            n_hit += 1
            out.append(f"{name}:")
            out.extend(f"    {h}" for h in hits)
    out.append(f"\n{n_hit} queries with partition-spec-less window/sort nodes")
    with open(out_path, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {out_path} ({n_hit} flagged)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
