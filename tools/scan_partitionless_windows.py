"""One-off scanner for the round-10 plan-audit extension: find every
registered query whose physical plan contains (a) a Window /
WindowGroupLimit node with NO partition spec, or (b) a global Sort
whose child is not a fresh Exchange — the shapes that funnel a whole
relation through one task WITHOUT emitting the `Exchange
SinglePartition` node the round-9 detector keys on (post-limit or
post-coalesce(1) children are already single-partition, so no
exchange is inserted and the round-9 audit is blind to them).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import __spark_entry__ as entrymod  # noqa: E402


def _tree_depth(line: str) -> int:
    return len(line) - len(line.lstrip(" :+-"))


def _top_level_groups(s: str) -> int:
    depth = 0
    groups = 0
    for ch in s:
        if ch == "[":
            if depth == 0:
                groups += 1
            depth += 1
        elif ch == "]":
            depth -= 1
    return groups


def _first_spec_arg(node: str) -> str | None:
    """First top-level argument inside the node's first
    windowspecdefinition(...) — a plain column means PARTITIONED; an
    `X ASC/DESC NULLS ...` order column or a direct
    specifiedwindowframe(...) means NO partition spec."""
    key = "windowspecdefinition("
    start = node.find(key)
    if start < 0:
        return None
    depth = 0
    buf = []
    for ch in node[start + len(key):]:
        if ch == "(":
            depth += 1
        elif ch == ")":
            if depth == 0:
                break
            depth -= 1
        elif ch == "," and depth == 0:
            break
        buf.append(ch)
    return "".join(buf).strip()


def _window_is_unpartitioned(node: str) -> bool:
    arg = _first_spec_arg(node)
    if arg is None:
        return False
    return arg.startswith("specifiedwindowframe(") or (
        " ASC NULLS" in arg or " DESC NULLS" in arg
    )


def partitionless_window_sort_nodes(plan: str) -> list[str]:
    lines = plan.splitlines()
    hits = []
    for i, line in enumerate(lines):
        node = line.strip(" :+-")
        if node.startswith("*("):
            node = node.split(") ", 1)[1]
        if node.startswith(("Window ", "Window[")):
            if _window_is_unpartitioned(node):
                hits.append("W: " + node[:160])
        elif node.startswith("WindowGroupLimit"):
            if _top_level_groups(node[len("WindowGroupLimit"):]) < 2:
                hits.append("WGL: " + node[:160])
        elif node.startswith("Sort ") and ", true," in node:
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
