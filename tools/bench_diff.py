"""Calibration-normalized bench comparison.

The bench host is time-shared and swings 4-10x in effective CPU speed
between runs; raw wall-clock diffs between two BENCH.json files mostly
measure the host, not the code. This tool divides each run's timings
by its own matmul calibration (the mean of the before/after probes
bench.py records) and reports per-query normalized ratios, so a real
plan regression stands out from machine noise.

Usage: python tools/bench_diff.py OLD.json NEW.json [threshold]
  threshold: flag queries whose normalized ratio exceeds it (default 1.5)

Reads git revisions too: `python tools/bench_diff.py HEAD~5:BENCH.json
BENCH.json` compares the committed bench five commits back against the
working tree.
"""

from __future__ import annotations

import json
import subprocess
import sys


def load(ref: str) -> dict:
    if ":" in ref and not ref.endswith(".json") or ref.count(":") == 1 and "/" not in ref.split(":")[0]:
        out = subprocess.run(
            ["git", "show", ref], capture_output=True, text=True
        )
        if out.returncode == 0:
            return json.loads(out.stdout)
    with open(ref) as f:
        return json.load(f)


def calib_of(d: dict) -> float:
    c = d.get("calib_matmul_s") or [1.0]
    vals = [v for v in c if isinstance(v, (int, float)) and v > 0]
    return sum(vals) / len(vals) if vals else 1.0


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    co, cn = calib_of(old), calib_of(new)
    print(f"calibration: old {co:.3f}s  new {cn:.3f}s  (host speed ratio {cn/co:.2f}x)")
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    tot_o = sum(oq[q] for q in common)
    tot_n = sum(nq[q] for q in common)
    print(
        f"common {len(common)}: raw {tot_o:.1f}s -> {tot_n:.1f}s "
        f"(x{tot_n/tot_o:.2f});  normalized x{(tot_n/cn)/(tot_o/co):.2f}"
    )
    flagged = []
    for q in common:
        if oq[q] < 0.2:  # below timing noise floor
            continue
        ratio = (nq[q] / cn) / (oq[q] / co)
        if ratio > thr:
            flagged.append((ratio, q, oq[q], nq[q]))
    for ratio, q, o, n in sorted(flagged, reverse=True):
        print(f"  REGRESSED x{ratio:.2f}  {q}: {o:.2f}s -> {n:.2f}s")
    added = sorted(set(nq) - set(oq))
    if added:
        print(f"new queries ({len(added)}): " + ", ".join(
            f"{q}={nq[q]:.2f}s" for q in added))
    if not flagged:
        print("no normalized regressions above threshold")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
