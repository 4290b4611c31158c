"""CI oracle sweep: every oracle-backed query vs DuckDB at sf0.001.

This is the in-repo mirror of the driver's correctness gate — the test
that turns a silent fixture/environment drift (e.g. the round-3
events.ts encoding change from TIMESTAMP(NANOS) to timestamp[us]) into
a red test run instead of a red round. Any hash-level divergence between
a registered Spark query and its declared oracle SQL fails here first.
"""

from __future__ import annotations

import pytest

from tools.check_oracle import sweep


@pytest.mark.slow
def test_all_oracle_queries_match(spark, sf_dir):
    report = sweep(spark, sf_dir)
    failures = {n: p for n, p in report.items() if p}
    rows_only = [n for n, p in report.items() if p is None]
    assert not failures, (
        f"{len(failures)} oracle mismatches: "
        + "; ".join(f"{n}: {p}" for n, p in failures.items())
    )
    # The rows-only set is declared-by-design; growth means an operator
    # shipped without its oracle twin — keep the list explicit so adding
    # a query forces a conscious decision here.
    assert sorted(rows_only) == sorted(ROWS_ONLY_DECLARED), (
        f"rows-only set drifted: {sorted(rows_only)} vs declared "
        f"{sorted(ROWS_ONLY_DECLARED)}"
    )


ROWS_ONLY_DECLARED = [
    # only the genuinely engine-specific pair remains: zlib byte
    # streams (compression_ratio) and the media codec stub
    # (media_near_dups). pca_projection left this list in round 6
    # (exact-integer power iteration with a full SQL twin);
    # sketch_user_stats and data_profile_lineitem_approx left in round
    # 8 (re-based from DataSketches HLL onto the engine-owned
    # explicit-register HLL, whose estimate a DuckDB twin reproduces
    # bit-for-bit — see sketches.user_stats_register_hll /
    # hll_column_profile)
    "media_near_dups",
    "compression_ratio",
]
