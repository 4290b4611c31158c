"""Planted tests for the minimax-PAV isotonic calibration."""

from __future__ import annotations

import datetime as dt

from training_etl_demo_2_spark.operators import validation


def _events(spark, rows):
    # rows: (event_id, value, event_type)
    t = dt.datetime(2024, 1, 5)
    return {
        "events": spark.createDataFrame(
            [(i, t, i, ty, v, "{}") for (i, v, ty) in rows],
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        )
    }


def _pav_fit(bin_stats):
    """PAV over ordered (y, n) bins; returns one fitted value per bin."""
    blocks = [[y, n, 1] for (y, n) in bin_stats]  # y, n, n_bins_merged
    i = 0
    while i < len(blocks) - 1:
        a, b = blocks[i], blocks[i + 1]
        if a[0] * b[1] > b[0] * a[1]:
            blocks[i] = [a[0] + b[0], a[1] + b[1], a[2] + b[2]]
            del blocks[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    fitted = []
    for y, n, m in blocks:
        fitted.extend([y / n] * m)
    return fitted


def test_isotonic_matches_textbook_pav(spark):
    # bins at values 8, 24, 40, 56 (widths 16): rates 1.0, 0.0, 0.5, 1.0
    # -> PAV pools bins 0+1 to 0.5, then 0.5 <= 0.5 <= 1.0 holds.
    rows = []
    eid = 0
    for v, rate_pair in [(8.0, (2, 2)), (24.0, (0, 2)), (40.0, (1, 2)), (56.0, (2, 2))]:
        y, n = rate_pair
        for j in range(n):
            rows.append((eid, v, "purchase" if j < y else "click"))
            eid += 1
    out = validation.isotonic_calibration(_events(spark, rows)).collect()
    got = [r["iso_r6"] for r in out]
    want = _pav_fit([(2, 2), (0, 2), (1, 2), (2, 2)])
    assert got == [round(x, 6) for x in want]
    # pooled blocks: [2+0]/4 = 0.5, 0.5, 1.0
    assert got == [0.5, 0.5, 0.5, 1.0]


def test_isotonic_already_monotone_is_identity(spark):
    rows = []
    eid = 0
    for v, (y, n) in [(8.0, (0, 4)), (24.0, (1, 4)), (40.0, (3, 4))]:
        for j in range(n):
            rows.append((eid, v, "purchase" if j < y else "view"))
            eid += 1
    out = validation.isotonic_calibration(_events(spark, rows)).collect()
    assert [r["iso_r6"] for r in out] == [r["rate_r6"] for r in out]


def test_isotonic_output_is_monotone_on_fixture(tables):
    out = validation.isotonic_calibration(tables).collect()
    fit = [r["iso_r6"] for r in out]
    assert fit == sorted(fit)
    # fitted values stay within the observed-rate hull
    assert min(fit) >= 0.0 and max(fit) <= 1.0
