"""Watermark late-data semantics: events arriving after the watermark
has passed their window are DROPPED from the aggregate — the bound that
makes streaming state finite. The other streaming tests replay in-order
data where the watermark never fires; this pins the drop itself.

Semantics pinned here (Spark >= 3.4 watermark split):

* late-event filtering uses the PREVIOUS batch's watermark, state
  eviction the current one — so a row is only guaranteed dropped when
  it arrives >= 2 batches after the data that advanced the watermark
  past its window (the engine's documented contract is "guaranteed
  kept within the delay, best-effort dropped beyond it");
* rows inside the allowed lateness always aggregate (control test).

Deterministic replay: explicit single-file micro-batches whose
processing order is fixed via file modification times (FileStreamSource
lists oldest-first), maxFilesPerTrigger=1, availableNow.
"""

from __future__ import annotations

import datetime
import glob
import os
import shutil

from pyspark.sql import functions as F

from training_etl_demo_2_spark.streaming import windowed


def _one_file(spark, rows, out_dir, name, mtime):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    tmp = str(out_dir) + f"_stage_{name}"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    os.makedirs(out_dir, exist_ok=True)
    src = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    dst = os.path.join(str(out_dir), f"{name}.parquet")
    shutil.copy(src, dst)
    os.utime(dst, (mtime, mtime))


def _run(spark, in_dir, watermark, sink_name):
    stream = windowed.read_events_stream(spark, str(in_dir))
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.date_format("win.start", "HH:mm").alias("h"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    drained = q.awaitTermination(120)
    q.stop()
    if not drained:
        raise TimeoutError(f"{sink_name} replay did not drain in 120s")
    dropped = sum(
        p["stateOperators"][0]["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        if p["stateOperators"]
    )
    out = {}
    for r in spark.table(sink_name).collect():
        out[r.h] = max(out.get(r.h, 0), r.n)
    return out, dropped


def _ts(h, m):
    return datetime.datetime(2024, 1, 1, h, m)


BATCH1 = [
    (1, _ts(0, 30), 1, "click", 1.0, "{}"),
    (2, _ts(1, 30), 1, "click", 1.0, "{}"),
    (3, _ts(2, 30), 1, "click", 1.0, "{}"),
    (4, _ts(3, 30), 1, "click", 1.0, "{}"),  # max 03:30 -> wm 02:30
]
BATCH2 = [(6, _ts(4, 30), 1, "click", 1.0, "{}")]  # advances wm to 03:30
BATCH3 = [(5, _ts(0, 45), 1, "click", 1.0, "{}")]  # LATE: 00:45 << 02:30


def _write_all(spark, in_dir):
    _one_file(spark, BATCH1, in_dir, "b1", 1_000_000_000)
    _one_file(spark, BATCH2, in_dir, "b2", 1_000_001_000)
    _one_file(spark, BATCH3, in_dir, "b3", 1_000_002_000)


def test_watermark_drops_late_events(spark, tmp_path):
    in_dir = tmp_path / "late_in"
    _write_all(spark, in_dir)

    got, dropped = _run(spark, in_dir, "1 hour", "late_drop_sink")
    # the engine counted exactly one watermark drop...
    assert dropped == 1
    # ...and it was the 00:45 straggler: window 00:00 never saw it
    assert got["00:00"] == 1
    # on-time rows all landed
    assert got["01:00"] == 1 and got["04:00"] == 1


def test_generous_watermark_keeps_late_events(spark, tmp_path):
    in_dir = tmp_path / "late_in_ctl"
    _write_all(spark, in_dir)

    got, dropped = _run(spark, in_dir, "10 hours", "late_keep_sink")
    # allowed lateness covers the 00:45 arrival: it folds into 00:00
    assert dropped == 0
    assert got["00:00"] == 2
    assert got["01:00"] == 1 and got["04:00"] == 1
