"""Watermark late-data semantics in UPDATE-mode aggregation, pinned
empirically against this engine build (PySpark 4.1):

- the watermark advances as batches commit (progress eventTime.watermark);
- a 9-hours-late row creates NO state (numRowsTotal never grows for its
  window — the state store refuses below-watermark windows);
- BUT the late row's window update IS emitted to the sink once in the
  batch it arrived, and ``numRowsDroppedByWatermark`` stays 0 — the
  input filter does not count it and does not suppress the emission.

That last point is the production trap this test documents: update-mode
consumers cannot assume "watermark == guaranteed drop"; a below-watermark
window can surface one final update, so downstream MERGE targets must
ignore updates for windows they have already finalized (exactly what
``streaming_cdc_upsert``'s latest-wins fold does). Append mode does not
have this surface — closed windows are simply never re-emitted.
"""

from __future__ import annotations

import glob
import tempfile

from pyspark.sql import functions as F

from sparkstreamingrealtimedatawithkafka_spark.streaming.pipeline import as_stream_dir


def test_late_row_semantics_update_mode(spark):
    work = tempfile.mkdtemp(prefix="ssk_wm_drop_")
    # batch 1: fresh events at t=10h (watermark advances to 10h - 1min);
    # batch 2: one event at t=1h (9h late) + one fresh event.
    b1 = spark.createDataFrame(
        [(1, 36000_000_000), (2, 36060_000_000)], "user_id LONG, ts_us LONG"
    )
    b2 = spark.createDataFrame(
        [(3, 3600_000_000), (4, 36120_000_000)], "user_id LONG, ts_us LONG"
    )
    files = []
    for i, b in enumerate((b1, b2)):
        d = f"{work}/b{i}"
        b.coalesce(1).write.parquet(d)
        files.extend(sorted(glob.glob(f"{d}/part-*.parquet")))
    stream_dir = as_stream_dir(*files)
    raw = (
        spark.readStream.schema("user_id LONG, ts_us LONG")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    counts = (
        raw.withColumn("ts", F.timestamp_micros("ts_us"))
        .withWatermark("ts", "1 minute")
        .groupBy(F.window("ts", "1 hour"))
        .count()
    )
    q = (
        counts.writeStream.format("memory")
        .queryName("wm_drop_probe")
        .outputMode("update")
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    progress = q.recentProgress
    final_wm = max(p["eventTime"].get("watermark", "") for p in progress)
    assert final_wm >= "1970-01-01T10:00:00"
    state_rows = [
        op["numRowsTotal"] for p in progress for op in p.get("stateOperators", [])
    ]
    assert max(state_rows) == 1, f"late row created state: {state_rows}"
    dropped_metric = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in progress
        for op in p.get("stateOperators", [])
    )
    assert dropped_metric == 0  # aggregation drops are NOT in this metric
    # the late window surfaced exactly one count-1 update; the fresh
    # window reached its full count of 3
    final = {}
    for r in spark.sql("SELECT * FROM wm_drop_probe").collect():
        final[r["window"].start] = max(final.get(r["window"].start, 0), r["count"])
    by_hour = {w.hour: c for w, c in final.items()}
    assert by_hour == {10: 3, 1: 1}
