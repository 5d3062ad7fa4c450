"""Watermark semantics made concrete: an event arriving in a later
micro-batch with event time older than (watermark - delay) must be DROPPED
from the windowed aggregation, while the same data in batch mode counts it.
This is the bounded-state contract the engine defaults to (SURVEY.md §2.8).

The two micro-batches are forced deterministically as two availableNow
runs against one checkpoint (the watermark persists in the checkpoint
across restarts — also exercising recovery).
"""

from __future__ import annotations

from pyspark.sql import functions as F

SCHEMA = "event_id long, ts timestamp, event_type string"

# run 1 advances the watermark to 12:00 - 10min = 11:50;
# run 2's late event (10:00) falls in a window closed below that
# watermark and must be dropped. Its on-time companion (11:58) is kept.
RUN1 = [
    (1, "2026-01-01 11:00:00", "click"),
    (2, "2026-01-01 12:00:00", "click"),
]
RUN2 = [
    (3, "2026-01-01 10:00:00", "click"),  # LATE: below watermark
    (4, "2026-01-01 11:58:00", "click"),  # within the allowed lateness
]


def _write(spark, rows, path):
    spark.createDataFrame(rows, "event_id long, ts string, event_type string") \
        .select("event_id", F.col("ts").cast("timestamp").alias("ts"), "event_type") \
        .coalesce(1).write.parquet(path, mode="append")


def _windowed(df):
    return (
        df.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_micros(F.col("window.start")).alias("win_us"), "n")
    )


def _run(spark, src, ckpt, name):
    # memory sink can't recover from a checkpoint; foreachBatch can
    emitted: set[tuple[int, int]] = set()

    def sink(batch_df, batch_id):
        emitted.update((r["win_us"], r["n"]) for r in batch_df.collect())

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        _windowed(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return emitted


def test_late_event_dropped_in_stream_kept_in_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    hour = lambda h: int(
        spark.sql(f"select unix_micros(timestamp'2026-01-01 {h}:00:00')").first()[0]
    )

    _write(spark, RUN1, src)
    first = _run(spark, src, ckpt, "wm_run1")
    assert first == {(hour("11"), 1), (hour("12"), 1)}

    _write(spark, RUN2, src)
    second = _run(spark, src, ckpt, "wm_run2")
    # late 10:00 event dropped (no 10:00 window ever emitted); the on-time
    # 11:58 arrival updates the 11:00 window to 2
    assert (hour("11"), 2) in second
    assert not any(w == hour("10") for (w, n) in second)

    # batch twin over the SAME files counts everything, late or not
    batch = {
        (r["win_us"], r["n"])
        for r in _windowed(spark.read.schema(SCHEMA).parquet(src)).collect()
    }
    assert (hour("10"), 1) in batch
    assert (hour("11"), 2) in batch
