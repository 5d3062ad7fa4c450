"""Streaming EWMA: cross-batch state continuation must reproduce the
batch operator exactly when batches arrive in time order (the ingest
regime the operator documents)."""

from __future__ import annotations

import glob
import shutil
import tempfile

from pyspark.sql import functions as F

from sparkstreamingrealtimedatawithkafka_spark.plans import REGISTRY
from sparkstreamingrealtimedatawithkafka_spark.plans._util import t
from sparkstreamingrealtimedatawithkafka_spark.streaming.pipeline import as_stream_dir
from sparkstreamingrealtimedatawithkafka_spark.streaming.stateful import user_ewma

from conftest import SF_DIR


def test_stream_ewma_across_time_sliced_batches_equals_batch(spark):
    batch = {
        (r.user_id, r.n_events, r.ewma_cents)
        for r in REGISTRY["events_ewma_smoothing"].fn(spark, SF_DIR).collect()
    }

    ev = t(spark, SF_DIR, "events").select(
        "user_id",
        "event_id",
        "ts_us",
        "ts",
        F.expr("CAST(ROUND(value*100,0) AS BIGINT)").alias("cents"),
    )
    median = ev.approxQuantile("ts_us", [0.5], 0.0)[0]
    work = tempfile.mkdtemp(prefix="ssk_ewma_")
    files = []
    # slice 0 = earlier half, written first so the file source processes it
    # as the earlier batch (FileStreamSource orders by file listing)
    for i, pred in enumerate(
        [F.col("ts_us") < median, F.col("ts_us") >= median]
    ):
        sd = f"{work}/slice{i}"
        ev.filter(pred).coalesce(1).write.parquet(sd)
        files.extend(sorted(glob.glob(f"{sd}/part-*.parquet")))
    raw = (
        spark.readStream.schema(
            "user_id long, event_id long, ts_us long, ts timestamp_ntz, cents long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(as_stream_dir(*files))
    )
    out = user_ewma(raw.select("user_id", "event_id", "ts_us", "cents"))
    q = (
        out.writeStream.format("memory")
        .queryName("ewma_parity")
        .outputMode("update")
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode: take the LAST emission per user (latest batch wins)
    rows = spark.sql(
        "SELECT user_id, n_events, ewma_cents FROM ewma_parity"
    ).collect()
    latest = {}
    for r in rows:
        prev = latest.get(r.user_id)
        if prev is None or r.n_events > prev[1]:
            latest[r.user_id] = (r.user_id, r.n_events, r.ewma_cents)
    shutil.rmtree(work, ignore_errors=True)
    assert set(latest.values()) == batch
