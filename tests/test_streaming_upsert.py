"""Streaming SCD-1 upsert: the final keyed state must be invariant to
how the change stream is sliced into micro-batches and equal to the
batch argmax over the whole history (latest-wins is an associative
fold); a missing prior target version must fail loudly, never merge
against empty."""

from __future__ import annotations

import glob
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from sparkstreamingrealtimedatawithkafka_spark.plans._util import t
from sparkstreamingrealtimedatawithkafka_spark.streaming.pipeline import as_stream_dir
from sparkstreamingrealtimedatawithkafka_spark.streaming.upsert import (
    final_state,
    latest_per_key,
    upsert_query,
)

from conftest import SF_DIR

_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts_us", LongType(), True),
        StructField("user_id", LongType(), True),
        StructField("value", DoubleType(), True),
    ]
)


def _changes(spark):
    return t(spark, SF_DIR, "events").select(
        "event_id", "ts_us", "user_id", F.col("value")
    )


def _stream_state(spark, n_slices: int) -> dict:
    ev = _changes(spark)
    work = tempfile.mkdtemp(prefix=f"ssk_upsert_test_{n_slices}_")
    files = []
    for i in range(n_slices):
        sd = f"{work}/slice{i}"
        ev.filter(F.col("event_id") % n_slices == i).coalesce(1).write.parquet(sd)
        files.extend(glob.glob(f"{sd}/part-*.parquet"))
    raw = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(as_stream_dir(*files))
    )
    changes = raw.select(
        "user_id",
        "ts_us",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    q = upsert_query(
        spark, changes, f"{work}/target", "user_id", ["ts_us", "event_id"]
    ).start()
    q.awaitTermination()
    rows = final_state(spark, f"{work}/target").collect()
    shutil.rmtree(work, ignore_errors=True)
    state = {r.user_id: (r.ts_us, r.event_id, r.cents) for r in rows}
    assert len(state) == len(rows), "duplicate key in upsert target"
    return state


def test_stream_equals_batch_and_slice_invariant(spark):
    ev = _changes(spark).select(
        "user_id",
        "ts_us",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    batch = {
        r.user_id: (r.ts_us, r.event_id, r.cents)
        for r in latest_per_key(ev, "user_id", ["ts_us", "event_id"]).collect()
    }
    assert _stream_state(spark, 2) == batch
    assert _stream_state(spark, 4) == batch


def test_missing_prior_version_fails_loudly(spark):
    from sparkstreamingrealtimedatawithkafka_spark.streaming.upsert import (
        make_upsert_batch,
    )

    work = tempfile.mkdtemp(prefix="ssk_upsert_missing_")
    try:
        batch_df = _changes(spark).limit(10).select("user_id", "ts_us", "event_id")
        process = make_upsert_batch(spark, f"{work}/target", "user_id", ["ts_us"])
        # Replay scenario: the checkpoint says we're on batch 1 but the
        # prior target version has vanished — must crash, not merge empty.
        with pytest.raises(RuntimeError, match="refusing to merge"):
            process(batch_df, 1)
        # Batch 0 (no prior expected) succeeds and writes v0; batch 1 then
        # merges against it without error.
        process(batch_df, 0)
        process(batch_df, 1)
    finally:
        shutil.rmtree(work, ignore_errors=True)
