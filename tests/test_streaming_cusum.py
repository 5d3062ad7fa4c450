"""Streaming CUSUM: cross-batch state continuation must reproduce the
batch operator exactly (to the cent — all state is int64) when batches
arrive in time order, the ingest regime the operator documents."""

from __future__ import annotations

import glob
import shutil
import tempfile

from pyspark.sql import functions as F

from sparkstreamingrealtimedatawithkafka_spark.plans import REGISTRY
from sparkstreamingrealtimedatawithkafka_spark.plans._util import t
from sparkstreamingrealtimedatawithkafka_spark.streaming.pipeline import as_stream_dir
from sparkstreamingrealtimedatawithkafka_spark.streaming.stateful import user_cusum

from conftest import SF_DIR


def test_stream_cusum_across_time_sliced_batches_equals_batch(spark):
    batch = {
        (r.user_id, r.n_alarms, r.max_cusum_c, r.first_alarm_event)
        for r in REGISTRY["events_cusum_changepoint"].fn(spark, SF_DIR).collect()
    }

    ev = t(spark, SF_DIR, "events").select(
        "user_id",
        "event_id",
        "ts_us",
        "ts",
        F.expr("CAST(ROUND(value*100,0) AS BIGINT)").alias("cents"),
    )
    median = ev.approxQuantile("ts_us", [0.5], 0.0)[0]
    work = tempfile.mkdtemp(prefix="ssk_cusum_")
    files = []
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
    out = user_cusum(raw.select("user_id", "event_id", "ts_us", "cents"))
    q = (
        out.writeStream.format("memory")
        .queryName("cusum_parity")
        .outputMode("update")
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql(
        "SELECT user_id, n_alarms, max_cusum_c, first_alarm_event FROM cusum_parity"
    ).collect()
    # update mode: the LAST emission per user wins; n_alarms and
    # max_cusum_c are both monotone nondecreasing across batches, so the
    # latest is the max by that pair
    latest = {}
    for r in rows:
        cur = (r.user_id, r.n_alarms, r.max_cusum_c, r.first_alarm_event)
        prev = latest.get(r.user_id)
        if prev is None or (cur[1], cur[2]) > (prev[1], prev[2]):
            latest[r.user_id] = cur
    shutil.rmtree(work, ignore_errors=True)
    got = {v for v in latest.values() if v[1] > 0}
    assert got == batch
    assert batch, "fixture should alarm for at least one user"


def test_cusum_closed_form_equals_recurrence():
    """The identity both CUSUM entries ride on: S_t = max(0, S_{t-1} + d_t)
    == P_t - min(0, min prefix P) — hypothesis over arbitrary int deltas,
    plus alarm bookkeeping (count, first index over threshold) replayed
    both ways."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        ds=st.lists(st.integers(-100, 100), min_size=1, max_size=60),
        h=st.integers(0, 150),
    )
    def check(ds, h):
        s, n_alarms_rec, first_rec = 0, 0, None
        for i, d in enumerate(ds):
            s = max(0, s + d)
            if s > h:
                n_alarms_rec += 1
                if first_rec is None:
                    first_rec = i
        ps, mn, n_alarms_cf, first_cf = 0, 0, 0, None
        for i, d in enumerate(ds):
            ps += d
            mn = min(mn, ps)
            if ps - mn > h:
                n_alarms_cf += 1
                if first_cf is None:
                    first_cf = i
        assert (n_alarms_cf, first_cf) == (n_alarms_rec, first_rec)

    check()
