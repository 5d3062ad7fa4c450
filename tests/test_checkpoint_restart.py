"""Restart-from-checkpoint recovery for stateful streaming.

test_stateful_streaming.py proves state carries across MICRO-BATCHES inside
one query run; this proves the stronger durability contract: a brand-new
query instance started on the same checkpoint (a) recovers the state store
contents, and (b) resumes from the committed source offsets instead of
reprocessing — i.e. restart after a crash/deploy loses nothing and
double-counts nothing. That recovery path is exactly what a 1000-executor
job relies on when any executor or the driver dies mid-stream.
"""

from __future__ import annotations

import pandas as pd

from sparkstreamingrealtimedatawithkafka_spark.streaming.stateful import (
    user_running_stats,
)


def _run(stats_df, ckpt, sink: list):
    # The memory sink refuses checkpoint recovery ("does not support
    # recovering"); foreachBatch is the recoverable sink surface — batch
    # ids and source offsets come from the checkpoint's commit log.
    def capture(batch_df, batch_id):
        sink.extend((batch_id, tuple(r)) for r in batch_df.collect())

    q = (
        stats_df.writeStream.foreachBatch(capture)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def test_restart_recovers_state_and_offsets(spark, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def stream():
        raw = (
            spark.readStream.schema("user_id bigint, value double, ts_us bigint")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        return user_running_stats(raw)

    # Run 1: two files, two batches.
    pd.DataFrame(
        {"user_id": [1, 2], "value": [1.0, 5.0], "ts_us": [100, 200]}
    ).to_parquet(src / "a.parquet", index=False)
    pd.DataFrame(
        {"user_id": [1], "value": [2.0], "ts_us": [300]}
    ).to_parquet(src / "b.parquet", index=False)
    run1: list = []
    _run(stream(), ckpt, run1)
    run1_max_batch = max(b for b, _ in run1)
    assert run1_max_batch >= 1, "expected two micro-batches in run 1"

    # Run 2: one NEW file; a fresh query instance on the same checkpoint.
    pd.DataFrame(
        {"user_id": [1, 3], "value": [4.0, 9.0], "ts_us": [400, 50]}
    ).to_parquet(src / "c.parquet", index=False)
    run2: list = []
    _run(stream(), ckpt, run2)

    rows = {r[0]: r for _, r in run2}  # user_id -> emission

    # (b) No reprocessing: run 2 emits only users present in the new file
    # (old offsets are committed in the checkpoint), and its batch ids
    # CONTINUE the numbering instead of restarting at 0.
    assert sorted(rows) == [1, 3]
    assert all(b > run1_max_batch for b, _ in run2)

    # (a) State recovered: user 1's totals include run-1 history.
    # emission: (user_id, n_events, value_cents, first_us, last_us)
    assert rows[1] == (1, 3, 700, 100, 400)
    # user 3 is new — state starts fresh.
    assert rows[3] == (3, 1, 900, 50, 50)
