"""Python STREAMING data source (SimpleDataSourceStreamReader) contracts.

The catalog entry (source_python_stream_datasource) covers the bounded
single-batch run; here we pin the parts that make the API a real streaming
source:

- multi-batch paging: with a steady trigger, the engine advances the
  offset in `batch`-sized steps and every row arrives exactly once;
- readBetweenOffsets: replaying a committed offset range reproduces the
  identical rows (the crash-recovery path);
- option validation fails loudly.
"""

from __future__ import annotations

import time

import pytest

from sparkstreamingrealtimedatawithkafka_spark.sources.pysource import (
    SyntheticStreamReader,
    register_python_sources,
)


def test_multi_batch_paging_exactly_once(spark, tmp_path):
    register_python_sources(spark)
    n, batch = 1200, 500  # 3 uneven pages: 500, 500, 200
    stream = (
        spark.readStream.format("ssk_synthetic_stream")
        .option("n", n)
        .option("batch", batch)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("pystream_pages")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table("pystream_pages").count() >= n:
                break
            time.sleep(0.5)
        rows = spark.table("pystream_pages").collect()
    finally:
        q.stop()
    ids = sorted(r["id"] for r in rows)
    assert ids == list(range(n)), "every id exactly once across micro-batches"
    # more than one batch actually ran (paging, not one big gulp)
    assert len(q.recentProgress) >= 3 or any(
        p["numInputRows"] == batch for p in q.recentProgress
    )


def test_read_between_offsets_replays_identically():
    r = SyntheticStreamReader({"n": "1000", "batch": "100"})
    live, nxt = r.read({"pos": 300})
    assert nxt == {"pos": 400}
    replay = r.readBetweenOffsets({"pos": 300}, {"pos": 400})
    assert list(live) == list(replay)


def test_offset_stops_advancing_at_n():
    r = SyntheticStreamReader({"n": "250", "batch": "100"})
    rows, o = r.read({"pos": 200})
    assert o == {"pos": 250} and len(list(rows)) == 50
    rows, o = r.read({"pos": 250})
    assert o == {"pos": 250} and list(rows) == []


def test_option_validation():
    with pytest.raises(ValueError):
        SyntheticStreamReader({"n": "-1"})
    with pytest.raises(ValueError):
        SyntheticStreamReader({"batch": "0"})
