"""Fixture-drift tripwire for the events loader.

Round 3 post-mortem: the driver regenerated ``events.parquet`` with ``ts``
as parquet timestamp[us] (previously TIMESTAMP(NANOS) read as int64 under
``nanosAsLong``), and the loader's hard-coded ``ts div 1000`` either threw
(batch) or silently produced 1000x-compressed ~1970 timestamps (streaming
explicit LongType schema). These tests pin the *semantics* of the loaded
columns — epoch-micros magnitude and the fixture's known date range — so any
future physical-type drift fails loudly here instead of as ten red driver
entries.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

from sparkstreamingrealtimedatawithkafka_spark.sources.registry import (
    event_time_columns,
    load_table,
)

from conftest import SF_DIR

# epoch-micros bounds: 2017-07 .. 2049-03. The fixtures are Jan 2024
# (~1.704e15); an accidental nanos read lands ~1.7e18, a micros-divided-by-
# 1000 read lands ~1.7e12 — both far outside this band.
US_LO = 1_500_000_000_000_000
US_HI = 2_500_000_000_000_000


def test_batch_events_ts_is_micros_scale(spark):
    events = load_table(spark, SF_DIR, "events")
    row = events.agg(
        F.min("ts_us").alias("lo"),
        F.max("ts_us").alias("hi"),
        F.min("ts").alias("ts_lo"),
        F.max("ts").alias("ts_hi"),
    ).first()
    assert US_LO < row["lo"] <= row["hi"] < US_HI, (
        f"ts_us out of epoch-micros band: [{row['lo']}, {row['hi']}] — "
        "events fixture physical type drifted again?"
    )
    # ts (TimestampType instant) must agree with ts_us
    assert row["ts_lo"].year in range(2017, 2050)
    assert row["ts_hi"].year in range(2017, 2050)


def test_batch_events_schema_contract(spark):
    events = load_table(spark, SF_DIR, "events")
    assert isinstance(events.schema["ts_us"].dataType, LongType)
    assert isinstance(events.schema["ts"].dataType, TimestampType)


def test_streaming_events_ts_matches_batch(spark):
    """The streaming loader's adaptive schema must land on the same values
    as the batch loader (this is exactly what silently broke in round 3)."""
    from sparkstreamingrealtimedatawithkafka_spark.plans.streaming_queries import (
        _events_stream,
    )
    from sparkstreamingrealtimedatawithkafka_spark.streaming.pipeline import (
        run_to_memory,
    )

    streamed = run_to_memory(_events_stream(spark, SF_DIR), output_mode="append")
    srow = streamed.agg(F.min("ts_us").alias("lo"), F.max("ts_us").alias("hi")).first()
    batch = load_table(spark, SF_DIR, "events")
    brow = batch.agg(F.min("ts_us").alias("lo"), F.max("ts_us").alias("hi")).first()
    assert (srow["lo"], srow["hi"]) == (brow["lo"], brow["hi"])
    assert US_LO < srow["lo"] <= srow["hi"] < US_HI


def test_event_time_columns_rejects_unknown_type(spark):
    from pyspark.sql.types import StringType

    with pytest.raises(TypeError):
        event_time_columns(StringType())


@pytest.mark.parametrize(
    "ts_type", [LongType(), TimestampType(), TimestampNTZType()]
)
def test_event_time_columns_all_physical_types(spark, ts_type):
    """Same instant through every supported physical representation."""
    us = 1_704_067_207_179_575  # 2024-01-01T00:00:07.179575Z (fixture min)
    if isinstance(ts_type, LongType):
        df = spark.createDataFrame([(us * 1000,)], schema="ts long")
    else:
        df = spark.range(1).select(
            F.timestamp_micros(F.lit(us)).cast(ts_type).alias("ts")
        )
    ts_us, ts = event_time_columns(ts_type)
    row = df.select(ts_us, ts).first()
    assert row["ts_us"] == us
    assert row["ts"].year == 2024
