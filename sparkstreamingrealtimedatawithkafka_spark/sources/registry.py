"""Batch source catalog over the driver-generated parquet fixtures.

The fixture tables (TESTDATA.md) live at ``{sf_dir}/{name}.parquet``.
One scan quirk: ``events.ts`` has shipped as parquet TIMESTAMP(NANOS) in some
fixture generations and TIMESTAMP(MICROS) in others, so the loader is
*schema-adaptive*: it inspects the type Spark actually resolved for ``ts``
and branches.

- timestamp / timestamp_ntz (current fixtures): ``ts_us =
  unix_micros(cast(ts as timestamp))``. The session timezone is pinned UTC
  (session.py), so the NTZ→instant cast is identity and ``ts_us`` is the
  same wall-clock micros the DuckDB oracles compute with ``epoch_ns(ts)//1000``.
- int64 (NANOS fixtures read under ``spark.sql.legacy.parquet.nanosAsLong``,
  kept as a session default purely as a drift safety net — it is inert for
  non-NANOS columns): ``ts_us = ts div 1000``; integer division keeps full
  precision where a double division would not (epoch-nanos ≈ 1.7e18 > 2^53).

Either way the loader emits the same two columns: ``ts_us`` (epoch-micros
long — the value every oracle-checked query computes on) and ``ts``
(TimestampType instant).

Scale note: these are plain ``spark.read.parquet`` scans — column pruning and
predicate pushdown reach the file scan via Catalyst, so at 100 TB the same
loaders work over a partitioned directory tree; nothing here materializes
driver-side. The schema inspection reads only the parquet footer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def event_time_columns(ts_type) -> tuple:
    """Return ``(ts_us, ts)`` column expressions for an events ``ts`` column
    of the given resolved Spark type — the one switch point for fixture
    schema drift (nanos-as-long vs timestamp[us]/[ns] vs timestamp_ntz)."""
    if isinstance(ts_type, LongType):
        # legacy nanosAsLong read: raw int64 epoch-nanos
        return (
            F.expr("ts div 1000").alias("ts_us"),
            F.expr("timestamp_micros(ts div 1000)").alias("ts"),
        )
    if isinstance(ts_type, (TimestampType, TimestampNTZType)):
        # UTC session timezone → NTZ cast is identity; unix_micros needs an
        # instant (TIMESTAMP), hence the explicit cast.
        ts_instant = F.col("ts").cast(TimestampType())
        return (
            F.unix_micros(ts_instant).alias("ts_us"),
            ts_instant.alias("ts"),
        )
    raise TypeError(f"unsupported events.ts type {ts_type!r}")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_us, ts = event_time_columns(raw.schema["ts"].dataType)
    return raw.select("event_id", ts_us, ts, "user_id", "event_type", "value", "props")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; ``events`` gets the nanos→micros treatment."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
