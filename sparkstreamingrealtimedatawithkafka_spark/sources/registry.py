"""Batch source catalog over the driver-generated parquet fixtures.

The fixture tables (TESTDATA.md) live at ``{sf_dir}/{name}.parquet``.
One scan quirk: ``events.ts`` is written as parquet TIMESTAMP(NANOS), which
Spark's vectorized parquet reader rejects outright. We read it with
``spark.sql.legacy.parquet.nanosAsLong=true`` (raw int64 nanoseconds) and
derive both an epoch-microsecond long (``ts_us``, timezone-proof — the value
every oracle-checked query computes on) and a proper TimestampType column
(``ts``) via integer division; ``ts div 1000`` keeps full precision where a
double division would not (epoch-nanos ≈ 1.7e18 > 2^53).

Scale note: these are plain ``spark.read.parquet`` scans — column pruning and
predicate pushdown reach the file scan via Catalyst, so at 100 TB the same
loaders work over a partitioned directory tree; nothing here materializes
driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        raw = spark.read.parquet(f"{sf_dir}/events.parquet")
        return raw.select(
            "event_id",
            F.expr("ts div 1000").alias("ts_us"),
            F.expr("timestamp_micros(ts div 1000)").alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; ``events`` gets the nanos→micros treatment."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
