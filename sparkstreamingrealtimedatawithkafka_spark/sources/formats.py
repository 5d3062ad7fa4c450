"""Batch + streaming file-format connectors (parquet / csv / json / orc).

The reference's only I/O is Kafka in, Kafka out (spark_entity_counter.py:
117-124, 147-156) plus an HTTP producer. A usable engine needs file
formats as first-class sources/sinks; these thin wrappers standardize the
engine's conventions:

- **Explicit schemas on read** for text formats (csv/json) — schema
  inference is a full extra pass over the data at 100 TB and is
  non-deterministic under dirty input, so it is opt-in, never default.
- **Writes go through the normal committer** (atomic rename protocol), so
  a failed job never leaves a half-visible table.
- **Streaming file sink** pairs with the checkpoint for exactly-once file
  output — the hermetic stand-in for the reference's Kafka sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

BATCH_FORMATS = ("parquet", "csv", "json", "orc")

_READ_DEFAULTS: dict[str, dict[str, str]] = {
    "csv": {"header": "true"},
    "json": {},  # JSON Lines (one object per line), Spark's default
    "parquet": {},
    "orc": {},
}

_WRITE_DEFAULTS: dict[str, dict[str, str]] = {
    "csv": {"header": "true"},
    "json": {},
    "parquet": {},
    "orc": {},
}


def read_files(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Batch-read a table from files. csv/json require ``schema`` (inference
    is an extra full scan — explicitly opt in with schema=None at your own
    cost on small data only)."""
    if fmt not in BATCH_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; have {BATCH_FORMATS}")
    reader = spark.read.format(fmt).options(**{**_READ_DEFAULTS[fmt], **options})
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        reader = reader.option("inferSchema", "true")
    return reader.load(path)


def write_files(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """Batch-write a DataFrame. ``partition_by`` produces the
    hive-style directory layout that enables partition pruning on read —
    the first lever for 100 TB scan cost."""
    if fmt not in BATCH_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; have {BATCH_FORMATS}")
    writer = df.write.format(fmt).options(**{**_WRITE_DEFAULTS[fmt], **options}).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def stream_to_files(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    fmt: str = "parquet",
    available_now: bool = True,
):
    """Streaming file sink (append mode only, per Spark): exactly-once via
    the checkpointed file-sink log. Returns the started StreamingQuery."""
    trigger = {"availableNow": True} if available_now else {"processingTime": "30 seconds"}
    return (
        stream_df.writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(**trigger)
        .start()
    )
