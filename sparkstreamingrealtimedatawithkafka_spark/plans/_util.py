"""Shared helpers for catalog queries.

Determinism policy (what makes the DuckDB oracle hash-match bit-for-bit):

- **Money/measure aggregation in integer units.** Doubles summed in different
  orders differ in the last ulps, so every *computed* monetary aggregate is
  done as ``SUM(CAST(ROUND(x*100,0) AS BIGINT))`` (exact, associative,
  order-independent) and divided back to a double only once at the end — the
  same final division on both engines yields the same IEEE bits. Raw double
  columns passed through untouched are already bit-identical (same parquet).
- **Event time in epoch microseconds (long).** Queries compute on the
  loader-derived ``ts_us`` (sources/registry.py:event_time_columns — the
  schema-adaptive bridge over the fixture's drifting physical ts type), so
  results are independent of either engine's session timezone.
- **Unique-key tiebreakers in every ORDER BY / window** so LIMIT/top-k picks
  are unambiguous.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkstreamingrealtimedatawithkafka_spark.sources.registry import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def cents(col: Column | str, scale: int = 100) -> Column:
    """Exact integer units for a fixed-point-valued double column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * scale, 0).cast("long")


SQL_CENTS = "CAST(ROUND({col}*100,0) AS BIGINT)"


def sql_cents(col: str) -> str:
    return SQL_CENTS.format(col=col)
