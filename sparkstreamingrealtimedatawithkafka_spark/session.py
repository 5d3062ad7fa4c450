"""SparkSession factory.

Carries the runtime confs the reference job needs
(/root/reference/readme.md:79-80 — JDK17 ``--add-opens`` comes from
spark-submit, ``spark.sql.execution.pyspark.udf.faulthandler.enabled=true``
because a crashing Python-worker UDF should produce a traceback, not a hang)
plus scale-oriented defaults: AQE with skew-join handling, UTC session
timezone (oracle comparability), Arrow-based pandas conversion.

Local mode is one JVM with N threads; on a real cluster the same confs hold
and the parallelism knobs (``spark.sql.shuffle.partitions``) should be set
to ~2-3x total executor cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "ssk-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.pyspark.udf.faulthandler.enabled", "true")
        # Fixture-drift safety net: some fixture generations write events.ts
        # as TIMESTAMP(NANOS), which Spark's parquet reader rejects without
        # this legacy flag (it is inert for non-NANOS columns, including the
        # current timestamp[us] fixtures). The events loader branches on the
        # type actually resolved (sources/registry.py:event_time_columns),
        # so either physical type round-trips to the same epoch-micros.
        # Session-level (not per-query set/restore) because streaming plans
        # freeze confs asynchronously after start().
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        # A 150-query session compiles thousands of whole-stage-codegen
        # classes; the JVM's default 240 MB code cache fills and late
        # queries fall back to the interpreter (A/B on the bench preamble:
        # dedup_simhash 4.01s -> 3.22s min-of-2 with the larger cache).
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=512m")
        .config("spark.ui.enabled", "false")
    )
    for key, value in (extra or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
