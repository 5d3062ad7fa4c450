"""File-format connector round-trips (sources/formats.py) and the
streaming file sink."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkstreamingrealtimedatawithkafka_spark.sources.formats import (
    read_files,
    stream_to_files,
    write_files,
)
from sparkstreamingrealtimedatawithkafka_spark.sources.registry import load_table

from conftest import SF_DIR  # single source of truth for the fixture dir

CUSTOMER_SCHEMA = (
    "c_custkey bigint, c_name string, c_nationkey int, "
    "c_acctbal double, c_mktsegment string"
)


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("c_custkey").collect()]


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_batch_roundtrip(spark, tmp_path, fmt):
    src = load_table(spark, SF_DIR, "customer")
    path = str(tmp_path / f"customer_{fmt}")
    write_files(src, path, fmt=fmt)
    back = read_files(spark, path, fmt=fmt, schema=CUSTOMER_SCHEMA)
    # nullability flags differ between the DDL schema and parquet metadata;
    # names + types are the round-trip contract
    assert [(f.name, f.dataType) for f in back.schema] == [
        (f.name, f.dataType) for f in src.schema
    ]
    assert _sorted_rows(back) == _sorted_rows(src)


def test_partitioned_write_prunes(spark, tmp_path):
    src = load_table(spark, SF_DIR, "customer")
    path = str(tmp_path / "customer_part")
    write_files(src, path, fmt="parquet", partition_by=["c_mktsegment"])
    back = read_files(spark, path, fmt="parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    # partition pruning: the filter must land in the scan's PartitionFilters
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "c_mktsegment" in plan.split("PartitionFilters")[1].split("]")[0]
    expected = src.filter(F.col("c_mktsegment") == "BUILDING").count()
    assert back.count() == expected


def test_streaming_file_sink_exactly_once(spark, tmp_path):
    src_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src = load_table(spark, SF_DIR, "customer")
    write_files(src, src_dir, fmt="parquet")

    stream = spark.readStream.schema(CUSTOMER_SCHEMA).parquet(src_dir)
    q = stream_to_files(stream, out_dir, checkpoint=ckpt, fmt="parquet")
    q.awaitTermination()

    out = read_files(spark, out_dir, fmt="parquet", schema=CUSTOMER_SCHEMA)
    assert _sorted_rows(out) == _sorted_rows(src)

    # re-running against the same checkpoint with no new input adds nothing
    stream2 = spark.readStream.schema(CUSTOMER_SCHEMA).parquet(src_dir)
    q2 = stream_to_files(stream2, out_dir, checkpoint=ckpt, fmt="parquet")
    q2.awaitTermination()
    out2 = read_files(spark, out_dir, fmt="parquet", schema=CUSTOMER_SCHEMA)
    assert out2.count() == src.count()


def test_compaction_reduces_file_count_and_preserves_rows(spark, tmp_path):
    """sink_compacted_parquet's contract: coalesce-based compaction must
    collapse the 64-shard fragmentation to the size-targeted count (1 at
    fixture scale) without losing or duplicating a row."""
    from sparkstreamingrealtimedatawithkafka_spark.plans import REGISTRY
    from conftest import SF_DIR

    df = spark.range(0, 10_000).withColumn("v", F.col("id") % 7)
    frag = str(tmp_path / "frag")
    df.repartition(64).write.mode("overwrite").parquet(frag)
    n_frag = len(list((tmp_path / "frag").glob("*.parquet")))
    assert n_frag == 64
    compact = str(tmp_path / "compact")
    spark.read.parquet(frag).coalesce(1).write.mode("overwrite").parquet(compact)
    n_compact = len(list((tmp_path / "compact").glob("*.parquet")))
    assert n_compact == 1
    back = spark.read.parquet(compact)
    assert back.count() == 10_000
    assert back.agg(F.sum("v")).collect()[0][0] == df.agg(F.sum("v")).collect()[0][0]
    # and the catalog entry end-to-end at the fixture dir
    out = REGISTRY["sink_compacted_parquet"].fn(spark, SF_DIR)
    assert out.count() > 0
