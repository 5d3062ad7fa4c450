"""r14 optimization internals: spread_narrow_scan / est_scan_splits.

Pins the three load-bearing properties of the narrow-scan spread:
the cheap gate's estimates (file-metadata, no planning pass), the
keyed-repartition plan shape on a narrow scan, and the no-op contracts
(wide-enough scan, non-scan frame) that make it scale-inert.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkstreamingrealtimedatawithkafka_spark.operators.skew import (
    est_scan_splits,
    spread_narrow_scan,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    from sparkstreamingrealtimedatawithkafka_spark.plans._util import t

    return t(spark, SF, "documents")


def test_est_scan_splits_small_fixture_reads_narrow(spark, docs):
    target = spark.sparkContext.defaultParallelism
    est = est_scan_splits(docs)
    assert est is not None
    # every sf fixture is one small file — far fewer splits than cores
    assert est < max(target, 2)


def test_est_scan_splits_unknown_for_non_scan_frames(spark, docs):
    ck = docs.select("doc_id").localCheckpoint()
    # checkpoint plans as an RDD scan: no file inputs -> None (gate must
    # treat as "unknown, do not touch")
    assert est_scan_splits(ck) is None
    assert spread_narrow_scan(ck, "doc_id") is ck


def test_spread_repartitions_narrow_scan_by_key(spark, docs):
    if spark.sparkContext.defaultParallelism <= 1:
        pytest.skip("gate is a no-op at parallelism 1")
    out = spread_narrow_scan(docs.select("doc_id", "text"), "doc_id")
    plan = out._jdf.queryExecution().toString().lower()
    assert "repartition_by_col" in plan or "repartitionbyexpression" in plan
    # rows unchanged
    assert out.count() == docs.count()


def test_spread_noop_when_scan_is_wide_enough(spark, docs, tmp_path):
    # write the table as >= cores files: the gate must decline to spread
    target = spark.sparkContext.defaultParallelism
    path = str(tmp_path / "wide")
    docs.select("doc_id").repartition(max(target, 2)).write.parquet(path)
    wide = spark.read.parquet(path)
    assert spread_narrow_scan(wide, "doc_id") is wide


def test_est_scan_splits_sees_through_small_file_packing(spark, docs, tmp_path):
    """r14 advice #1 regression: the old ``len(files) >= cores`` shortcut
    counted files, but Spark bin-packs small files into few partitions
    (openCost charging) — a many-tiny-files input could read as 'wide'
    while actually planning to 1-2 partitions, so widen_for_compute
    declined to widen exactly the narrow frame it exists for. With
    openCost=0 and minPartitionNum=1, Spark packs EVERYTHING into one
    partition regardless of file count; the estimate must agree with
    Spark's own planning, not with the file count."""
    target = spark.sparkContext.defaultParallelism
    n_files = max(target, 2) + 1  # more files than cores, all tiny
    path = str(tmp_path / "tiny")
    docs.select("doc_id").repartition(n_files).write.parquet(path)
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.files.openCostInBytes",
            "spark.sql.files.minPartitionNum",
        )
    }
    try:
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
        spark.conf.set("spark.sql.files.minPartitionNum", "1")
        tiny = spark.read.parquet(path)
        n_listed = len(tiny.inputFiles())
        assert n_listed >= n_files  # the premise: many files on disk
        est = est_scan_splits(tiny)
        actual = tiny.rdd.getNumPartitions()  # Spark's real packing
        assert est == actual, f"estimate {est} != Spark planning {actual}"
        assert est < target, "tiny files must read as packed/narrow"
        # and the gate now widens this frame instead of declining
        out = spread_narrow_scan(tiny, "doc_id")
        assert out is not tiny
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
