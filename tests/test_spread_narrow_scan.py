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
