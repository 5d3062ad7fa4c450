"""Contracts for the mergeable-HLL entry (agg_hll_sketch_mergeable —
rows-only in the catalog, so the semantics are pinned here instead).

Two properties make partial sketches trustworthy at scale:
1. Merge associativity: union of per-group partial sketches estimates the
   SAME value as one sketch built over the whole input — the property that
   lets a pipeline store per-day sketches and merge months later.
2. Bounded error: estimates land within HLL's expected relative error of
   the exact distinct count (lgConfigK default 12 → ~1.6% standard error;
   assert a generous 5%).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR  # single source of truth for the fixture dir


def test_hll_merge_equals_direct_and_tracks_exact(spark):
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")

    direct = o.agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(o_custkey))").alias("est")
    ).collect()[0]["est"]

    merged = (
        o.groupBy("o_orderpriority")
        .agg(F.expr("hll_sketch_agg(o_custkey)").alias("sk"))
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"))
        .collect()[0]["est"]
    )
    assert merged == direct, "partial-sketch merge must equal the direct sketch"

    exact = o.select("o_custkey").distinct().count()
    assert abs(merged - exact) / exact <= 0.05


def test_hll_entry_all_row_consistent(spark):
    from sparkstreamingrealtimedatawithkafka_spark.plans import REGISTRY

    out = REGISTRY["agg_hll_sketch_mergeable"].fn(spark, SF_DIR).collect()
    rows = {r["o_orderpriority"]: r["n_customers_est"] for r in out}
    assert "ALL" in rows and len(rows) == 6  # 5 priorities + ALL
    # The union can't estimate fewer than any single part.
    assert rows["ALL"] >= max(v for k, v in rows.items() if k != "ALL")
