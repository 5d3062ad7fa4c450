"""Skew-mitigation operators (operators/skew.py) and bucketed co-located
joins — the two explicit shuffle-control levers for 100 TB.

The bucketing test is the evidence that the engine's join strategy can be
made shuffle-free when both sides are written bucketed on the join key:
the executed plan must contain NO Exchange over the bucketed scans.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkstreamingrealtimedatawithkafka_spark.operators.skew import (
    replicate_broadcast_join,
    salted_agg,
)
from sparkstreamingrealtimedatawithkafka_spark.plans._util import cents
from sparkstreamingrealtimedatawithkafka_spark.sources.registry import load_table

from conftest import SF_DIR  # single source of truth for the fixture dir


def test_salted_agg_matches_plain(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    plain = (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(cents("l_quantity")).alias("qty_c"),
            F.count(F.lit(1)).alias("n"),
            F.max("l_shipdate").alias("max_ship"),
        )
        .collect()
    )
    salted = salted_agg(
        li,
        keys=["l_returnflag"],
        partial_aggs=[
            F.sum(cents("l_quantity")).alias("qty_c"),
            F.count(F.lit(1)).alias("n"),
            F.max("l_shipdate").alias("max_ship"),
        ],
        final_aggs=[
            F.sum("qty_c").alias("qty_c"),
            F.sum("n").alias("n"),
            F.max("max_ship").alias("max_ship"),
        ],
        n_salts=16,
    ).collect()
    assert sorted(map(tuple, salted)) == sorted(map(tuple, plain))


def test_replicate_broadcast_join_matches_plain(spark):
    orders = load_table(spark, SF_DIR, "orders")
    cust = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_mktsegment")
    plain = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select("o_orderkey", "c_mktsegment")
        .collect()
    )
    salted = (
        replicate_broadcast_join(
            orders.withColumnRenamed("o_custkey", "k"),
            cust.withColumnRenamed("c_custkey", "k"),
            on=["k"],
            n_salts=4,
        )
        .select("o_orderkey", "c_mktsegment")
        .collect()
    )
    assert sorted(map(tuple, salted)) == sorted(map(tuple, plain))


def test_bucketed_join_has_no_shuffle(spark):
    # managed tables land in the session warehouse; DROP TABLE (finally)
    # removes their files
    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")

    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable(
        "orders_b"
    )
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable(
        "li_b"
    )
    try:
        # disable broadcast so the join would otherwise shuffle both sides
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("orders_b").join(
            spark.table("li_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join must not shuffle:\n{plan}"
        n = joined.count()
        expected = orders.join(li, orders.o_orderkey == li.l_orderkey).count()
        assert n == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS li_b")


def test_widen_for_compute_gate(spark):
    """The inverse-skew helper: widens a narrow scan to cluster
    parallelism, and is a NO-OP (same object, no added shuffle) once the
    input already has >= defaultParallelism partitions — the gate that
    keeps it free on genuinely large (100 TB-scale) inputs."""
    from sparkstreamingrealtimedatawithkafka_spark.operators.skew import (
        widen_for_compute,
    )

    target = spark.sparkContext.defaultParallelism
    narrow = spark.range(1000).repartition(2)
    widened = widen_for_compute(narrow)
    assert widened.rdd.getNumPartitions() == target
    assert sorted(r.id for r in widened.collect()) == list(range(1000))

    wide = spark.range(1000).repartition(target + 4)
    assert widen_for_compute(wide) is wide


def test_assign_buckets_widen_flag(spark):
    """r10 advice #2: ivf_topk's tiny query probe side must NOT pay the
    widen shuffle. Pin both directions on a deliberately narrow (1-split)
    corpus: widen=True (corpus side, the default) reaches cluster
    parallelism; widen=False (probe side) keeps the input's partitioning
    — no RoundRobin exchange inserted — while producing identical rows."""
    from pyspark.sql import functions as F

    from sparkstreamingrealtimedatawithkafka_spark.operators.similarity import (
        assign_buckets,
    )

    if spark.sparkContext.defaultParallelism <= 1:
        pytest.skip(
            "widen gate is a no-op at parallelism 1 — the RoundRobin-plan "
            "assertion below needs a >1-core session (r11 advice)"
        )
    corpus = (
        spark.range(64)
        .select(
            F.col("id").alias("vec_id"),
            F.array(
                (F.col("id") % 7 + 1).cast("double"), (F.col("id") % 3 + 1).cast("double")
            ).alias("embedding"),
        )
        .repartition(1)
    )
    centroids = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "centroid_id int, cvec array<double>"
    )

    widened = assign_buckets(corpus, centroids)
    unwidened = assign_buckets(corpus, centroids, widen=False)
    # widen=True repartitions the 1-split scan up to cluster parallelism;
    # widen=False must leave the narrow input alone (the probe-side
    # contract: no shuffle added for a frame whose compute is negligible).
    assert "roundrobinpartitioning" in widened._jdf.queryExecution().toString().lower()
    assert (
        "roundrobinpartitioning"
        not in unwidened._jdf.queryExecution().toString().lower()
    )
    rows_w = sorted((r.id, r.centroid_id) for r in widened.collect())
    rows_u = sorted((r.id, r.centroid_id) for r in unwidened.collect())
    assert rows_w == rows_u and len(rows_w) == 64
