"""Spark-4-native API surfaces: the Python DataSource API, the VARIANT
type, and ``transformWithStateInPandas`` (tested via its catalog entry in
tests/test_oracle_parity.py; here we cover the operator's cross-batch state
contract directly).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparkstreamingrealtimedatawithkafka_spark.sources.pysource import (
    SyntheticReader,
    register_python_sources,
)

from conftest import SF_DIR  # single source of truth for the fixture dir

_MIX = 2654435761


def test_python_datasource_rows_and_partitions(spark):
    register_python_sources(spark)
    df = (
        spark.read.format("ssk_synthetic")
        .option("n", 1000)
        .option("partitions", 4)
        .load()
    )
    rows = {r["id"]: (r["bucket"], r["score_milli"]) for r in df.collect()}
    # Every id exactly once, values per the deterministic generator.
    assert sorted(rows) == list(range(1000))
    for i in (0, 1, 999):
        assert rows[i] == (i % 16, (i * _MIX) % 1000)


def test_python_datasource_partition_ranges_cover_exactly():
    # The partition math must tile [0, n) exactly — no gap, no overlap —
    # for any (n, partitions) combination, else distributed reads drop or
    # duplicate rows.
    for n, parts in [(7, 3), (1000, 4), (16, 16), (5, 8)]:
        r = SyntheticReader({"n": str(n), "partitions": str(parts)})
        spans = []
        for p in r.partitions():
            i = p.value
            spans.append((n * i // parts, n * (i + 1) // parts))
        ids = [x for lo, hi in spans for x in range(lo, hi)]
        assert ids == list(range(n))


def test_variant_roundtrip_scalar(spark):
    df = spark.createDataFrame(
        [('{"a": 5, "b": {"c": "x"}}',), ('{"a": null}',)], ["j"]
    )
    out = df.select(
        F.variant_get(F.parse_json("j"), "$.a", "bigint").alias("a"),
        F.try_variant_get(F.parse_json("j"), "$.b.c", "string").alias("c"),
    ).collect()
    assert (out[0]["a"], out[0]["c"]) == (5, "x")
    assert (out[1]["a"], out[1]["c"]) == (None, None)


def _has_protobuf() -> bool:
    from sparkstreamingrealtimedatawithkafka_spark.streaming.stateful import (
        has_tws_runtime,
    )

    return has_tws_runtime()


def test_tws_catalog_registration_tracks_runtime():
    """The TWS catalog entry must be registered exactly when the runtime
    can execute it — it lights up automatically once the sandbox gains
    google.protobuf, and never ships as a guaranteed-red entry without."""
    from sparkstreamingrealtimedatawithkafka_spark.plans import REGISTRY

    assert ("streaming_stateful_user_stats_tws" in REGISTRY) == _has_protobuf()


def test_transform_with_state_plan_contract(spark, tmp_path):
    """``transformWithStateInPandas`` plan construction must succeed without
    executing (execution needs google.protobuf, absent in this container —
    the Kafka-contract-test pattern): streaming flag set, output schema as
    declared by the processor."""
    from sparkstreamingrealtimedatawithkafka_spark.streaming.stateful import (
        user_running_stats_tws,
    )

    src = tmp_path / "tws_contract"
    src.mkdir()
    pd.DataFrame({"user_id": [1], "value": [1.0], "ts_us": [1]}).to_parquet(
        src / "x.parquet", index=False
    )
    stream = (
        spark.readStream.schema("user_id bigint, value double, ts_us bigint")
        .parquet(str(src))
    )
    out = user_running_stats_tws(stream)
    assert out.isStreaming
    assert out.schema.simpleString() == (
        "struct<user_id:bigint,n_events:bigint,value_cents:bigint,"
        "first_us:bigint,last_us:bigint>"
    )


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas execution needs google.protobuf",
)
def test_transform_with_state_cross_batch(spark, tmp_path):
    """State must persist across micro-batches: two parquet files arriving
    as two batches (maxFilesPerTrigger=1) yield running totals, and the
    final emission equals the whole-input aggregate."""
    from sparkstreamingrealtimedatawithkafka_spark.streaming.stateful import (
        user_running_stats_tws,
    )

    b1 = pd.DataFrame({"user_id": [1, 1, 2], "value": [1.0, 2.0, 10.0], "ts_us": [100, 200, 300]})
    b2 = pd.DataFrame({"user_id": [1, 2], "value": [4.0, 0.5], "ts_us": [400, 50]})
    src = tmp_path / "stream_in"
    src.mkdir()
    b1.to_parquet(src / "b1.parquet", index=False)
    b2.to_parquet(src / "b2.parquet", index=False)

    stream = (
        spark.readStream.schema("user_id bigint, value double, ts_us bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    stats = user_running_stats_tws(stream)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            stats.writeStream.format("memory")
            .queryName("tws_test")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    rows = spark.table("tws_test").collect()
    # Per (user, emission): the LAST emission per user carries the full totals.
    final = {}
    for r in rows:
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur["n_events"]:
            final[r["user_id"]] = r
    assert final[1]["n_events"] == 3
    assert final[1]["value_cents"] == 700
    assert (final[1]["first_us"], final[1]["last_us"]) == (100, 400)
    assert final[2]["n_events"] == 2
    assert final[2]["value_cents"] == 1050
    assert (final[2]["first_us"], final[2]["last_us"]) == (50, 300)


def test_grouped_apply_in_arrow(spark):
    """Grouped-map applyInArrow — the Arrow-native sibling of
    applyInPandas: each group arrives as a pyarrow Table, goes back as
    Arrow, no pandas materialization. Completes the Arrow UDF matrix
    (scalar pandas UDF / mapInArrow / grouped pandas / grouped Arrow /
    cogrouped pandas)."""
    import pyarrow as pa

    df = spark.createDataFrame(
        [(1, 10.0), (1, 30.0), (2, 5.0)], "k long, v double"
    )

    def center(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mean = pc.mean(tbl.column("v"))
        return tbl.set_column(
            tbl.schema.get_field_index("v"),
            "v",
            pc.subtract(tbl.column("v"), mean),
        )

    out = df.groupBy("k").applyInArrow(center, "k long, v double").collect()
    got = sorted((r["k"], r["v"]) for r in out)
    assert got == [(1, -10.0), (1, 10.0), (2, 0.0)]


def test_join_hints_control_strategy(spark):
    """SQL join hints must steer the physical strategy: BROADCAST forces a
    BroadcastHashJoin even when AQE would pick otherwise; MERGE forces
    SortMergeJoin even for a tiny broadcastable side. At 100 TB, hints are
    the manual override when stats mislead the optimizer."""
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet").createOrReplaceTempView("o_h")
    spark.read.parquet("/root/testdata/sf0.001/customer.parquet").createOrReplaceTempView("c_h")

    plan_b = spark.sql(
        "SELECT /*+ BROADCAST(c_h) */ * FROM o_h JOIN c_h ON o_custkey = c_custkey"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_b

    plan_m = spark.sql(
        "SELECT /*+ MERGE(c_h) */ * FROM o_h JOIN c_h ON o_custkey = c_custkey"
    )._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan_m and "BroadcastHashJoin" not in plan_m
