"""Stream-stream LEFT OUTER join semantics pinned on constructed data:
matched rows emit immediately; unmatched left rows emit with nulls only
once the watermark proves no match can arrive; left rows still inside the
joinable horizon at end-of-stream are NOT emitted (no premature nulls)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreamingrealtimedatawithkafka_spark.streaming.pipeline import run_to_memory

CLICKS = [
    # (click_id, user, ts)         expectation
    (1, 1, "2026-01-01 08:00:00"),  # matched by purchase 101
    (2, 1, "2026-01-01 09:00:00"),  # unmatched, far below watermark → null row
    (3, 2, "2026-01-01 23:50:00"),  # unmatched but too recent → withheld
]
PURCHASES = [
    (101, 1, "2026-01-01 07:45:00"),   # 15 min before click 1
    (102, 2, "2026-01-01 23:59:00"),   # AFTER click 3 → not joinable (p_ts <= c_ts)
    (103, 3, "2026-01-02 00:00:00"),   # watermark driver: max event time
]


def _stream(spark, rows, schema, tmp_path, name):
    df = spark.createDataFrame(rows, schema).select(
        F.col(schema.split(",")[0].split()[0]).alias("id"),
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
    )
    path = str(tmp_path / name)
    df.coalesce(1).write.parquet(path)
    return spark.readStream.schema("id long, user_id long, ts timestamp").parquet(path)


def test_left_outer_emission_rules(spark, tmp_path):
    clicks = (
        _stream(spark, CLICKS, "click_id long, user_id long, ts string", tmp_path, "c")
        .select(F.col("id").alias("click_id"), "user_id", F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        _stream(spark, PURCHASES, "purchase_id long, user_id long, ts string", tmp_path, "p")
        .select(F.col("id").alias("purchase_id"), F.col("user_id").alias("p_user_id"),
                F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("p_ts") >= F.col("c_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("p_ts") <= F.col("c_ts")),
        "left_outer",
    ).select("click_id", "purchase_id")
    got = {(r["click_id"], r["purchase_id"]) for r in
           run_to_memory(joined, output_mode="append").collect()}

    # final watermark = 2026-01-02 00:00 - 1h = 23:00.
    # click 1: matched. click 2 (09:00): horizon long closed → null emitted.
    # click 3 (23:50): still joinable at end of stream → withheld.
    assert got == {(1, 101), (2, None)}
