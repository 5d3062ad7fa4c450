"""foreachBatch sink: the escape hatch for sinks Spark has no native
format for (upserts, JDBC, dual writes). Exactly-once here comes from the
(batch_id, checkpoint) pair — a replayed batch overwrites its own output
deterministically instead of appending twice."""

from __future__ import annotations

import os

from sparkstreamingrealtimedatawithkafka_spark.sources.formats import write_files
from sparkstreamingrealtimedatawithkafka_spark.sources.registry import load_table

from conftest import SF_DIR  # single source of truth for the fixture dir
SCHEMA = "n_nationkey int, n_name string, n_regionkey int"


def test_foreach_batch_idempotent_overwrite(spark, tmp_path):
    src_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    write_files(load_table(spark, SF_DIR, "nation"), src_dir, fmt="parquet")

    def upsert(batch_df, batch_id: int) -> None:
        # partition-by-batch overwrite: replaying batch_id N replaces its own
        # directory, so restarts cannot double-write
        batch_df.write.mode("overwrite").parquet(os.path.join(out_dir, f"batch={batch_id}"))

    stream = spark.readStream.schema(SCHEMA).parquet(src_dir)
    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    out = spark.read.parquet(os.path.join(out_dir, "batch=0"))
    src = load_table(spark, SF_DIR, "nation")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, src.collect()))
