"""Streaming incremental top-k: the final ranking must be invariant to
how the corpus is sliced into micro-batches and equal to the batch
brute-force result — monotone selection guarantees the union of
per-batch winners contains the true top-k, and this pins it through the
real foreachBatch machinery at two slicings."""

from __future__ import annotations

import glob
import shutil
import tempfile

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from sparkstreamingrealtimedatawithkafka_spark.operators.similarity import (
    brute_force_topk,
)
from sparkstreamingrealtimedatawithkafka_spark.plans._util import t
from sparkstreamingrealtimedatawithkafka_spark.plans.streaming_queries import (
    _EMB_SCHEMA,
)
from sparkstreamingrealtimedatawithkafka_spark.streaming.incremental import (
    incremental_topk_query,
)
from sparkstreamingrealtimedatawithkafka_spark.streaming.pipeline import as_stream_dir

from conftest import SF_DIR


def _stream_topk(spark, n_slices: int) -> set:
    emb = t(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    work = tempfile.mkdtemp(prefix=f"ssk_topk_test_{n_slices}_")
    files = []
    for i in range(n_slices):
        sd = f"{work}/slice{i}"
        emb.filter(F.col("vec_id") % n_slices == i).coalesce(1).write.parquet(sd)
        files.extend(glob.glob(f"{sd}/part-*.parquet"))
    raw = (
        spark.readStream.schema(_EMB_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(as_stream_dir(*files))
    )
    q = incremental_topk_query(spark, raw, work, queries, k=5).start()
    q.awaitTermination()
    state = spark.read.parquet(f"{work}/topk")
    # bounded state: at most k rows per query per batch
    per = state.groupBy("query_id", "batch_id").count().agg(F.max("count")).collect()
    assert per[0][0] <= 5
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    rows = (
        state.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .collect()
    )
    shutil.rmtree(work, ignore_errors=True)
    return {(r.query_id, r.neighbor_id, r.rank) for r in rows}


def test_streaming_topk_equals_batch_and_slice_invariant(spark):
    emb = t(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    batch = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    s2 = _stream_topk(spark, 2)
    s3 = _stream_topk(spark, 3)
    assert s2 == batch
    assert s3 == batch
