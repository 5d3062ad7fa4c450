"""Property test for streaming incremental top-k (r7 verdict ask #7):
for ANY number of micro-batches and ANY assignment of vectors to batches
— Hypothesis-drawn, not the catalog entry's modulo convention — the final
ranking after the REAL foreachBatch run must equal the batch brute-force
top-k, and the state table must hold at most k rows per (query, batch)
(the bounded-state claim: state grows with batch count, never corpus
size).

The corpus is synthetic (deterministic function of a drawn seed) so each
example's streaming run stays ~seconds; the fixture-corpus twin at fixed
slicings lives in test_streaming_topk.py.
"""

from __future__ import annotations

import glob
import shutil
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window as W

from sparkstreamingrealtimedatawithkafka_spark.streaming.incremental import (
    incremental_topk_query,
)
from sparkstreamingrealtimedatawithkafka_spark.streaming.pipeline import as_stream_dir

N_VECS = 24
DIM = 6
K = 3

_SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(DoubleType(), False), False),
    ]
)


def _corpus(seed: int):
    """Deterministic pseudo-random embeddings: all strictly positive so no
    zero-norm rows, values fixed by (seed, i, j) alone."""
    return [
        (
            i,
            [((seed * 31 + i * 17 + j * 7) % 97 + 1) / 98.0 for j in range(DIM)],
        )
        for i in range(N_VECS)
    ]


def _batch_topk(spark, rows) -> set:
    from sparkstreamingrealtimedatawithkafka_spark.functions.vector import dot, norm

    emb = spark.createDataFrame(rows, _SCHEMA)
    q = (
        emb.filter(F.col("vec_id") < 3)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
        .withColumn("qnorm", norm(F.col("qvec")))
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cvec")
    ).withColumn("cnorm", norm(F.col("cvec")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .withColumn(
            "sim",
            dot(F.col("cvec"), F.col("qvec")) / (F.col("cnorm") * F.col("qnorm")),
        )
        .select("query_id", "neighbor_id", "sim")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= K)
        .collect()
    }


@settings(max_examples=5, deadline=None)
@given(
    seed=st.integers(0, 10**6),
    assign=st.lists(
        st.integers(0, 4), min_size=N_VECS, max_size=N_VECS
    ),
)
def test_streaming_topk_invariant_under_any_slicing(spark, seed, assign):
    rows = _corpus(seed)
    emb = spark.createDataFrame(rows, _SCHEMA)
    queries = emb.filter(F.col("vec_id") < 3)

    work = tempfile.mkdtemp(prefix="ssk_topk_prop_")
    try:
        files = []
        for b in sorted(set(assign)):
            members = [rows[i] for i in range(N_VECS) if assign[i] == b]
            sd = f"{work}/slice{b}"
            spark.createDataFrame(members, _SCHEMA).coalesce(1).write.parquet(sd)
            files.extend(glob.glob(f"{sd}/part-*.parquet"))
        raw = (
            spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(as_stream_dir(*files))
        )
        q = incremental_topk_query(spark, raw, work, queries, k=K).start()
        q.awaitTermination()

        state = spark.read.parquet(f"{work}/topk")
        # bounded state: <= k rows per (query, batch), for EVERY slicing
        worst = (
            state.groupBy("query_id", "batch_id")
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        assert worst <= K
        w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
        got = {
            (r["query_id"], r["neighbor_id"], r["rank"])
            for r in state.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= K)
            .collect()
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)

    assert got == _batch_topk(spark, rows)
