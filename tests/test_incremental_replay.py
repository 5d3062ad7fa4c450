"""Replay idempotence of the foreachBatch incremental operators (the
dynamic-partition-overwrite claim, tested rather than narrated): wiping
the CHECKPOINT while keeping the STATE table simulates the worst
at-least-once failure — every micro-batch replays under its original
batch_id against a state table that already contains its output. A
replayed batch must REPLACE its own partition, so the state after the
replay run is IDENTICAL to the state after the first run (same rows, no
duplicates), for both incremental top-k and incremental dedup."""

from __future__ import annotations

import glob
import shutil
import tempfile

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from sparkstreamingrealtimedatawithkafka_spark.functions import text as TX
from sparkstreamingrealtimedatawithkafka_spark.streaming.incremental import (
    incremental_dedup_query,
    incremental_topk_query,
)
from sparkstreamingrealtimedatawithkafka_spark.streaming.pipeline import as_stream_dir

_EMB = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(DoubleType(), False), False),
    ]
)
_DOC = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), False),
    ]
)


def _slices(spark, rows, schema, work, n):
    files = []
    for b in range(n):
        members = [rows[i] for i in range(len(rows)) if i % n == b]
        sd = f"{work}/slice{b}"
        spark.createDataFrame(members, schema).coalesce(1).write.parquet(sd)
        files.extend(glob.glob(f"{sd}/part-*.parquet"))
    return as_stream_dir(*files)


def _run_stream(spark, stream_dir, schema, work, build_query):
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = build_query(raw).start()
    q.awaitTermination()


def test_topk_state_survives_full_replay(spark):
    rows = [
        (i, [((i * 13 + j * 7) % 31 + 1) / 32.0 for j in range(5)])
        for i in range(20)
    ]
    work = tempfile.mkdtemp(prefix="ssk_replay_topk_")
    try:
        emb = spark.createDataFrame(rows, _EMB)
        queries = emb.filter(F.col("vec_id") < 3)
        stream_dir = _slices(spark, rows, _EMB, work, 3)
        build = lambda raw: incremental_topk_query(  # noqa: E731
            spark, raw, work, queries, k=4
        )
        _run_stream(spark, stream_dir, _EMB, work, build)
        first = sorted(
            tuple(r) for r in spark.read.parquet(f"{work}/topk").collect()
        )
        # simulate crash-after-commit-loss: checkpoint gone, state intact
        shutil.rmtree(f"{work}/ckpt")
        _run_stream(spark, stream_dir, _EMB, work, build)
        replayed = sorted(
            tuple(r) for r in spark.read.parquet(f"{work}/topk").collect()
        )
        assert replayed == first
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_dedup_state_survives_full_replay(spark):
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]
    rows = []
    for f in range(6):
        body = " ".join(words[(f + p) % len(words)] for p in range(8))
        rows.append((2 * f, body + " tailone"))
        rows.append((2 * f + 1, body + " tailtwo"))
    work = tempfile.mkdtemp(prefix="ssk_replay_dedup_")
    try:
        stream_dir = _slices(spark, rows, _DOC, work, 3)

        def build(raw):
            stream = raw.select(
                "doc_id", TX.word_shingles("text", 2).alias("sh")
            )
            return incremental_dedup_query(
                spark, stream, work, "doc_id", "sh", jaccard_threshold=0.4
            )

        _run_stream(spark, stream_dir, _DOC, work, build)
        first = sorted(
            tuple(r) for r in spark.read.parquet(f"{work}/pairs").collect()
        )
        assert first, "corpus has near-dup pairs"
        shutil.rmtree(f"{work}/ckpt")
        _run_stream(spark, stream_dir, _DOC, work, build)
        replayed = sorted(
            tuple(r) for r in spark.read.parquet(f"{work}/pairs").collect()
        )
        assert replayed == first
    finally:
        shutil.rmtree(work, ignore_errors=True)
