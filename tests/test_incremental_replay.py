"""Replay idempotence of the foreachBatch incremental operators (the
dynamic-partition-overwrite claim, tested rather than narrated): wiping
the CHECKPOINT while keeping the STATE table simulates the worst
at-least-once failure — every micro-batch replays under its original
batch_id against a state table that already contains its output. A
replayed batch must REPLACE its own partition, so the state after the
replay run is IDENTICAL to the state after the first run (same rows, no
duplicates), for both incremental top-k and incremental dedup."""

from __future__ import annotations

import atexit
import glob
import shutil
import tempfile

from hypothesis import given, settings, strategies as st
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
    dedup_batch_processor,
    incremental_dedup_query,
    incremental_topk_query,
    topk_batch_processor,
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


# ---------------------------------------------------------------------------
# Partial-replay property (r8 verdict ask #4): the full-replay tests above
# cover ONE schedule — checkpoint wiped, every batch replays. At-least-once
# reality is broader: the stream can resume from ANY batch k while the state
# tables already contain contributions from batches up to m-1 for ANY m >= k
# (m == k is a clean resume; m > k is a future-contaminated index, the shape
# that broke the r1-r7 `!=` join). The invariant that makes all of these
# converge is pair ownership: a cross-batch pair is owned by
# max(batch(a), batch(b)), so replaying batches k..n-1 — whatever state the
# index was left in — must reproduce the clean forward run's state EXACTLY.
# Hypothesis walks the (k, m) grid; the processor is driven directly
# (dedup_batch_processor) because the streaming engine can't be coaxed into
# arbitrary resume points.
# ---------------------------------------------------------------------------

_N_BATCHES = 4
_DEDUP_KW = dict(num_hashes=32, bands=8, jaccard_threshold=0.4)


def _dedup_corpus():
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]
    rows = []
    for f in range(6):
        body = " ".join(words[(f + p) % len(words)] for p in range(8))
        rows.append((2 * f, body + " tailone"))
        rows.append((2 * f + 1, body + " tailtwo"))
    return rows


def _dedup_batches(spark):
    """Round-robin slices -> near-dup mates land in different batches, so
    the baseline necessarily contains cross-batch pairs."""
    rows = _dedup_corpus()
    return [
        spark.createDataFrame(
            [rows[i] for i in range(len(rows)) if i % _N_BATCHES == b], _DOC
        ).select("doc_id", TX.word_shingles("text", 2).alias("sh"))
        for b in range(_N_BATCHES)
    ]


def _state(spark, work):
    out = {}
    for table in ("pairs", "bands", "tokens"):
        out[table] = sorted(
            tuple(r) for r in spark.read.parquet(f"{work}/{table}").collect()
        )
    return out


_BASELINE: dict = {}


def _dedup_baseline(spark):
    """Clean forward run 0..n-1, computed once per session (each Hypothesis
    example only pays for its own replay, not a fresh baseline)."""
    if not _BASELINE:
        work = tempfile.mkdtemp(prefix="ssk_replay_base_")
        atexit.register(shutil.rmtree, work, ignore_errors=True)
        proc = dedup_batch_processor(spark, work, "doc_id", "sh", **_DEDUP_KW)
        for b, df in enumerate(_dedup_batches(spark)):
            proc(df, b)
        state = _state(spark, work)
        pair_batches = {r[-1] for r in state["pairs"]}
        assert len(pair_batches) > 1, (
            "fixture must emit pairs in multiple batches or the property "
            "checks nothing"
        )
        _BASELINE.update(work=work, state=state)
    return _BASELINE


@settings(max_examples=8, deadline=None)
@given(data=st.data())
def test_dedup_partial_replay_from_any_point(spark, data):
    base = _dedup_baseline(spark)
    k = data.draw(st.integers(1, _N_BATCHES - 1), label="resume_batch_k")
    m = data.draw(st.integers(k, _N_BATCHES), label="index_state_through_m")
    work = tempfile.mkdtemp(prefix="ssk_replay_part_")
    try:
        # State as the crash left it: partitions 0..m-1 survive (m >= k —
        # the index may be AHEAD of the checkpoint), the rest are gone.
        for table in ("pairs", "bands", "tokens"):
            shutil.copytree(f"{base['work']}/{table}", f"{work}/{table}")
            for b in range(m, _N_BATCHES):
                shutil.rmtree(
                    f"{work}/{table}/batch_id={b}", ignore_errors=True
                )
        proc = dedup_batch_processor(spark, work, "doc_id", "sh", **_DEDUP_KW)
        batches = _dedup_batches(spark)
        for b in range(k, _N_BATCHES):
            proc(batches[b], b)
        assert _state(spark, work) == base["state"], (
            f"resume at k={k} over index state through m={m} diverged from "
            "the clean forward run"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


_TOPK_ROWS = [
    (i, [((i * 13 + j * 7) % 31 + 1) / 32.0 for j in range(5)])
    for i in range(20)
]


def _topk_batches(spark):
    return [
        spark.createDataFrame(
            [_TOPK_ROWS[i] for i in range(len(_TOPK_ROWS)) if i % _N_BATCHES == b],
            _EMB,
        )
        for b in range(_N_BATCHES)
    ]


_TOPK_BASELINE: dict = {}


def _topk_baseline(spark):
    if not _TOPK_BASELINE:
        work = tempfile.mkdtemp(prefix="ssk_replay_topk_base_")
        atexit.register(shutil.rmtree, work, ignore_errors=True)
        queries = spark.createDataFrame(_TOPK_ROWS[:3], _EMB)
        proc = topk_batch_processor(spark, work, queries, k=4)
        for b, df in enumerate(_topk_batches(spark)):
            proc(df, b)
        state = sorted(
            tuple(r) for r in spark.read.parquet(f"{work}/topk").collect()
        )
        _TOPK_BASELINE.update(work=work, state=state)
    return _TOPK_BASELINE


@settings(max_examples=6, deadline=None)
@given(data=st.data())
def test_topk_partial_replay_from_any_point(spark, data):
    """Top-k's per-batch state reads nothing from other batches, so
    replay idempotence rests on dynamic partition overwrite alone — the
    same (k, m) grid as the dedup property pins that this stays true
    (a regression to append-mode or a non-partitioned layout would fail
    here on any k < m draw)."""
    base = _topk_baseline(spark)
    k = data.draw(st.integers(1, _N_BATCHES - 1), label="resume_batch_k")
    m = data.draw(st.integers(k, _N_BATCHES), label="state_through_m")
    work = tempfile.mkdtemp(prefix="ssk_replay_topk_part_")
    try:
        shutil.copytree(f"{base['work']}/topk", f"{work}/topk")
        for b in range(m, _N_BATCHES):
            shutil.rmtree(f"{work}/topk/batch_id={b}", ignore_errors=True)
        queries = spark.createDataFrame(_TOPK_ROWS[:3], _EMB)
        proc = topk_batch_processor(spark, work, queries, k=4)
        batches = _topk_batches(spark)
        for b in range(k, _N_BATCHES):
            proc(batches[b], b)
        got = sorted(
            tuple(r) for r in spark.read.parquet(f"{work}/topk").collect()
        )
        assert got == base["state"], (
            f"top-k resume at k={k} over state through m={m} diverged"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
