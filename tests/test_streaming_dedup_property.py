"""Property test for streaming incremental dedup, the twin of
test_streaming_topk_property.py: for ANY Hypothesis-drawn batch count and
document-to-batch assignment, the final pair set after the REAL
foreachBatch run must equal the batch full-corpus LSH result, and no pair
may be emitted under two batch ids (the exactly-once / replay-idempotence
claim of the dynamic-partition-overwrite index discipline).

Synthetic corpus: near-dup families built deterministically from a drawn
seed, so each example's streaming run stays ~seconds; the fixture-corpus
twin at fixed slicings lives in test_streaming_incremental.py.
"""

from __future__ import annotations

import glob
import shutil
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from sparkstreamingrealtimedatawithkafka_spark.functions import text as TX
from sparkstreamingrealtimedatawithkafka_spark.operators.dedup import (
    lsh_candidate_pairs,
)
from sparkstreamingrealtimedatawithkafka_spark.streaming.incremental import (
    incremental_dedup_query,
)
from sparkstreamingrealtimedatawithkafka_spark.streaming.pipeline import as_stream_dir

N_DOCS = 18

_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), False),
    ]
)

_WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
]


def _corpus(seed: int):
    """Deterministic near-dup families: doc 3f and 3f+1 share a long
    common body (near-dups); 3f+2 is distinct. Word choice is a pure
    function of (seed, family, position)."""
    rows = []
    for f in range(N_DOCS // 3):
        body = " ".join(
            _WORDS[(seed + f * 7 + p) % len(_WORDS)] for p in range(10)
        )
        rows.append((3 * f, body + " " + _WORDS[(seed + f) % len(_WORDS)]))
        rows.append(
            (3 * f + 1, body + " " + _WORDS[(seed + f + 5) % len(_WORDS)])
        )
        rows.append(
            (
                3 * f + 2,
                " ".join(
                    _WORDS[(seed * 3 + f * 11 + p * 5) % len(_WORDS)]
                    for p in range(11)
                ),
            )
        )
    return rows


@settings(max_examples=5, deadline=None)
@given(
    seed=st.integers(0, 10**6),
    assign=st.lists(st.integers(0, 3), min_size=N_DOCS, max_size=N_DOCS),
)
def test_streaming_dedup_invariant_under_any_slicing(spark, seed, assign):
    rows = _corpus(seed)
    docs = spark.createDataFrame(rows, _SCHEMA)
    toks = docs.select("doc_id", TX.word_shingles("text", 2).alias("sh"))
    batch = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in lsh_candidate_pairs(
            toks, "doc_id", "sh", num_hashes=64, bands=16, jaccard_threshold=0.4
        ).collect()
    }

    work = tempfile.mkdtemp(prefix="ssk_dedup_prop_")
    try:
        files = []
        for b in sorted(set(assign)):
            members = [rows[i] for i in range(N_DOCS) if assign[i] == b]
            sd = f"{work}/slice{b}"
            spark.createDataFrame(members, _SCHEMA).coalesce(1).write.parquet(sd)
            files.extend(glob.glob(f"{sd}/part-*.parquet"))
        raw = (
            spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(as_stream_dir(*files))
        )
        stream = raw.select("doc_id", TX.word_shingles("text", 2).alias("sh"))
        q = incremental_dedup_query(
            spark, stream, work, "doc_id", "sh", jaccard_threshold=0.4
        ).start()
        q.awaitTermination()
        out = spark.read.parquet(f"{work}/pairs").collect()
    finally:
        shutil.rmtree(work, ignore_errors=True)

    pairs = [(r.id_a, r.id_b) for r in out]
    assert len(pairs) == len(set(pairs)), "pair emitted in more than one batch"
    got = {(r.id_a, r.id_b, round(r.jaccard, 9)) for r in out}
    assert got == batch
