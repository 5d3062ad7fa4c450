"""Edge inputs for the sequence-packing operator (constructed frames, not
the fixture — the fixture path is covered by the oracle gate and
test_training_pipeline_ops)."""

from __future__ import annotations

import pytest

from sparkstreamingrealtimedatawithkafka_spark.operators.packing import (
    doc_offsets,
    pack_blocks,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, n long")


def test_empty_corpus(spark):
    out = pack_blocks(_df(spark, []), "id", "n", block=8)
    assert out.count() == 0


def test_single_doc_spanning_many_blocks(spark):
    out = {
        r.seq_id: (r.n_docs, r.n_tokens)
        for r in pack_blocks(_df(spark, [(0, 20)]), "id", "n", block=8).collect()
    }
    assert out == {0: (1, 8), 1: (1, 8), 2: (1, 4)}


def test_zero_token_docs_occupy_nothing(spark):
    rows = [(0, 5), (1, 0), (2, 3), (3, 0)]
    out = {
        r.seq_id: (r.n_docs, r.n_tokens)
        for r in pack_blocks(_df(spark, rows), "id", "n", block=8).collect()
    }
    assert out == {0: (2, 8)}


def test_sparse_nondense_ids_keep_order(spark):
    # ids far apart across chunk boundaries; offsets must still be the
    # id-ordered cumulative sum
    rows = [(3, 4), (5000, 2), (90000, 6)]
    got = {
        r.id: r.start for r in doc_offsets(_df(spark, rows), "id", "n", chunk=10).collect()
    }
    assert got == {3: 0, 5000: 4, 90000: 6}


@pytest.mark.parametrize("chunk", [1, 2, 7, 1000])
def test_chunk_size_never_changes_results(spark, chunk):
    rows = [(i, (i * 7) % 5) for i in range(40)]
    expect = {}
    start = 0
    for i, n in rows:
        if n > 0:
            for s in range(start // 8, (start + n - 1) // 8 + 1):
                d, t = expect.get(s, (0, 0))
                expect[s] = (
                    d + 1,
                    t + min(start + n, (s + 1) * 8) - max(start, s * 8),
                )
        start += n
    got = {
        r.seq_id: (r.n_docs, r.n_tokens)
        for r in pack_blocks(
            _df(spark, rows), "id", "n", block=8, chunk=chunk
        ).collect()
    }
    assert got == expect
