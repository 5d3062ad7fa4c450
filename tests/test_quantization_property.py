"""Property tests for the int8 embedding quantization
(functions/vector.py quantize_int8 — the sim_topk_int8_quantized core).

The r5 verdict asked for edge-case coverage beyond the pinned recall
test: constant dimensions (mn == mx), all-negative dimensions, and
recall-vs-float across generated corpora. Properties:

1. Engine-vs-replay exactness: Spark's codes equal a numpy replay of the
   identical formula on ARBITRARY finite inputs (Hypothesis) — including
   constant and all-negative dims.
2. Invariants: codes always in [-127, 127]; a constant dimension is all
   zeros; within a dimension the code is monotone in the value.
3. Recall vs float on seeded random corpora: float top-1 neighbor stays
   inside the quantized top-3 for every query (quantization is a ranking
   stage, so near-order preservation is the contract, not exact order).
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from sparkstreamingrealtimedatawithkafka_spark.functions.vector import quantize_int8

DIM = 4

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False, width=32
)
vec = st.lists(finite, min_size=DIM, max_size=DIM)


def _replay(vectors: list[list[float]]) -> list[list[int]]:
    a = np.asarray(vectors, dtype=np.float64)
    mn, mx = a.min(axis=0), a.max(axis=0)
    out = []
    for row in a:
        codes = []
        for d in range(DIM):
            if mn[d] == mx[d]:
                codes.append(0)
            else:
                # round-half-up like Spark/DuckDB ROUND(x, 0), not banker's
                x = (row[d] - mn[d]) / (mx[d] - mn[d]) * 254
                codes.append(int(math.floor(x + 0.5)) - 127)
        out.append(codes)
    return out


def _spark_codes(spark, vectors, dim=DIM):
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vectors)],
        "vec_id long, embedding array<double>",
    )
    rows = quantize_int8(df, "embedding", dim).collect()
    return [list(r.qv) for r in sorted(rows, key=lambda r: r.vec_id)]


@settings(max_examples=12, deadline=None)
@given(st.lists(vec, min_size=2, max_size=6))
def test_spark_matches_numpy_replay(spark, vectors):
    assert _spark_codes(spark, vectors) == _replay(vectors)


def test_constant_and_all_negative_dims(spark):
    # dim0 constant, dim1 constant-negative, dim2 all-negative varying,
    # dim3 spans zero
    vectors = [
        [5.0, -3.25, -100.0, -1.0],
        [5.0, -3.25, -50.0, 0.0],
        [5.0, -3.25, -1.0, 2.0],
    ]
    codes = _spark_codes(spark, vectors)
    assert [c[0] for c in codes] == [0, 0, 0]
    assert [c[1] for c in codes] == [0, 0, 0]
    assert codes[0][2] == -127 and codes[2][2] == 127
    assert codes[0][3] == -127 and codes[2][3] == 127
    for row in codes:
        assert all(-127 <= c <= 127 for c in row)


@settings(max_examples=10, deadline=None)
@given(st.lists(vec, min_size=2, max_size=6))
def test_codes_bounded_and_monotone(spark, vectors):
    codes = _spark_codes(spark, vectors)
    for row in codes:
        assert all(-127 <= c <= 127 for c in row)
    arr = np.asarray(vectors)
    for d in range(DIM):
        order = np.argsort(arr[:, d], kind="stable")
        col = [codes[i][d] for i in order]
        assert col == sorted(col), f"dim {d} not monotone in value"


def test_recall_vs_float_on_random_corpora(spark):
    # Clustered corpora at embedding-like dimensionality (32): per-dim
    # quantization error averages out across dims, so the float top-1
    # (a same-cluster member) must survive in the quantized top-3. At
    # DIM=4 with isotropic noise neighbors are statistically
    # interchangeable and NO 8-bit code could preserve their order —
    # that regime tests the data, not the quantizer.
    dim = 32
    rng = np.random.default_rng(42)
    for trial in range(3):
        centers = rng.normal(size=(8, dim)) * 4
        corpus = np.vstack(
            [c + rng.normal(size=(5, dim)) * 0.5 for c in centers]
        )
        codes = np.asarray(
            _spark_codes(spark, corpus.tolist(), dim=dim), dtype=np.float64
        )

        def top(mat, qi, k):
            sims = mat @ mat[qi] / (
                np.linalg.norm(mat, axis=1) * np.linalg.norm(mat[qi]) + 1e-12
            )
            sims[qi] = -np.inf
            return list(np.argsort(-sims, kind="stable")[:k])

        for qi in range(0, 40, 8):
            float_top1 = top(corpus, qi, 1)[0]
            q_top3 = top(codes, qi, 3)
            assert float_top1 in q_top3, (
                f"trial {trial} query {qi}: float top-1 {float_top1} "
                f"fell out of quantized top-3 {q_top3}"
            )
