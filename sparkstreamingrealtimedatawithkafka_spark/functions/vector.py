"""Vector column expressions for embedding similarity.

All pure higher-order-function expressions (``zip_with`` + ``aggregate``) —
JVM-side, codegen'd, no Python workers. Elements are cast to double before
arithmetic so results are stable and match a double-precision SQL oracle.

At 100 TB scale these run inside whole-stage codegen per row; the expensive
part of similarity search is the *pairing* strategy (see
``operators/similarity.py``), not the per-pair math.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
