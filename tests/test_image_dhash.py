"""dHash properties: gradient bits survive uniform brightness shifts
(the reason dHash is the crawl-pipeline image dedup key), and the
packing never touches a sign bit."""

from __future__ import annotations

import numpy as np

from sparkstreamingrealtimedatawithkafka_spark.functions.multimodal import (
    encode_pgm,
    image_dhash,
)


def _hash_of(spark, px: np.ndarray):
    blob = encode_pgm(9, 8, 255, px.ravel())
    df = spark.createDataFrame([(1, bytearray(blob))], "doc_id LONG, blob BINARY")
    row = image_dhash(df).collect()[0]
    return row.h1, row.h2


def test_dhash_uniform_brightness_invariant(spark):
    rng = np.random.default_rng(7)
    px = rng.integers(60, 180, size=(8, 9), dtype=np.uint8)
    assert _hash_of(spark, px) == _hash_of(spark, px + 40)


def test_dhash_lanes_nonnegative_and_sensitive(spark):
    rng = np.random.default_rng(11)
    px = rng.integers(0, 255, size=(8, 9), dtype=np.uint8)
    h1, h2 = _hash_of(spark, px)
    assert 0 <= h1 < 2**32 and 0 <= h2 < 2**32
    flipped = px.copy()
    flipped[0, :] = flipped[0, ::-1]  # reverse one row -> gradient signs flip
    assert (h1, h2) != _hash_of(spark, flipped)
