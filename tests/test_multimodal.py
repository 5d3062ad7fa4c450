"""Multimodal plumbing contract (functions/multimodal.py).

The codec libraries are absent by design (SURVEY.md §2.10); these tests pin
(a) the fan-out frame-sampling shape against a hand computation and
(b) that the stubbed codecs fail loudly (NotImplementedError through the
Python worker), not silently.
"""

import pytest
from pyspark.sql import functions as F

from sparkstreamingrealtimedatawithkafka_spark.functions.multimodal import (
    decode_image,
    resize_image,
    sample_frames,
)


def _blobs(spark, texts):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "doc_id long, text string"
    )
    return df.select("doc_id", F.encode("text", "utf-8").alias("blob"))


def test_sample_frames_matches_hand_computation(spark):
    # 40 chars -> frames of 4 chars -> 10 frames -> sampled idx 0,3,6,9
    text = "abcdefghij" * 4
    out = sample_frames(
        _blobs(spark, [text]), every=3, frame_chars=4
    ).collect()
    got = sorted((r.frame_idx, r.frame_off, r.frame_fp) for r in out)
    expect = [(i, i * 4, ord(text[i * 4])) for i in range(0, 10, 3)]
    assert got == expect
    assert all(r.doc_id == 0 for r in out)


def test_sample_frames_short_and_null_payloads_yield_no_frames(spark):
    # shorter than one frame -> zero rows; None blob skipped, not crashed
    df = spark.createDataFrame(
        [(0, b"abc"), (1, None)], "doc_id long, blob binary"
    )
    assert sample_frames(df, every=1, frame_chars=16).count() == 0


@pytest.mark.parametrize("op", [decode_image, lambda df: resize_image(df, 64, 64)])
def test_codec_stubs_fail_loudly(spark, op):
    df = _blobs(spark, ["some payload bytes"])
    with pytest.raises(Exception, match="NotImplementedError|not available"):
        op(df).collect()
