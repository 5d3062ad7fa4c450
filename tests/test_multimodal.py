"""Multimodal codec contract (functions/multimodal.py).

PGM/P5 and RIFF/WAVE PCM16 have REAL pure-Python codecs (r6 — closing the
r5 'decode is a stub' gap); these tests pin
(a) the fan-out frame-sampling shape against a hand computation,
(b) PGM parse (incl. comment-bearing headers) and nearest-neighbor resize
    against hand-computed pixels,
(c) WAV encode->decode round-trip stats against numpy on the same samples,
(d) that genuinely-optional formats (JPEG magic, non-PCM audio) still fail
    loudly through the Python worker, never silently.
"""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkstreamingrealtimedatawithkafka_spark.functions.multimodal import (
    decode_audio,
    decode_bmp,
    decode_image,
    encode_audio_pcm16,
    encode_pgm,
    encode_wav_pcm16,
    parse_bmp,
    parse_pgm,
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


def test_parse_pgm_header_grammar_and_comments():
    px = np.arange(12, dtype=np.uint8)
    # comment between fields, multi-whitespace — the full P5 grammar
    b = b"P5\n# a comment\n4   3\n# another\n255\n" + px.tobytes()
    w, h, mv, got = parse_pgm(b)
    assert (w, h, mv) == (4, 3, 255)
    assert np.array_equal(got, px)
    # round-trip through the encoder
    w2, h2, mv2, got2 = parse_pgm(encode_pgm(4, 3, 255, px))
    assert (w2, h2, mv2) == (4, 3, 255) and np.array_equal(got2, px)


def test_decode_image_real_pgm_stats(spark):
    px = np.arange(64, dtype=np.uint8)
    df = spark.createDataFrame(
        [(7, bytearray(encode_pgm(8, 8, 255, px)))], "doc_id long, blob binary"
    )
    row = decode_image(df).collect()[0]
    assert (row.width, row.height, row.maxval) == (8, 8, 255)
    assert row.sum_luma == int(px.sum())
    assert row.mean_luma == px.sum() / 64


def test_resize_image_nearest_neighbor_hand_check(spark):
    # 4x2 image -> 2x1: output pixels are src (0,0) and (2,0)
    px = np.array([10, 20, 30, 40, 50, 60, 70, 80], dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_pgm(4, 2, 255, px)))], "doc_id long, blob binary"
    )
    row = resize_image(df, width=2, height=1).collect()[0]
    w, h, mv, got = parse_pgm(bytes(row.data))
    assert (w, h) == (2, 1)
    assert got.tolist() == [10, 30]


def test_wav_roundtrip_stats_match_numpy(spark):
    samples = np.array([0, 100, -200, 32767, -32768, 5], dtype=np.int64)
    df = spark.createDataFrame(
        [(3, [int(x) for x in samples])], "doc_id long, samples array<int>"
    )
    row = decode_audio(encode_audio_pcm16(df, sample_rate=44100)).collect()[0]
    assert row.sample_rate == 44100
    assert row.n_samples == len(samples)
    assert row.sum_abs == int(np.abs(samples).sum())
    assert row.max_abs == 32768


def test_wav_tolerates_extra_chunks(spark):
    import struct

    samples = np.array([1, -1, 7], dtype=np.int64)
    b = encode_wav_pcm16(samples, 8000)
    # splice a LIST chunk (odd size -> exercises word-alignment) before fmt
    extra = b"LIST\x05\x00\x00\x00INFOx\x00"
    b2 = b[:12] + extra + b[12:]
    b2 = b2[:4] + struct.pack("<I", len(b2) - 8) + b2[8:]
    df = spark.createDataFrame([(9, bytearray(b2))], "doc_id long, blob binary")
    row = decode_audio(df).collect()[0]
    assert row.n_samples == 3 and row.sum_abs == 9 and row.max_abs == 7


@pytest.mark.parametrize(
    "blob",
    [
        b"\xff\xd8\xff\xe0 jpeg-ish payload",  # JPEG magic
        b"P6\n2 2\n255\n" + b"\x00" * 12,  # PPM (color) magic
    ],
)
def test_optional_image_formats_fail_loudly(spark, blob):
    df = spark.createDataFrame([(0, bytearray(blob))], "doc_id long, blob binary")
    with pytest.raises(Exception, match="NotImplementedError|unsupported"):
        decode_image(df).collect()


def test_non_wave_audio_fails_loudly(spark):
    df = spark.createDataFrame(
        [(0, bytearray(b"fLaC some flac payload"))], "doc_id long, blob binary"
    )
    with pytest.raises(Exception, match="NotImplementedError|unsupported"):
        decode_audio(df).collect()


def _bmp_bytes(w, h, rows_bgr, top_down=False):
    """Build a 24bpp BMP from rows of (b, g, r) tuples, top image row
    first; rows are stored bottom-up unless top_down."""
    row_bytes = (w * 3 + 3) & ~3
    data_off = 14 + 40
    raster = b""
    stored = rows_bgr if top_down else list(reversed(rows_bgr))
    for row in stored:
        line = b"".join(bytes(p) for p in row)
        raster += line + b"\x00" * (row_bytes - len(line))
    hdr = struct.pack("<2sIHHI", b"BM", data_off + len(raster), 0, 0, data_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0,
        len(raster), 2835, 2835, 0, 0,
    )
    return hdr + info + raster


def test_parse_bmp_bottom_up_padding_and_channels():
    # 2x2 image, distinct channels per pixel; width 2 -> 6 raster bytes
    # padded to 8 per row: padding must be stripped, rows flipped.
    rows = [[(1, 2, 3), (4, 5, 6)], [(7, 8, 9), (10, 11, 12)]]
    w, h, px = parse_bmp(_bmp_bytes(2, 2, rows))
    assert (w, h) == (2, 2)
    assert px[0, 0].tolist() == [1, 2, 3] and px[1, 1].tolist() == [10, 11, 12]


def test_parse_bmp_top_down_flag():
    rows = [[(1, 1, 1)], [(2, 2, 2)]]
    _, _, px = parse_bmp(_bmp_bytes(1, 2, rows, top_down=True))
    assert px[0, 0, 0] == 1 and px[1, 0, 0] == 2


def test_parse_bmp_truncated_raster_raises():
    b = _bmp_bytes(2, 2, [[(0, 0, 0), (0, 0, 0)], [(0, 0, 0), (0, 0, 0)]])
    with pytest.raises(ValueError, match="truncated"):
        parse_bmp(b[:-5])


def test_parse_bmp_unsupported_variants_fail_loudly(spark):
    # PNG magic routed to BMP decode; 32bpp; OS/2 core header
    with pytest.raises(NotImplementedError, match="magic"):
        parse_bmp(b"\x89PNG\r\n\x1a\n rest")
    b32 = bytearray(_bmp_bytes(1, 1, [[(0, 0, 0)]]))
    b32[28:30] = struct.pack("<H", 32)
    with pytest.raises(NotImplementedError, match="24bpp"):
        parse_bmp(bytes(b32))
    core = bytearray(_bmp_bytes(1, 1, [[(0, 0, 0)]]))
    core[14:18] = struct.pack("<I", 12)
    with pytest.raises(NotImplementedError, match="OS/2"):
        parse_bmp(bytes(core))


def test_decode_bmp_channel_sums(spark):
    rows = [[(1, 2, 3), (4, 5, 6)], [(7, 8, 9), (10, 11, 12)]]
    df = spark.createDataFrame(
        [(5, bytearray(_bmp_bytes(2, 2, rows)))], "doc_id long, blob binary"
    )
    r = decode_bmp(df).collect()[0]
    assert (r.sum_b, r.sum_g, r.sum_r) == (1 + 4 + 7 + 10, 2 + 5 + 8 + 11, 3 + 6 + 9 + 12)


def test_audio_fingerprint_volume_invariant(spark):
    """The energy-sign fingerprint must be IDENTICAL under uniform volume
    scaling (the invariance the dedup entry relies on) and must differ
    for a genuinely different signal."""
    from sparkstreamingrealtimedatawithkafka_spark.functions.multimodal import (
        audio_fingerprint,
    )

    rng = np.random.default_rng(7)
    base = rng.integers(-8000, 8000, size=256).astype(np.int64)
    other = rng.integers(-8000, 8000, size=256).astype(np.int64)
    rows = [
        (1, [int(x) for x in base]),
        (2, [int(x) * 3 for x in base]),   # 3x volume
        (3, [int(x) for x in other]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, samples array<int>")
    fp = {
        r.doc_id: (r.h1, r.h2)
        for r in audio_fingerprint(
            encode_audio_pcm16(df, sample_rate=8000)
        ).collect()
    }
    assert fp[1] == fp[2]
    assert fp[1] != fp[3]


def test_audio_fingerprint_short_clip(spark):
    """Clips shorter than 64 frames still fingerprint (fewer bits, zeros
    beyond); a sub-frame clip yields the all-zero fingerprint rather than
    erroring."""
    from sparkstreamingrealtimedatawithkafka_spark.functions.multimodal import (
        audio_fingerprint,
    )

    rows = [(1, [100, -100, 50, 25, 999, 2, 3, 4]), (2, [5])]
    df = spark.createDataFrame(rows, "doc_id long, samples array<int>")
    fp = {
        r.doc_id: (r.h1, r.h2)
        for r in audio_fingerprint(
            encode_audio_pcm16(df, sample_rate=8000)
        ).collect()
    }
    assert fp[2] == (0, 0)
    assert fp[1][1] == 0  # only 1 comparison bit available -> h2 empty
