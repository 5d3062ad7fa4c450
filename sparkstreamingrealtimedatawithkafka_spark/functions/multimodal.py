"""Multimodal column support: opaque binary payloads + typed metadata.

Design (SURVEY.md §2.10): image/audio/video travel as ``binary`` columns
with struct metadata; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` / ``mapInArrow`` stages so the heavy
codec work happens vectorized in the Python worker, partition-parallel,
with no driver involvement.

Decode is REAL for the formats a pure-Python codec can own end-to-end:
PGM (P5 binary graymap — full header parse incl. comments, pixel stats,
nearest-neighbor resize with re-encode) and WAV (RIFF/WAVE PCM16 — chunk
walk, fmt parse, sample stats). Formats that genuinely need an external
codec library (JPEG/PNG/FLAC/...) dispatch on magic bytes to a
clearly-marked ``NotImplementedError`` — optional capability, loud
failure, never a silent wrong answer. ``decode_binary_features`` keeps
the format-agnostic fake for the generic plumbing tests.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame

BINARY_FEATURES_SCHEMA = "doc_id bigint, byte_len bigint, first_byte int"


def decode_binary_features(df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob") -> DataFrame:
    """Deterministic fake 'decode': byte length + first byte per blob.

    Stands in for a real codec while exercising the exact execution shape a
    real one uses (Arrow batches through ``mapInPandas``).
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "byte_len": pdf[blob_col].apply(len).astype("int64"),
                    "first_byte": pdf[blob_col].apply(
                        lambda b: int(b[0]) if len(b) else None
                    ),
                }
            )

    return df.mapInPandas(op, schema=BINARY_FEATURES_SCHEMA)


FRAME_SAMPLE_SCHEMA = "doc_id bigint, frame_idx int, frame_off int, frame_fp int"


def sample_frames(
    df: DataFrame,
    every: int = 4,
    frame_chars: int = 16,
    id_col: str = "doc_id",
    blob_col: str = "blob",
) -> DataFrame:
    """Frame sampling over an opaque 'video' blob: treat the payload as a
    sequence of fixed-size frames and emit one row per k-th frame.

    This is the fan-out multimodal shape (1 input row → n output rows
    through ``mapInPandas``), unlike ``decode_binary_features``'s 1:1 map.
    The frame fingerprint is a deterministic fake (codepoint of the frame's
    first char) standing in for a real per-frame decode; the batching,
    fan-out and schema are the production shape. Frames are cut on char
    boundaries so the DuckDB oracle can replay it with substr/unicode.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            offs: list[int] = []
            fps: list[int] = []
            for did, blob in zip(pdf[id_col], pdf[blob_col]):
                if blob is None:
                    continue
                s = bytes(blob).decode("utf-8")
                n_frames = len(s) // frame_chars
                for i in range(0, n_frames, every):
                    off = i * frame_chars
                    ids.append(did)
                    idxs.append(i)
                    offs.append(off)
                    fps.append(ord(s[off]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_off": pd.Series(offs, dtype="int32"),
                    "frame_fp": pd.Series(fps, dtype="int32"),
                }
            )

    return df.mapInPandas(op, schema=FRAME_SAMPLE_SCHEMA)


# ---------------------------------------------------------------------------
# Real pure-Python codecs: PGM (P5) images, WAV (RIFF PCM16) audio.
# ---------------------------------------------------------------------------


def parse_pgm(b: bytes) -> tuple[int, int, int, np.ndarray]:
    """Parse a binary PGM (P5) image: (width, height, maxval, pixels).

    Full header grammar: magic, then three whitespace-separated decimal
    fields (width, height, maxval), with ``#``-comments allowed anywhere
    whitespace is, then EXACTLY ONE whitespace byte before the raster.
    Pure function of the bytes — replayable by an oracle that knows the
    construction. Maxval > 255 (2-byte samples) and non-P5 magics raise.
    """
    if b[:2] != b"P5":
        raise NotImplementedError(
            f"unsupported image magic {b[:2]!r}: only PGM/P5 has a built-in "
            "codec; JPEG/PNG need an external library (PIL/opencv)"
        )
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":
            while pos < len(b) and b[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(b[start:pos]))
    pos += 1  # the single whitespace byte terminating the header
    w, h, maxval = vals
    if maxval > 255:
        raise NotImplementedError("2-byte-per-sample PGM not supported")
    if len(b) - pos < w * h:
        raise ValueError(f"truncated PGM raster: need {w*h}, have {len(b)-pos}")
    px = np.frombuffer(b, dtype=np.uint8, count=w * h, offset=pos)
    return w, h, maxval, px


def encode_pgm(w: int, h: int, maxval: int, px: np.ndarray) -> bytes:
    return f"P5\n{w} {h}\n{maxval}\n".encode() + px.astype(np.uint8).tobytes()


IMAGE_FEATURES_SCHEMA = (
    "doc_id bigint, width int, height int, maxval int, sum_luma bigint, "
    "mean_luma double"
)


def decode_image(df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob") -> DataFrame:
    """REAL image decode for PGM/P5 via ``mapInArrow``: header parse +
    exact integer pixel sum (+ the derived mean as a double — exact when
    w*h is a power of two, which the catalog constructions guarantee so
    both engines round identically). Non-PGM magics raise
    ``NotImplementedError`` loudly — optional-format contract."""

    def op(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(batch.schema.get_field_index(id_col)).to_pylist()
            blobs = batch.column(batch.schema.get_field_index(blob_col)).to_pylist()
            ws, hs, mvs, sums, means = [], [], [], [], []
            for b in blobs:
                w, h, mv, px = parse_pgm(bytes(b))
                s = int(px.sum())
                ws.append(w)
                hs.append(h)
                mvs.append(mv)
                sums.append(s)
                means.append(s / (w * h))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.int64()),
                    pa.array(ws, pa.int32()),
                    pa.array(hs, pa.int32()),
                    pa.array(mvs, pa.int32()),
                    pa.array(sums, pa.int64()),
                    pa.array(means, pa.float64()),
                ],
                names=["doc_id", "width", "height", "maxval", "sum_luma", "mean_luma"],
            )

    return df.mapInArrow(op, schema=IMAGE_FEATURES_SCHEMA)


RESIZED_IMAGE_SCHEMA = "doc_id bigint, width int, height int, data binary"


def resize_image(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    blob_col: str = "blob",
) -> DataFrame:
    """REAL nearest-neighbor resize for PGM/P5: decode, index-sample the
    pixel grid at ``src_idx = floor(dst_idx * src_dim / dst_dim)`` on both
    axes (numpy advanced indexing — vectorized per image), re-encode PGM.
    Deterministic, replayable: output pixel (x, y) is input pixel
    (x*src_w//w, y*src_h//h)."""

    def op(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(batch.schema.get_field_index(id_col)).to_pylist()
            blobs = batch.column(batch.schema.get_field_index(blob_col)).to_pylist()
            out = []
            for b in blobs:
                w, h, mv, px = parse_pgm(bytes(b))
                ys = (np.arange(height) * h) // height
                xs = (np.arange(width) * w) // width
                resized = px.reshape(h, w)[np.ix_(ys, xs)]
                out.append(encode_pgm(width, height, mv, resized.ravel()))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.int64()),
                    pa.array([width] * len(ids), pa.int32()),
                    pa.array([height] * len(ids), pa.int32()),
                    pa.array(out, pa.binary()),
                ],
                names=["doc_id", "width", "height", "data"],
            )

    return df.mapInArrow(op, schema=RESIZED_IMAGE_SCHEMA)


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """Minimal RIFF/WAVE container, PCM16 mono little-endian."""
    data = samples.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


AUDIO_FEATURES_SCHEMA = (
    "doc_id bigint, sample_rate int, n_samples bigint, sum_abs bigint, "
    "max_abs int"
)


def encode_audio_pcm16(
    df: DataFrame,
    id_col: str = "doc_id",
    samples_col: str = "samples",
    sample_rate: int = 8000,
) -> DataFrame:
    """Pack an int array column into a real WAV blob per row (mapInArrow):
    the encode half of the codec round-trip."""

    def op(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(batch.schema.get_field_index(id_col)).to_pylist()
            arrs = batch.column(batch.schema.get_field_index(samples_col)).to_pylist()
            blobs = [
                encode_wav_pcm16(np.asarray(a, dtype=np.int64), sample_rate)
                for a in arrs
            ]
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()), pa.array(blobs, pa.binary())],
                names=["doc_id", "blob"],
            )

    return df.mapInArrow(op, schema="doc_id bigint, blob binary")


def parse_wav_pcm16(b: bytes) -> tuple[int, np.ndarray]:
    """Parse a RIFF/WAVE PCM16 container: (sample_rate, int64 samples).
    Walks the chunk list (tolerating extra chunks before ``data``),
    parses ``fmt ``; compressed formats / non-WAVE containers raise
    ``NotImplementedError`` loudly. Pure function of the bytes."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise NotImplementedError(
            f"unsupported audio container {b[:4]!r}: only "
            "RIFF/WAVE has a built-in codec"
        )
    pos, rate, data = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (size,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, _channels, rate = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
            if fmt_tag != 1 or bits != 16:
                raise NotImplementedError(
                    f"only PCM16 supported (fmt={fmt_tag}, bits={bits})"
                )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if data is None or rate is None:
        raise ValueError("WAV missing fmt/data chunk")
    return rate, np.frombuffer(data, dtype="<i2").astype(np.int64)


def decode_audio(df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob") -> DataFrame:
    """REAL audio decode for RIFF/WAVE PCM16 via ``mapInArrow``
    (``parse_wav_pcm16``), reducing samples to exact integer stats
    (n, sum|x|, max|x|) — no float accumulation, so the oracle replay is
    hash-exact."""

    def op(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(batch.schema.get_field_index(id_col)).to_pylist()
            blobs = batch.column(batch.schema.get_field_index(blob_col)).to_pylist()
            rates, ns, sums, maxs = [], [], [], []
            for raw in blobs:
                rate, samples = parse_wav_pcm16(bytes(raw))
                rates.append(rate)
                ns.append(len(samples))
                sums.append(int(np.abs(samples).sum()))
                maxs.append(int(np.abs(samples).max()) if len(samples) else 0)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.int64()),
                    pa.array(rates, pa.int32()),
                    pa.array(ns, pa.int64()),
                    pa.array(sums, pa.int64()),
                    pa.array(maxs, pa.int32()),
                ],
                names=["doc_id", "sample_rate", "n_samples", "sum_abs", "max_abs"],
            )

    return df.mapInArrow(op, schema=AUDIO_FEATURES_SCHEMA)


def parse_bmp(b: bytes) -> tuple[int, int, np.ndarray]:
    """Parse an uncompressed 24bpp BMP (BITMAPINFOHEADER): returns
    (width, height, pixels[h, w, 3] BGR, top-down). Real-format grammar
    the toy codecs skip: rows are stored PADDED to 4-byte multiples and
    BOTTOM-UP unless height is negative (top-down flag). Palette, RLE,
    16/32bpp and BITMAPCOREHEADER dispatch to ``NotImplementedError``
    loudly — same optional-format contract as JPEG/PNG in ``parse_pgm``.
    Pure function of the bytes, so an oracle that knows the construction
    replays it exactly.
    """
    if b[:2] != b"BM":
        raise NotImplementedError(
            f"unsupported image magic {b[:2]!r}: only BMP/PGM have built-in codecs"
        )
    (data_off,) = struct.unpack("<I", b[10:14])
    (hdr_size,) = struct.unpack("<I", b[14:18])
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER (OS/2 BMP) not supported")
    w, h_raw = struct.unpack("<ii", b[18:26])
    _planes, bpp = struct.unpack("<HH", b[26:30])
    (compression,) = struct.unpack("<I", b[30:34])
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24bpp BMP supported (bpp={bpp}, compression={compression})"
        )
    top_down, h = h_raw < 0, abs(h_raw)
    row_bytes = (w * 3 + 3) & ~3  # 4-byte row alignment — the BMP trap
    if len(b) - data_off < row_bytes * h:
        raise ValueError(f"truncated BMP raster: need {row_bytes*h}, have {len(b)-data_off}")
    px = np.zeros((h, w, 3), np.uint8)
    for r in range(h):
        row = np.frombuffer(b, np.uint8, w * 3, data_off + r * row_bytes).reshape(w, 3)
        px[r if top_down else h - 1 - r] = row
    return w, h, px


BMP_FEATURES_SCHEMA = (
    "doc_id bigint, width int, height int, sum_b bigint, sum_g bigint, sum_r bigint"
)


def decode_bmp(df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob") -> DataFrame:
    """REAL BMP decode via ``mapInArrow``: full header walk (both header
    layers, padding, bottom-up flip) + exact per-channel integer sums —
    no float accumulation, so the replay oracle hash-checks."""

    def op(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(batch.schema.get_field_index(id_col)).to_pylist()
            blobs = batch.column(batch.schema.get_field_index(blob_col)).to_pylist()
            ws, hs, sb, sg, sr = [], [], [], [], []
            for raw in blobs:
                w, h, px = parse_bmp(bytes(raw))
                ws.append(w)
                hs.append(h)
                sb.append(int(px[:, :, 0].sum()))
                sg.append(int(px[:, :, 1].sum()))
                sr.append(int(px[:, :, 2].sum()))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.int64()),
                    pa.array(ws, pa.int32()),
                    pa.array(hs, pa.int32()),
                    pa.array(sb, pa.int64()),
                    pa.array(sg, pa.int64()),
                    pa.array(sr, pa.int64()),
                ],
                names=["doc_id", "width", "height", "sum_b", "sum_g", "sum_r"],
            )

    return df.mapInArrow(op, schema=BMP_FEATURES_SCHEMA)


def resample_audio(
    df: DataFrame,
    factor: int,
    id_col: str = "doc_id",
    blob_col: str = "blob",
) -> DataFrame:
    """REAL audio downsample for RIFF/WAVE PCM16 via ``mapInArrow``:
    decode (full chunk walk), decimate by taking every ``factor``-th
    sample (output i = input i*factor — deterministic, replayable; no
    anti-alias filter, the nearest-neighbor of audio, matching
    ``resize_image``'s contract), re-encode at rate/factor. The
    decode->transform->re-encode round trip on worker-produced bytes is
    the audio twin of ``resize_image``."""

    def op(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(batch.schema.get_field_index(id_col)).to_pylist()
            blobs = batch.column(batch.schema.get_field_index(blob_col)).to_pylist()
            out = []
            for raw in blobs:
                b = bytes(raw)
                if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                    raise NotImplementedError(
                        f"unsupported audio container {b[:4]!r}"
                    )
                pos, rate, data = 12, None, None
                while pos + 8 <= len(b):
                    cid = b[pos : pos + 4]
                    (size,) = struct.unpack("<I", b[pos + 4 : pos + 8])
                    body = b[pos + 8 : pos + 8 + size]
                    if cid == b"fmt ":
                        fmt_tag, _ch, rate = struct.unpack("<HHI", body[:8])
                        (bits,) = struct.unpack("<H", body[14:16])
                        if fmt_tag != 1 or bits != 16:
                            raise NotImplementedError("only PCM16 supported")
                    elif cid == b"data":
                        data = body
                    pos += 8 + size + (size & 1)
                if data is None or rate is None:
                    raise ValueError("WAV missing fmt/data chunk")
                samples = np.frombuffer(data, dtype="<i2")[::factor]
                out.append(encode_wav_pcm16(samples.astype(np.int64), rate // factor))
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()), pa.array(out, pa.binary())],
                names=["doc_id", "blob"],
            )

    return df.mapInArrow(op, schema="doc_id bigint, blob binary")


DHASH_SCHEMA = "doc_id bigint, h1 bigint, h2 bigint"


def image_dhash(df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob") -> DataFrame:
    """Perceptual difference-hash (dHash) of a PGM/P5 image: each of the
    h x (w-1) horizontal neighbor comparisons ``px[y,x] > px[y,x+1]``
    contributes one bit, packed little-endian into two BIGINT lanes
    (h1 = bits 0-31, h2 = bits 32-63 — two lanes so bit 63 never touches
    the sign bit, keeping the value oracle-replayable as a plain sum of
    powers of two). For the canonical 9x8 input that's the classic
    64-bit dHash. Gradient-based, so it survives uniform brightness
    shifts; pure function of the bytes — replayable like the codecs."""

    def op(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(batch.schema.get_field_index(id_col)).to_pylist()
            blobs = batch.column(batch.schema.get_field_index(blob_col)).to_pylist()
            h1s, h2s = [], []
            for b in blobs:
                w, h, _mv, px = parse_pgm(bytes(b))
                g = px.reshape(h, w).astype(np.int16)
                bits = (g[:, : w - 1] > g[:, 1:]).ravel()
                weights = np.left_shift(
                    np.int64(1), np.arange(bits.size, dtype=np.int64) % 32
                )
                vals = bits.astype(np.int64) * weights
                h1s.append(int(vals[:32].sum()))
                h2s.append(int(vals[32:64].sum()))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.int64()),
                    pa.array(h1s, pa.int64()),
                    pa.array(h2s, pa.int64()),
                ],
                names=["doc_id", "h1", "h2"],
            )

    return df.mapInArrow(op, schema=DHASH_SCHEMA)


AUDIO_FP_SCHEMA = "doc_id bigint, h1 bigint, h2 bigint"


def audio_fingerprint(
    df: DataFrame,
    frame: int = 4,
    id_col: str = "doc_id",
    blob_col: str = "blob",
) -> DataFrame:
    """Amplitude-invariant audio fingerprint (the dHash idea in the time
    domain): frame energies E_k = Σ|x| per ``frame`` samples, one bit per
    adjacent-energy comparison ``E_{k+1} > E_k``, packed little-endian
    into two BIGINT lanes (up to 64 bits; extra frames ignored). A
    volume-scaled copy multiplies every E_k by the same factor, so the
    comparison bits — and the fingerprint — are IDENTICAL: the invariance
    that makes this a dedup key across re-encoded/normalized uploads.
    Pure function of the bytes, replayable by a SQL oracle."""

    def op(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(batch.schema.get_field_index(id_col)).to_pylist()
            blobs = batch.column(batch.schema.get_field_index(blob_col)).to_pylist()
            h1s, h2s = [], []
            for raw in blobs:
                _rate, samples = parse_wav_pcm16(bytes(raw))
                n_frames = len(samples) // frame
                e = (
                    np.abs(samples[: n_frames * frame])
                    .reshape(n_frames, frame)
                    .sum(axis=1)
                )
                bits = (e[1:] > e[:-1])[:64]
                weights = np.left_shift(
                    np.int64(1), np.arange(bits.size, dtype=np.int64) % 32
                )
                vals = bits.astype(np.int64) * weights
                h1s.append(int(vals[:32].sum()))
                h2s.append(int(vals[32:64].sum()))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.int64()),
                    pa.array(h1s, pa.int64()),
                    pa.array(h2s, pa.int64()),
                ],
                names=["doc_id", "h1", "h2"],
            )

    return df.mapInArrow(op, schema=AUDIO_FP_SCHEMA)
