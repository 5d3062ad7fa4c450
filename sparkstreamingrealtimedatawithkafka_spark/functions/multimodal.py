"""Multimodal column support: opaque binary payloads + typed metadata.

Design (SURVEY.md §2.10): image/audio/video travel as ``binary`` columns
with struct metadata; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` stages so the heavy codec work happens
vectorized in the Python worker, partition-parallel, with no driver
involvement. The codec libraries (PIL/ffmpeg/librosa) are NOT in this
environment, so the decoders are explicit stubs: the Spark-side plumbing
(schema, batch iteration, partitioning) is real and tested; the codec body
is either a deterministic fake (``decode_binary_features``) or a
clearly-marked ``NotImplementedError`` (``decode_image``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
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


RESIZED_IMAGE_SCHEMA = "doc_id bigint, width int, height int, data binary"


def resize_image(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    blob_col: str = "blob",
) -> DataFrame:
    """STUB — real resize needs an image codec (PIL/opencv), absent here.

    The mapInPandas wiring is the production shape (same contract as
    ``decode_image``); only the codec body raises.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Raise at call time (not first-next time) so the worker surfaces
        # NotImplementedError instead of a generator-protocol type error.
        raise NotImplementedError(
            f"resize to {width}x{height} requires an image codec library "
            "(PIL/opencv); not available in this environment"
        )

    return df.mapInPandas(op, schema=RESIZED_IMAGE_SCHEMA)


IMAGE_FEATURES_SCHEMA = "doc_id bigint, width int, height int, mean_luma double"


def decode_image(df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob") -> DataFrame:
    """STUB — real image decode needs PIL/opencv, absent in this container.

    The mapInPandas wiring below is the production shape; only the codec
    call raises.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Raise at call time (not first-next time) so the worker surfaces
        # NotImplementedError instead of a generator-protocol type error.
        raise NotImplementedError(
            "image decode requires an image codec library (PIL/opencv); "
            "not available in this environment"
        )

    return df.mapInPandas(op, schema=IMAGE_FEATURES_SCHEMA)
