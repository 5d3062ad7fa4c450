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


IMAGE_FEATURES_SCHEMA = "doc_id bigint, width int, height int, mean_luma double"


def decode_image(df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob") -> DataFrame:
    """STUB — real image decode needs PIL/opencv, absent in this container.

    The mapInPandas wiring below is the production shape; only the codec
    call raises.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for _pdf in batches:
            raise NotImplementedError(
                "image decode requires an image codec library (PIL/opencv); "
                "not available in this environment"
            )

    return df.mapInPandas(op, schema=IMAGE_FEATURES_SCHEMA)
