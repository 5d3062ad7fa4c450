"""Python UDTF (table function) — the third user-function surface next to
the scalar pandas UDF (U1) and applyInPandasWithState. The reference has
none (SURVEY.md §2.4); this pins the engine's pattern for one: a
text-chunking UDTF of the kind an LLM-data pipeline uses to split
documents into training windows."""

from __future__ import annotations

import pytest
from pyspark.sql.functions import lit, udtf


@udtf(returnType="chunk_idx int, chunk string, n_tokens int")
class ChunkText:
    """Split whitespace-tokenized text into fixed-size token chunks."""

    def eval(self, text: str, chunk_tokens: int):
        if not text:
            return
        toks = [t for t in text.split(" ") if t]
        for i in range(0, len(toks), chunk_tokens):
            window = toks[i : i + chunk_tokens]
            yield i // chunk_tokens, " ".join(window), len(window)


def test_udtf_chunks_text(spark):
    out = ChunkText(lit("a b c d e f g"), lit(3)).collect()
    assert [(r["chunk_idx"], r["chunk"], r["n_tokens"]) for r in out] == [
        (0, "a b c", 3),
        (1, "d e f", 3),
        (2, "g", 1),
    ]


def test_udtf_lateral_join_over_table(spark):
    spark.udtf.register("chunk_text", ChunkText)
    spark.createDataFrame(
        [(1, "w x y z"), (2, ""), (3, None)], "doc_id long, text string"
    ).createOrReplaceTempView("docs_udtf")
    rows = spark.sql(
        """
        SELECT doc_id, chunk_idx, chunk
        FROM docs_udtf, LATERAL chunk_text(text, 2)
        ORDER BY doc_id, chunk_idx
        """
    ).collect()
    # empty/null docs yield no chunks (generator contract: silent drop,
    # same shape as the reference's explode-over-empty-array)
    assert [(r["doc_id"], r["chunk_idx"], r["chunk"]) for r in rows] == [
        (1, 0, "w x"),
        (1, 1, "y z"),
    ]
