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


def test_polymorphic_udtf_analyze_schema(spark):
    """Polymorphic UDTF (Spark 4 ``analyze``): the output schema is COMPUTED
    at plan time from the constant argument — here ``n_cols`` fixed-width
    text columns. This is the engine's surface for table functions whose
    shape depends on their call site (pivot-like expansions, configurable
    feature extractors) without declaring a static returnType."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import IntegerType, StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class FixedWidthSplit:
        @staticmethod
        def analyze(text: AnalyzeArgument, width: AnalyzeArgument, n_cols: AnalyzeArgument):
            assert n_cols.value is not None, "n_cols must be a constant"
            schema = StructType().add("n_filled", IntegerType())
            for i in range(n_cols.value):
                schema = schema.add(f"c{i}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text: str, width: int, n_cols: int):
            text = text or ""
            parts = [text[i * width : (i + 1) * width] or None for i in range(n_cols)]
            yield (sum(p is not None for p in parts), *parts)

    fws = udtf(FixedWidthSplit)
    spark.udtf.register("fixed_width_split", fws)

    r3 = spark.sql(
        "SELECT * FROM fixed_width_split('abcdefgh', 3, 3)"
    ).collect()[0]
    assert (r3["n_filled"], r3["c0"], r3["c1"], r3["c2"]) == (3, "abc", "def", "gh")

    # Same function, different constant → different schema at plan time.
    df5 = spark.sql("SELECT * FROM fixed_width_split('ab', 1, 5)")
    assert [f.name for f in df5.schema] == ["n_filled", "c0", "c1", "c2", "c3", "c4"]
    r5 = df5.collect()[0]
    assert (r5["n_filled"], r5["c0"], r5["c1"], r5["c2"]) == (2, "a", "b", None)
