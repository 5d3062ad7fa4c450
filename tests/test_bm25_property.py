"""Property test for the BM25 core: on randomized tiny corpora, the Spark
pipeline (the same shape as search_bm25_topk, over constructed docs) must
match an independent pure-python BM25 replay term-for-term — Hypothesis
drives the shapes the fixture can't: terms absent from the corpus,
single-doc corpora, documents made ENTIRELY of query terms, ties."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

K1, B = 1.2, 0.75
TERMS = ("alpha", "beta")
FILLER = ("x", "y", "z")


def _spark_bm25(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    toks = df.select("doc_id", F.explode(F.split("text", " ")).alias("tok")).filter(
        F.col("tok") != ""
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )
    qtoks = toks.filter(F.col("tok").isin(*TERMS))
    df_t = (
        qtoks.select("doc_id", "tok").distinct()
        .groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    )
    tf = qtoks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf_part = (F.col("tf") * (K1 + 1)) / (
        F.col("tf") + K1 * (1.0 - B + B * (F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf.join(df_t, "tok").join(dl, "doc_id").crossJoin(F.broadcast(stats))
        .groupBy("doc_id").agg(F.sum(idf * tf_part).alias("score"))
    )
    w = W.orderBy(F.desc("score"), F.asc("doc_id"))
    return {
        r["doc_id"]: (r["rank"], r["score"])
        for r in scored.withColumn("rank", F.row_number().over(w)).collect()
    }


def _python_bm25(docs):
    toks = {d: [t for t in text.split(" ") if t] for d, text in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {q: sum(1 for v in toks.values() if q in v) for q in TERMS}
    scores = {}
    for d, v in toks.items():
        s = 0.0
        for q in TERMS:
            tf = v.count(q)
            if tf == 0:
                continue
            idf = math.log(1.0 + (n - df[q] + 0.5) / (df[q] + 0.5))
            # Mirror the Spark expression tree EXACTLY: tf_part is one
            # subexpression (num/denom) multiplied by idf afterwards.
            # (idf*num)/denom differs in the last ulp and flips rank on
            # true ties — hypothesis found docs scoring identically in
            # exact arithmetic where association decided the rank.
            tf_part = (tf * (K1 + 1)) / (tf + K1 * (1.0 - B + B * (len(v) / avgdl)))
            s += idf * tf_part
        if s > 0:
            scores[d] = s
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return {d: (i + 1, s) for i, (d, s) in enumerate(ranked)}


@st.composite
def corpus(draw):
    n = draw(st.integers(1, 6))
    docs = []
    for i in range(n):
        words = draw(
            st.lists(st.sampled_from(TERMS + FILLER), min_size=1, max_size=12)
        )
        docs.append((i, " ".join(words)))
    return docs


@settings(max_examples=15, deadline=None)
@given(corpus())
def test_bm25_matches_python_replay(spark, docs):
    got = _spark_bm25(spark, docs)
    want = _python_bm25(docs)
    assert set(got) == set(want), "hit sets differ"
    for d, (rank, score) in want.items():
        grank, gscore = got[d]
        assert grank == rank, f"doc {d}: rank {grank} != {rank}"
        assert abs(gscore - score) < 1e-9, f"doc {d}: score {gscore} != {score}"
