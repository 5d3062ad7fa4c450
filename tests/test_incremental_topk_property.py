"""Slice-invariance property of incremental top-k maintenance: for ANY
base/delta partition of the corpus, re-rank(topk(base) ∪ scores(delta))
must equal the full-corpus brute-force top-k bit-for-bit — the monotone-
selection argument (the true top-k of base ∪ delta is contained in
topk(base) ∪ delta) holds for every split, not just the catalog entry's
vec_id % 10 convention, and this pins it on three other splits."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from sparkstreamingrealtimedatawithkafka_spark.functions.vector import dot, norm
from sparkstreamingrealtimedatawithkafka_spark.plans._util import t

SF_DIR = "/root/testdata/sf0.001"


def _scored(corpus, q):
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cvec")
    ).withColumn("cnorm", norm(F.col("cvec")))
    return (
        c.crossJoin(F.broadcast(q))
        .withColumn(
            "sim",
            dot(F.col("cvec"), F.col("qvec"))
            / (F.col("cnorm") * F.col("qnorm")),
        )
        .select("query_id", "neighbor_id", "sim")
    )


def _topk(scores, k):
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def test_incremental_equals_recompute_on_any_slice(spark):
    emb = t(spark, SF_DIR, "embeddings")
    q = (
        emb.filter(F.col("vec_id") < 10)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qvec"),
        )
        .withColumn("qnorm", norm(F.col("qvec")))
    )
    full = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in _topk(_scored(emb, q), 5).collect()
    }
    for mod, res in ((3, 0), (7, 2), (2, 1)):
        base = emb.filter(F.col("vec_id") % mod != res)
        delta = emb.filter(F.col("vec_id") % mod == res)
        state = _topk(_scored(base, q), 5).select(
            "query_id", "neighbor_id", "sim"
        )
        merged = state.unionByName(_scored(delta, q))
        inc = {
            (r["query_id"], r["neighbor_id"], r["rank"])
            for r in _topk(merged, 5).collect()
        }
        assert inc == full, f"slice %{mod}=={res} diverged from recompute"
