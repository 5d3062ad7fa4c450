"""IVF approximate top-k recall vs exact brute force — the claim in
operators/similarity.py's docstring, made checkable: with 3 of 16 buckets
probed on the fixture embeddings, recall@5 must clear a floor and the
returned similarities must be a subset of the exact pair similarities.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreamingrealtimedatawithkafka_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
)
from sparkstreamingrealtimedatawithkafka_spark.sources.registry import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_ivf_recall_at_5(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)

    exact = brute_force_topk(emb, queries, k=5)
    approx = ivf_topk(emb, queries, k=5, n_centroids=16, n_probe=3)

    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    approx_rows = approx.collect()
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx_rows}

    # every query answered with k rows
    per_q = {}
    for r in approx_rows:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert len(per_q) == 10
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())

    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, f"IVF recall@5 collapsed: {recall:.2f}"

    # approximate sims must agree with the exact sims for shared pairs
    exact_sim = {(r["query_id"], r["neighbor_id"]): r["sim"] for r in exact.collect()}
    for r in approx_rows:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_sim:
            assert r["sim"] == exact_sim[key]


def test_embedding_cosine_dedup_sound_and_recalls(spark):
    """2-band sign-LSH dedup: exact-cosine confirmation makes every reported
    dup TRUE (subset of exhaustive ground truth, zero false positives);
    banding trades recall for scale — floor pinned at the measured ~0.27
    (theory for 2 bands x 4 bits at sim 0.3 is ~0.25)."""
    import numpy as np

    from sparkstreamingrealtimedatawithkafka_spark.plans import REGISTRY

    rows = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    V = np.array([r.embedding for r in rows], dtype=np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = Vn @ Vn.T
    # ground truth: ids that have a >= 0.3 neighbor with a smaller id
    true_dups = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if S[i, j] >= 0.3:
                true_dups.add(int(max(ids[i], ids[j])))

    got = {
        r.dup_id
        for r in REGISTRY["dedup_embedding_cosine"].fn(spark, SF_DIR).collect()
    }
    assert got <= true_dups, "false positive near-dups reported"
    assert len(got) / len(true_dups) >= 0.15
