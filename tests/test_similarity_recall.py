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

from conftest import SF_DIR  # single source of truth for the fixture dir


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


def _recall_at_5(spark, corpus, strategy, n_probe):
    queries = corpus.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(corpus, queries, k=5)
    approx = ivf_topk(
        corpus, queries, k=5, n_centroids=16, n_probe=n_probe,
        centroid_strategy=strategy,
    )
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    return len(exact_set & approx_set) / len(exact_set)


def test_ivf_kmeans_centroids_recall_ge_first_n(spark):
    """k-means-refined centroids vs first-N at equal probe budget on the
    fixture corpus. The fixture embeddings are ISOTROPIC random vectors —
    there are no modes to learn, so the strategies are comparable rather
    than kmeans-dominant (measured at k=5/16 centroids: first_n 0.98 at
    every probe budget; kmeans 0.94 @3 probes, crossing to 0.98 @5 and
    1.0 @6). The test pins the ≥ relation at the crossover and a floor at
    the default budget; the structured-data case where kmeans *dominates*
    is test_ivf_kmeans_beats_first_n_on_clustered_corpus."""
    emb = load_table(spark, SF_DIR, "embeddings")
    assert _recall_at_5(spark, emb, "kmeans", 6) >= _recall_at_5(spark, emb, "first_n", 6)
    assert _recall_at_5(spark, emb, "kmeans", 3) >= 0.9


def test_ivf_kmeans_beats_first_n_on_clustered_corpus(spark):
    """The scenario first-N centroids fail on: the first 16 corpus vectors
    all come from ONE mode of a clustered distribution, so first-N buckets
    carve up a single cluster and recall for queries in other modes
    collapses. Lloyd's passes recover the true modes."""
    import numpy as np

    rng = np.random.default_rng(11)
    modes = rng.normal(size=(8, 32)) * 5.0
    # ids 0..99 all drawn around mode 0 (the first-N trap), 100..899 spread
    vecs = [modes[0] + rng.normal(size=32) for _ in range(100)]
    for m in range(8):
        vecs.extend(modes[m] + rng.normal(size=32) for _ in range(100))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    # queries from every mode, not just mode 0
    queries = corpus.filter(F.col("vec_id").isin([150, 250, 350, 450, 550, 650, 750, 850, 0, 50]))

    exact = brute_force_topk(corpus, queries, k=5)
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}

    def recall(strategy):
        approx = ivf_topk(
            corpus, queries, k=5, n_centroids=16, n_probe=3,
            centroid_strategy=strategy,
        )
        got = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
        return len(exact_set & got) / len(exact_set)

    r_first, r_kmeans = recall("first_n"), recall("kmeans")
    assert r_kmeans > r_first, (
        f"kmeans {r_kmeans:.2f} should beat first_n {r_first:.2f} on clustered data"
    )
    assert r_kmeans >= 0.8


def test_embedding_cosine_dedup_sound_and_recalls(spark):
    """2-band 8-bit sign-LSH dedup: exact-cosine confirmation makes every
    reported dup TRUE (subset of exhaustive ground truth, zero false
    positives). Recall is graded where it matters: sign-LSH collision
    probability is (1 - θ/π)^bits per band, so weakly-similar pairs
    (sim 0.3 ⇒ θ≈72°, p≈0.017/band) are intentionally not blocked
    together at 256-bucket width, while true near-dups (sim ≥ 0.99,
    θ≈8°, p≈0.69/band ⇒ ≥0.9 over two bands) must be caught — pinned
    at full recall on the fixture's high-sim pairs."""
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
    # ground truth at the entry's confirm threshold, and the high-sim
    # subset (true near-dups) the banding must not lose
    true_dups, high_sim_dups = set(), set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if S[i, j] >= 0.3:
                true_dups.add(int(max(ids[i], ids[j])))
            if S[i, j] >= 0.99:
                high_sim_dups.add(int(max(ids[i], ids[j])))

    got = {
        r.dup_id
        for r in REGISTRY["dedup_embedding_cosine"].fn(spark, SF_DIR).collect()
    }
    assert got <= true_dups, "false positive near-dups reported"
    # The fixture has NO real near-dups (max pair sim ≈ 0.48): every
    # sim-0.3 pair is a weakly-similar random pair, which 256-bucket
    # banding intentionally does not chase. Recall on REAL near-dups is
    # proven on constructed data below.
    assert not high_sim_dups


def test_embedding_cosine_dedup_full_recall_on_real_near_dups(spark, tmp_path):
    """True near-dups (sim >= 0.99) must ALL be caught by the widened
    8-bit banding: a near-identical vector flips almost no signs, so both
    band values match its original's. Constructed corpus: 100 seeded
    random vectors + 20 near-copies with small noise."""
    import numpy as np

    from sparkstreamingrealtimedatawithkafka_spark.plans import REGISTRY

    rng = np.random.default_rng(7)
    base = rng.normal(size=(100, 64))
    dup_src = base[:20]
    noise = rng.normal(size=(20, 64)) * 0.01
    dups = dup_src + noise
    V = np.vstack([base, dups]).astype(np.float32)
    rows = [(i, [float(x) for x in V[i]], 0) for i in range(len(V))]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    Vn = V.astype(np.float64)
    Vn = Vn / np.linalg.norm(Vn, axis=1, keepdims=True)
    S = Vn @ Vn.T
    true_dups, high_sim_dups = set(), set()
    for i in range(len(V)):
        for j in range(i + 1, len(V)):
            if S[i, j] >= 0.3:
                true_dups.add(int(max(i, j)))
            if S[i, j] >= 0.99:
                high_sim_dups.add(int(max(i, j)))
    assert len(high_sim_dups) == 20  # every near-copy is a true dup

    got = {
        r.dup_id
        for r in REGISTRY["dedup_embedding_cosine"].fn(spark, str(tmp_path)).collect()
    }
    assert got <= true_dups, "false positive near-dups reported"
    assert high_sim_dups <= got, (
        f"missed true near-dups: {sorted(high_sim_dups - got)}"
    )


def test_int8_quantization_preserves_neighbors(spark):
    """Quantized top-3 must substantially agree with the exact float
    top-3 (the re-ranking pass only needs the true neighbors to SURVIVE
    the quantized stage, not to be perfectly ordered)."""
    from sparkstreamingrealtimedatawithkafka_spark.plans import REGISTRY
    from conftest import SF_DIR

    exact = REGISTRY["sim_topk_bruteforce"].fn(spark, SF_DIR).collect()
    quant = REGISTRY["sim_topk_int8_quantized"].fn(spark, SF_DIR).collect()
    # exact entry returns top-5 incl. self; compare per-query top-3 non-self
    ex = {}
    for r in exact:
        if r.neighbor_id != r.query_id:
            ex.setdefault(r.query_id, []).append(r.neighbor_id)
    qu = {}
    for r in quant:
        qu.setdefault(r.query_id, []).append(r.neighbor_id)
    hits = total = 0
    for qid, qn in qu.items():
        truth = set(ex.get(qid, [])[:3])
        hits += len(truth & set(qn))
        total += len(truth)
    assert total > 0
    assert hits / total >= 0.6, f"recall@3 {hits}/{total}"
