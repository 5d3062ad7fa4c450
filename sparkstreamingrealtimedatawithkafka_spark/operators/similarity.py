"""Similarity search over embedding columns (``array<float>``).

Two paths, per the engine's scale posture:

- ``brute_force_topk`` — exact cosine top-k: broadcast the (small) query
  set, stream the candidate corpus through a BroadcastNestedLoopJoin, rank
  per query with a Window. Exact → DuckDB-oracle-checkable. At 100 TB the
  corpus side never shuffles; cost is O(|corpus| * |queries|) fused in
  codegen.
- ``ivf_topk`` — IVF-style approximate: assign every vector to its nearest
  of K centroids (bucketing), probe only the query's closest ``n_probe``
  buckets. Turns the scan into a bucket equi-join that prunes
  (1 - n_probe/K) of the corpus; the idiomatic Spark stand-in for a real
  ANN index. Approximate → rows-only check.

Norms are precomputed per side before pairing so the per-pair work is one
fused dot product (``functions/vector.py`` higher-order expressions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from sparkstreamingrealtimedatawithkafka_spark.functions.vector import dot, norm
from sparkstreamingrealtimedatawithkafka_spark.operators.skew import widen_for_compute


def _with_norm(df: DataFrame, vec: str, out: str) -> DataFrame:
    return df.withColumn(out, norm(F.col(vec)))


# The broadcast-crossJoin dot-product stages below do ~n_other x dim
# FLOPs per input row; see widen_for_compute's docstring (and the r10
# measured 15x) for why the corpus side is widened before them.


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors per query vector.

    Returns (query_id, neighbor_id, rank, sim); ties broken by neighbor id.
    """
    c = _with_norm(
        widen_for_compute(
            corpus.select(
                F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
            )
        ),
        "cvec",
        "cnorm",
    )
    q = _with_norm(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")),
        "qvec",
        "qnorm",
    )
    pairs = c.crossJoin(F.broadcast(q)).withColumn(
        "sim", dot(F.col("cvec"), F.col("qvec")) / (F.col("cnorm") * F.col("qnorm"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 4).alias("sim"))
    )


def assign_buckets(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 1,
    widen: bool = True,
) -> DataFrame:
    """Assign each vector to its ``n_probe`` nearest centroids by cosine.

    centroids: (centroid_id, cvec). Output: (id, vec, centroid_id).

    Shape (r14): the centroid table is folded into ONE row holding the
    (centroid_id, cvec, cnorm) array, broadcast, and each vector picks
    its ``n_probe`` nearest entries with pure array expressions —
    ``array_sort`` on (−csim, centroid_id) keys over k entries, then a
    slice + explode. The previous form ranked a crossJoin-exploded
    (vector × centroid) table with a row_number window PARTITIONED BY
    VECTOR ID, which shuffled the whole corpus (vectors included) once
    on id for the window and again for whatever keyed op came next —
    the assignment itself is a per-row argmin and never needed an
    exchange. Plan diff on ``sim_ivf_topk``: the corpus side drops from
    scan → Exchange(id) → Window → Exchange(centroid_id) to scan →
    Exchange(centroid_id); ordering semantics are identical (csim DESC,
    centroid_id ASC — the sort key packs −csim first, id second, and
    ties break to the smaller centroid exactly like the window did).

    ``widen=False`` skips widen_for_compute for callers assigning a frame
    whose compute is negligible (e.g. ivf_topk's ~32-row query probe side,
    r10 advice) — widening there is a pointless extra shuffle.

    Precondition (r14 advice #2): similarities must be FINITE AND
    NON-NULL — i.e. no null embedding elements and no zero-norm vectors.
    The old ``desc(csim)`` window sorted NaN first and NULL last, while
    the ascending struct sort puts a NaN negsim last and a NULL negsim
    field first, so a degenerate sim could be assigned differently than
    the pre-r14 shape. No fixture (and no caller in this repo) produces
    one: every embedding is a dense non-null array with a positive norm,
    and the oracle replays the assignment exactly. A caller feeding
    possibly-degenerate embeddings at scale must pre-filter
    (``norm(vec) > 0``, no null elements) or nanvl-guard before calling.
    """
    sel = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    v = _with_norm(widen_for_compute(sel) if widen else sel, "vec", "vnorm")
    c = _with_norm(centroids.select("centroid_id", "cvec"), "cvec", "cnorm")
    carr = c.agg(
        F.array_sort(
            F.collect_list(F.struct("centroid_id", "cvec", "cnorm"))
        ).alias("cents")
    )
    scored = v.crossJoin(F.broadcast(carr)).select(
        "id",
        "vec",
        F.slice(
            F.array_sort(
                F.transform(
                    "cents",
                    lambda ce: F.struct(
                        (
                            -dot(F.col("vec"), ce["cvec"])
                            / (F.col("vnorm") * ce["cnorm"])
                        ).alias("negsim"),
                        ce["centroid_id"].alias("centroid_id"),
                    ),
                )
            ),
            1,
            n_probe,
        ).alias("near"),
    )
    return scored.select(
        "id", "vec", F.explode("near.centroid_id").alias("centroid_id")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_strategy: str = "kmeans",
    kmeans_iters: int = 2,
) -> DataFrame:
    """Approximate top-k: IVF bucketing over ``n_centroids`` buckets.

    ``centroid_strategy``:
    - ``"kmeans"`` (default — the quality path a production pipeline
      wants): ``kmeans_iters`` Lloyd's passes refine a deterministic
      first-N init (operators/clustering.py:kmeans_centroids), so buckets
      track the data's actual modes. Driver holds only k x dim floats; the
      corpus never leaves the executors. Recall >= the first-N baseline is
      pinned in tests/test_similarity_recall.py.
    - ``"first_n"``: the first ``n_centroids`` corpus vectors — fully
      deterministic in ONE pass and SQL-replayable, the oracle-checkable
      baseline (the ``sim_ivf_topk`` catalog entry pins it explicitly).
      Weakness: if the first N vectors are correlated (clustered real
      data), the buckets are lopsided and recall collapses.

    CONTRACT (r14 advice #3): ``queries`` must be a query BATCH — small
    enough that |queries| x n_probe rows broadcast safely (well under the
    8 GB / 512M-row broadcast cap; in practice <= a few hundred thousand
    rows). The candidate join broadcasts the probe side UNCONDITIONALLY
    so the bucketed corpus never shuffles on the 16-value centroid key
    (static planning chose a SortMergeJoin there — corpus-sized rows over
    n_centroids hash buckets is exactly where a shuffle join skews at
    scale). A caller with a corpus-sized ``queries`` frame must chunk it
    into batches (or drop the broadcast hint); passing it whole would
    build an unbounded broadcast where static planning previously
    degraded gracefully to the skew-prone sort-merge join.
    """
    if centroid_strategy == "kmeans":
        from sparkstreamingrealtimedatawithkafka_spark.operators.clustering import (
            kmeans_centroids,
        )

        cents = kmeans_centroids(
            corpus,
            k=n_centroids,
            iters=kmeans_iters,
            id_col=id_col,
            vec_col=vec_col,
            metric="cosine",  # refinement must agree with the cosine bucketing
        )
        centroids = corpus.sparkSession.createDataFrame(
            [(i, c) for i, c in enumerate(cents)],
            "centroid_id int, cvec array<double>",
        )
    elif centroid_strategy == "first_n":
        centroids = corpus.filter(F.col(id_col) < n_centroids).select(
            F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cvec")
        )
    else:
        raise ValueError(f"unknown centroid_strategy {centroid_strategy!r}")
    bucketed = assign_buckets(corpus, centroids, id_col, vec_col, n_probe=1).select(
        F.col("id").alias("neighbor_id"), F.col("vec").alias("cvec_n"), "centroid_id"
    )
    probed = assign_buckets(
        queries, centroids, id_col, vec_col, n_probe=n_probe, widen=False
    ).select(
        F.col("id").alias("query_id"), F.col("vec").alias("qvec"), "centroid_id"
    )
    # The probe side is |queries| x n_probe rows — small by contract (a
    # query batch, not a corpus). Broadcast it explicitly so the bucketed
    # corpus never shuffles on centroid_id (static planning put a
    # SortMergeJoin here: 16 distinct join keys over corpus-sized rows is
    # also exactly where bucket skew would bite a shuffle join at scale);
    # with the assign_buckets array rewrite above this leaves the corpus
    # side with ZERO key exchanges end-to-end.
    cand = bucketed.join(F.broadcast(probed), "centroid_id").withColumn(
        "sim",
        dot(F.col("cvec_n"), F.col("qvec")) / (norm(F.col("cvec_n")) * norm(F.col("qvec"))),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 4).alias("sim"))
    )
