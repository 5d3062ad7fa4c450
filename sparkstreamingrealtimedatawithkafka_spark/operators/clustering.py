"""Iterative clustering (Lloyd's k-means) over embedding columns — the
engine's representative for iterative algorithms, the class of workload
that is NOT one SQL statement (each iteration is a full pass whose output
parameterizes the next).

Spark-first shape per iteration:
- centroids live on the DRIVER (k × dim floats — trivially small) and are
  broadcast into the assignment join; the 100 TB point set never moves.
- assignment = broadcast cross join + per-point argmin (one narrow pass,
  no shuffle of the points);
- centroid update = posexplode(vec) → groupBy(cluster, pos) mean →
  regroup to arrays: one shuffle of (cluster, pos, partial sums), i.e.
  k × dim rows — independent of point count after the map-side partial
  aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def assign_nearest(points: DataFrame, centroids: list[list[float]], id_col: str, vec_col: str) -> DataFrame:
    """(id, vec, cluster): nearest centroid by squared euclidean distance,
    ties to the lowest cluster id. Centroids ride in as one literal array
    column (driver-side constants, no join)."""
    cents = F.array(*[
        F.array(*[F.lit(float(v)) for v in c]) for c in centroids
    ])
    dists = F.transform(cents, lambda c: _sq_dist(F.col(vec_col).cast("array<double>"), c))
    best = F.array_position(dists, F.array_min(dists)).cast("int") - 1
    return points.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), best.alias("cluster")
    )


def update_centroids(
    assigned: DataFrame, prev_centroids: list[list[float]]
) -> list[list[float]]:
    """Element-wise mean per cluster, returned to the driver (k × dim).

    Keyed by cluster id, NOT by position in the collected result: a cluster
    that received no points keeps its previous centroid, so the returned
    list stays aligned with cluster ids (cluster id == list index in
    ``assign_nearest``) even when clusters empty out mid-iteration."""
    rows = (
        assigned.select("cluster", F.posexplode("vec").alias("pos", "val"))
        .groupBy("cluster", "pos")
        .agg(F.avg("val").alias("m"))
        .groupBy("cluster")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("cluster", F.col("pm.m").alias("centroid"))
        .collect()
    )
    by_id = {r["cluster"]: list(r["centroid"]) for r in rows}
    return [by_id.get(i, prev_centroids[i]) for i in range(len(prev_centroids))]


def kmeans(
    points: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means with deterministic init (the k lowest-id vectors).
    Returns the final assignment (id, cluster)."""
    init = (
        points.orderBy(id_col)
        .limit(k)
        .select(F.col(vec_col).cast("array<double>").alias("v"))
        .collect()
    )
    centroids = [r["v"] for r in init]
    assigned = None
    for _ in range(iters):
        assigned = assign_nearest(points, centroids, id_col, vec_col)
        centroids = update_centroids(assigned, centroids)
    return assigned.select("id", "cluster")
