"""Exact distributed order statistics via two-pass histogram refinement.

The general recipe for exact medians/quantiles at 100 TB without ever
sorting fact-cardinality data in one partition (the single-partition
window funnel): pass 1 aggregates weight into fixed-width value buckets
and scans the BUCKET table for the threshold crossing; pass 2 re-reads
only the crossing bucket's rows and finds the exact value inside it.
Both windows are bounded — per-group bucket count in pass 1, one
bucket's distinct values in pass 2. All thresholds and cumulative sums
are BIGINT, so the crossing comparison can never ulp-flip.

Used by ``agg_weighted_median_2pass`` (inline, quantity-weighted) and
``events_outlier_mad_2pass`` (twice: median, then median of absolute
deviations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def exact_median_2pass(
    df: DataFrame, group_col: str, value_col: str, width: int
) -> DataFrame:
    """Lower median per group: the smallest value v with
    ``cum_count(<= v) >= (n + 1) div 2``. Returns (group_col, median,
    n_rows). ``width`` is the pass-1 bucket width in the value's own
    integer units — any positive value is correct; pick one that keeps
    (value range / width) in the hundreds so the pass-1 window input
    stays tiny."""
    vals = df.select(F.col(group_col).alias("g"), F.col(value_col).alias("v"))
    b = vals.groupBy("g", F.expr(f"v div {width}").alias("bkt")).agg(
        F.count(F.lit(1)).alias("c")
    )
    wc = W.partitionBy("g").orderBy("bkt").rowsBetween(W.unboundedPreceding, 0)
    cumb = b.withColumn("cw", F.sum("c").over(wc))
    tot = b.groupBy("g").agg(
        F.expr("CAST((sum(c) + 1) div 2 AS BIGINT)").alias("thresh"),
        F.sum("c").alias("n_rows"),
    )
    wpick = W.partitionBy("g").orderBy("bkt")
    med_bkt = (
        cumb.join(tot, "g")
        .filter(F.col("cw") >= F.col("thresh"))
        .withColumn("rn", F.row_number().over(wpick))
        .filter(F.col("rn") == 1)
        .select(
            F.col("g").alias("mg"),
            F.col("bkt").alias("mbkt"),
            (F.col("cw") - F.col("c")).alias("prior_cw"),
            "thresh",
            "n_rows",
        )
    )
    in_bucket = vals.join(
        F.broadcast(med_bkt),
        (F.col("g") == F.col("mg")) & (F.expr(f"v div {width}") == F.col("mbkt")),
    ).select("g", "v", "prior_cw", "thresh", "n_rows")
    cv = in_bucket.groupBy("g", "v", "prior_cw", "thresh", "n_rows").agg(
        F.count(F.lit(1)).alias("c2")
    )
    wc2 = W.partitionBy("g").orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    wpick2 = W.partitionBy("g").orderBy("v")
    return (
        cv.withColumn("cw2", F.sum("c2").over(wc2))
        .filter(F.col("prior_cw") + F.col("cw2") >= F.col("thresh"))
        .withColumn("rn", F.row_number().over(wpick2))
        .filter(F.col("rn") == 1)
        .select(
            F.col("g").alias(group_col),
            F.col("v").alias("median"),
            "n_rows",
        )
    )
