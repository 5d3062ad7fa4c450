"""Property test for the gap-fill/resample operator shape
(events_gapfill_resample): on randomized sparse event sets, the output
must (a) contain the COMPLETE hourly grid per series — no missing, no
extra buckets, (b) agree with an independent pandas groupby+reindex+ffill
replay on every value. Hypothesis drives the bucket sparsity patterns the
fixture can't (single-bucket series, long leading gaps, all-gap interiors).
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

US_H = 3_600_000_000


def _gapfill(spark, rows):
    """The same plan as events_gapfill_resample, over constructed rows of
    (series, bucket_index, count_weight)."""
    df = spark.createDataFrame(rows, "s string, b long, n long")
    agg = df.groupBy("s", (F.col("b") * US_H).alias("bucket_us")).agg(
        F.sum("n").alias("sn")
    )
    bounds = agg.groupBy("s").agg(
        F.min("bucket_us").alias("lo"), F.max("bucket_us").alias("hi")
    )
    grid = bounds.select(
        "s", F.explode(F.sequence("lo", "hi", F.lit(US_H))).alias("bucket_us")
    )
    w = W.partitionBy("s").orderBy("bucket_us").rowsBetween(W.unboundedPreceding, 0)
    return (
        grid.join(agg, ["s", "bucket_us"], "left")
        .select(
            "s",
            "bucket_us",
            F.last("sn", ignorenulls=True).over(w).alias("filled"),
        )
        .toPandas()
    )


@st.composite
def sparse_series(draw):
    n_series = draw(st.integers(1, 3))
    rows = []
    for i in range(n_series):
        buckets = draw(
            st.lists(st.integers(0, 40), min_size=1, max_size=8, unique=True)
        )
        for b in buckets:
            rows.append((f"s{i}", b, draw(st.integers(1, 5))))
    return rows


@settings(max_examples=12, deadline=None)
@given(sparse_series())
def test_gapfill_matches_pandas_replay(spark, rows):
    got = _gapfill(spark, rows).sort_values(["s", "bucket_us"]).reset_index(drop=True)

    pdf = pd.DataFrame(rows, columns=["s", "b", "n"])
    expected = []
    for s, g in pdf.groupby("s"):
        per_bucket = g.groupby("b")["n"].sum()
        full = range(per_bucket.index.min(), per_bucket.index.max() + 1)
        filled = per_bucket.reindex(full).ffill()
        for b, v in filled.items():
            expected.append((s, b * US_H, int(v)))
    exp = (
        pd.DataFrame(expected, columns=["s", "bucket_us", "filled"])
        .sort_values(["s", "bucket_us"])
        .reset_index(drop=True)
    )

    assert len(got) == len(exp), "grid must be exactly min..max per series"
    assert (got["s"] == exp["s"]).all()
    assert (got["bucket_us"] == exp["bucket_us"]).all()
    assert (got["filled"].astype(int) == exp["filled"]).all()
