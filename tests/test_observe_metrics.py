"""Observation metrics reconcile exactly with the result they audited.

The observe() side channel sees exactly the rows the result aggregate
consumed — the two must agree to the cent, in the SAME job (one action).
"""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from sparkstreamingrealtimedatawithkafka_spark.plans._util import cents, t

SF_DIR = "/root/testdata/sf0.001"


def test_observation_reconciles_with_result(spark):
    li = t(spark, SF_DIR, "lineitem")
    obs = Observation("audit")
    observed = li.filter(F.col("l_shipdate") <= "1998-09-02").observe(
        obs,
        F.count(F.lit(1)).alias("n_in"),
        F.sum(cents("l_extendedprice")).alias("mass_cents"),
    )
    rows = observed.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(cents("l_extendedprice")).alias("rev_cents"),
    ).collect()
    got = obs.get
    assert got["n_in"] == sum(r.n_rows for r in rows)
    assert got["mass_cents"] == sum(r.rev_cents for r in rows)
