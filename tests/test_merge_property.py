"""Property tests for the MERGE family (merge_upsert_scd1 /
merge_scd2_history, plans/relational.py) — the same Hypothesis-vs-pandas
pattern as test_asof_property.py / test_gapfill_property.py: the plan
SHAPE is re-expressed over constructed inputs and replayed row-for-row in
pandas, so the randomized cases the fixture can't produce (empty deltas,
all-insert, all-update, several changes on the same key and day) are
pinned.

SCD-2 additionally asserts the interval invariants that define a valid
versioned dimension: per key, exactly one open version (is_current,
valid_to NULL), intervals contiguous (valid_to == next valid_from) and
strictly increasing — i.e. no overlaps and no holes.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

BASE_DAY = 0  # stand-in for the 1990-01-01 epoch version


def _scd1(spark, base, delta):
    """merge_upsert_scd1's FULL OUTER shape (plans/relational.py:2185) over
    constructed (k, bal) base and (k, d) delta rows."""
    b = spark.createDataFrame(base or [(None, None)], "k long, bal long").filter(
        F.col("k").isNotNull()
    )
    d = spark.createDataFrame(delta or [(None, None)], "dk long, d long").filter(
        F.col("dk").isNotNull()
    )
    d = d.groupBy("dk").agg(F.sum("d").alias("d"))
    m = b.join(d, b.k == d.dk, "full_outer")
    return m.select(
        F.coalesce("k", "dk").alias("key"),
        (F.coalesce("bal", F.lit(0)) + F.coalesce("d", F.lit(0))).alias("balance"),
        F.when(F.col("k").isNull(), "insert")
        .when(F.col("dk").isNull(), "keep")
        .otherwise("update")
        .alias("op"),
    ).toPandas()


def _scd2(spark, base, changes):
    """merge_scd2_history's versions+intervals shape
    (plans/relational.py:2251) over constructed (k, bal) base and
    (k, day, d) change rows; days are small ints standing in for dates."""
    b = spark.createDataFrame(base, "k long, bal long")
    c = spark.createDataFrame(changes or [(None, None, None)], "ck long, day long, d long").filter(
        F.col("ck").isNotNull()
    )
    chg = c.groupBy("ck", "day").agg(F.sum("d").alias("d"))
    cum = W.partitionBy("ck").orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    base_v = b.select("k", F.lit(BASE_DAY).alias("valid_from"), F.col("bal").alias("bal"))
    changed = chg.join(b, chg.ck == b.k).select(
        "k",
        F.col("day").alias("valid_from"),
        (F.col("bal") + F.sum("d").over(cum)).alias("bal"),
    )
    nxt = W.partitionBy("k").orderBy("valid_from")
    return (
        base_v.unionByName(changed)
        .select(
            "k",
            "valid_from",
            "bal",
            F.lead("valid_from").over(nxt).alias("valid_to"),
            F.lead("valid_from").over(nxt).isNull().alias("is_current"),
        )
        .toPandas()
    )


@st.composite
def merge_case(draw):
    base_keys = draw(st.lists(st.integers(0, 9), max_size=6, unique=True))
    base = [(k, draw(st.integers(-100, 100))) for k in base_keys]
    delta = draw(
        st.lists(
            st.tuples(st.integers(0, 14), st.integers(-50, 50)),
            max_size=10,
        )
    )
    return base, delta


@settings(max_examples=25, deadline=None)
@given(merge_case())
def test_scd1_matches_pandas_replay(spark, case):
    base, delta = case
    got = _scd1(spark, base, delta).sort_values("key").reset_index(drop=True)

    bmap = dict(base)
    dmap: dict[int, int] = {}
    for k, d in delta:
        dmap[k] = dmap.get(k, 0) + d
    keys = sorted(set(bmap) | set(dmap))
    exp = pd.DataFrame(
        [
            (
                k,
                bmap.get(k, 0) + dmap.get(k, 0),
                "insert" if k not in bmap else ("keep" if k not in dmap else "update"),
            )
            for k in keys
        ],
        columns=["key", "balance", "op"],
    )
    assert len(got) == len(exp), "one output row per key in base ∪ delta"
    assert got["key"].tolist() == exp["key"].tolist()
    assert got["balance"].tolist() == exp["balance"].tolist()
    assert got["op"].tolist() == exp["op"].tolist()


@st.composite
def scd2_case(draw):
    base_keys = draw(st.lists(st.integers(0, 5), min_size=1, max_size=4, unique=True))
    base = [(k, draw(st.integers(-100, 100))) for k in base_keys]
    changes = draw(
        st.lists(
            st.tuples(
                st.integers(0, 7),  # key — may or may not exist in base
                st.integers(1, 6),  # day (after BASE_DAY)
                st.integers(-50, 50),
            ),
            max_size=12,
        )
    )
    return base, changes


@settings(max_examples=25, deadline=None)
@given(scd2_case())
def test_scd2_matches_pandas_replay_and_interval_invariants(spark, case):
    base, changes = case
    got = _scd2(spark, base, changes).sort_values(["k", "valid_from"]).reset_index(drop=True)

    # pandas replay
    bmap = dict(base)
    per_key_day: dict[tuple[int, int], int] = {}
    for k, day, d in changes:
        if k in bmap:
            per_key_day[(k, day)] = per_key_day.get((k, day), 0) + d
    exp_rows = []
    for k in sorted(bmap):
        days = sorted(day for (kk, day) in per_key_day if kk == k)
        exp_rows.append((k, BASE_DAY, bmap[k]))
        run = bmap[k]
        for day in days:
            run += per_key_day[(k, day)]
            exp_rows.append((k, day, run))
    exp = pd.DataFrame(exp_rows, columns=["k", "valid_from", "bal"])

    assert got[["k", "valid_from", "bal"]].values.tolist() == exp.values.tolist()

    # interval invariants per key
    for k, g in got.groupby("k"):
        g = g.sort_values("valid_from")
        assert int(g["is_current"].sum()) == 1, "exactly one open version per key"
        assert bool(g.iloc[-1]["is_current"]), "the open version is the latest"
        assert pd.isna(g.iloc[-1]["valid_to"])
        # contiguity: each version closes exactly where the next opens
        assert g["valid_to"].iloc[:-1].tolist() == g["valid_from"].iloc[1:].tolist()
        assert g["valid_from"].is_monotonic_increasing
        assert g["valid_from"].iloc[0] == BASE_DAY
    # change keys absent from base must create no history
    assert set(got["k"]) == set(bmap)
