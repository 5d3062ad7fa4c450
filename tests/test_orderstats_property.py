"""Property tests for operators/orderstats.py exact_median_2pass.

The two-pass histogram refinement must equal the direct definition —
the LOWER median (smallest v with cum_count(<= v) >= (n+1) div 2) — for
arbitrary integer data: negative values, ties, constant groups, single
elements, values straddling bucket boundaries, and any bucket width.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from sparkstreamingrealtimedatawithkafka_spark.operators.orderstats import (
    exact_median_2pass,
)


def _lower_median(vals: list[int]) -> int:
    s = sorted(vals)
    return s[(len(s) + 1) // 2 - 1]


groups = st.dictionaries(
    st.sampled_from(["a", "b", "c"]),
    st.lists(st.integers(min_value=-10_000, max_value=10_000), min_size=1, max_size=40),
    min_size=1,
    max_size=3,
)


@settings(max_examples=12, deadline=None)
@given(data=groups, width=st.sampled_from([1, 7, 1000, 100_000]))
def test_two_pass_equals_direct_lower_median(spark, data, width):
    rows = [(g, v) for g, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "g STRING, v LONG")
    got = {
        r.g: (r.median, r.n_rows)
        for r in exact_median_2pass(df, "g", "v", width=width).collect()
    }
    want = {g: (_lower_median(vs), len(vs)) for g, vs in data.items()}
    assert got == want


def test_two_pass_handles_bucket_boundary_ties(spark):
    # all mass on a bucket boundary, even count -> lower median
    rows = [("g", 1000)] * 4 + [("g", 2000)] * 4
    df = spark.createDataFrame(rows, "g STRING, v LONG")
    r = exact_median_2pass(df, "g", "v", width=1000).collect()[0]
    assert (r.median, r.n_rows) == (1000, 8)
