"""Property-based check (hypothesis) of the as-of join against a brute
force per-row reference: for random event sets, every left row must get
the right row with the max right_ts <= left_ts for its key (largest
tiebreak id among equals), or nulls when none exists."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from sparkstreamingrealtimedatawithkafka_spark.operators.asof import asof_join

KEYS = st.integers(min_value=0, max_value=3)
TS = st.integers(min_value=0, max_value=20)


@st.composite
def tables(draw):
    left = draw(
        st.lists(st.tuples(KEYS, TS), min_size=0, max_size=12, unique=True)
    )
    right = draw(
        st.lists(st.tuples(KEYS, TS, st.integers(0, 99)), min_size=0, max_size=12)
    )
    # unique (key, ts, id) on the right so the tiebreak is well-defined
    right = list({(k, ts, i) for k, ts, i in right})
    return left, right


def brute_force(left, right):
    out = {}
    for lk, lts in left:
        best = None
        for rk, rts, rid in right:
            if rk == lk and rts <= lts:
                cand = (rts, rid)
                if best is None or cand > best:
                    best = cand
        out[(lk, lts)] = best
    return out


@settings(max_examples=15, deadline=None)
@given(tables())
def test_asof_matches_brute_force(spark, tables_):
    left, right = tables_
    ldf = spark.createDataFrame(
        [(k, ts) for k, ts in left] or [(None, None)], "k long, ts long"
    ).filter("k is not null")
    rdf = spark.createDataFrame(
        [(k, ts, i) for k, ts, i in right] or [(None, None, None)],
        "k long, rts long, rid long",
    ).filter("k is not null")

    got = {
        (r["k"], r["ts"]): (r["rts_r"], r["rid_r"])
        for r in asof_join(
            ldf, rdf, on=["k"], left_ts="ts", right_ts="rts",
            payload_cols=["rid"], tiebreak="rid",
        ).collect()
    }
    expected = {
        key: (best if best is not None else (None, None))
        for key, best in brute_force(left, right).items()
    }
    got = {key: (v if v != (None, None) else (None, None)) for key, v in got.items()}
    assert got == expected

def brute_force_forward(left, right, tolerance=None):
    out = {}
    for lk, lts in left:
        best = None
        for rk, rts, rid in right:
            if rk == lk and rts >= lts:
                # nearest following ts; smallest tiebreak id among equals
                cand = (rts, rid)
                if best is None or cand < best:
                    best = cand
        if best is not None and tolerance is not None and best[0] - lts > tolerance:
            best = None
        out[(lk, lts)] = best
    return out


@settings(max_examples=15, deadline=None)
@given(tables())
def test_asof_forward_matches_brute_force(spark, tables_):
    left, right = tables_
    ldf = spark.createDataFrame(
        [(k, ts) for k, ts in left] or [(None, None)], "k long, ts long"
    ).filter("k is not null")
    rdf = spark.createDataFrame(
        [(k, ts, i) for k, ts, i in right] or [(None, None, None)],
        "k long, rts long, rid long",
    ).filter("k is not null")

    got = {
        (r["k"], r["ts"]): (r["rts_r"], r["rid_r"])
        for r in asof_join(
            ldf, rdf, on=["k"], left_ts="ts", right_ts="rts",
            payload_cols=["rid"], tiebreak="rid", direction="forward",
        ).collect()
    }
    expected = {
        key: (best if best is not None else (None, None))
        for key, best in brute_force_forward(left, right).items()
    }
    assert got == expected


@settings(max_examples=10, deadline=None)
@given(tables())
def test_asof_forward_tolerance_nulls_far_matches(spark, tables_):
    left, right = tables_
    tol = 5
    ldf = spark.createDataFrame(
        [(k, ts) for k, ts in left] or [(None, None)], "k long, ts long"
    ).filter("k is not null")
    rdf = spark.createDataFrame(
        [(k, ts, i) for k, ts, i in right] or [(None, None, None)],
        "k long, rts long, rid long",
    ).filter("k is not null")

    got = {
        (r["k"], r["ts"]): (r["rts_r"], r["rid_r"])
        for r in asof_join(
            ldf, rdf, on=["k"], left_ts="ts", right_ts="rts",
            payload_cols=["rid"], tiebreak="rid",
            direction="forward", tolerance=tol,
        ).collect()
    }
    expected = {
        key: (best if best is not None else (None, None))
        for key, best in brute_force_forward(left, right, tolerance=tol).items()
    }
    # left-outer contract: every left row present even when the only match
    # was beyond tolerance
    assert set(got) == set(expected)
    assert got == expected


def brute_force_nearest(left, right):
    out = {}
    for lk, lts in left:
        bwd = None
        fwd = None
        for rk, rts, rid in right:
            if rk != lk:
                continue
            if rts <= lts:
                cand = (rts, rid)
                if bwd is None or cand > bwd:
                    bwd = cand
            if rts >= lts:
                cand = (rts, rid)
                if fwd is None or cand < fwd:
                    fwd = cand
        if bwd is None:
            best = fwd
        elif fwd is None:
            best = bwd
        else:
            # closer wins; equal distance goes backward
            best = bwd if (lts - bwd[0]) <= (fwd[0] - lts) else fwd
        out[(lk, lts)] = best
    return out


@settings(max_examples=15, deadline=None)
@given(tables())
def test_asof_nearest_matches_brute_force(spark, tables_):
    left, right = tables_
    ldf = spark.createDataFrame(
        [(k, ts) for k, ts in left] or [(None, None)], "k long, ts long"
    ).filter("k is not null")
    rdf = spark.createDataFrame(
        [(k, ts, i) for k, ts, i in right] or [(None, None, None)],
        "k long, rts long, rid long",
    ).filter("k is not null")

    got = {
        (r["k"], r["ts"]): (r["rts_r"], r["rid_r"])
        for r in asof_join(
            ldf, rdf, on=["k"], left_ts="ts", right_ts="rts",
            payload_cols=["rid"], tiebreak="rid", direction="nearest",
        ).collect()
    }
    expected = {
        key: (best if best is not None else (None, None))
        for key, best in brute_force_nearest(left, right).items()
    }
    assert got == expected
