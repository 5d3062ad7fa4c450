"""Hypothesis property for the similarity router's regime boundaries
(r9 verdict ask #5).

The recall evidence (tools/router_depth_r8.json) and the fixed-corpus
branch-parity test (test_ppjoin_skyline.py) SAMPLE the router's contract;
this file pins it as a property: for arbitrary corpora, set the candidate
budget EXACTLY at the engine's own integer estimate and one below it, and
the skew gate exactly at the measured head-key mass and one below it —
the four runs straddle both gates, and on EVERY side of EVERY flip the
engine's full result set (pairs + route + consulted stats) must equal the
parameterized DuckDB oracle's. Because both sides compare the same
integers, a single off-by-one in either gate, or any divergence in the
pair sets of the routed-to paths, falsifies the property.

Route semantics under the flip (asserted, not assumed):
  * budget >= est  -> ppjoin (complete prefix filter);
  * budget  < est  -> gate 2 consulted: skew_ppm <= gate -> snm,
    skew_ppm > gate -> snm_multipass (pass-1 union pass-2, so the
    multipass pair set is a superset of single-pass snm's).
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st

from sparkstreamingrealtimedatawithkafka_spark.plans.text_llm import (
    _sim_auto_oracle,
    similarity_auto_pairs,
)

# Small shared word pool => real shingle collisions across docs, so the
# prefix join's candidate estimate moves with the draw instead of being
# degenerate-zero or quadratic-everything.
_POOL = [f"w{i}" for i in range(18)]


@st.composite
def _corpus(draw):
    n = draw(st.integers(6, 16), label="n_docs")
    docs = []
    for i in range(n):
        k = draw(st.integers(3, 7), label=f"len_{i}")
        words = [
            _POOL[draw(st.integers(0, len(_POOL) - 1), label=f"tok_{i}_{j}")]
            for j in range(k)
        ]
        docs.append(" ".join(words))
    # Guarantee at least one Jaccard >= 3/5 pair so every routed result is
    # non-empty (the property would be vacuous on an all-distinct draw,
    # and the engine's cand_est/skew_ppm ride the output rows).
    dup_of = draw(st.integers(0, n - 1), label="dup_of")
    docs.append(docs[dup_of])
    # Optionally push the corpus toward the boilerplate-prefix regime so
    # gate 2's measured mass is sometimes 0 and sometimes large: a shared
    # 4-token leading key on a window-overflowing block of docs.
    if draw(st.booleans(), label="boilerplate"):
        tail_pool = [f"t{i}" for i in range(40)]
        for i in range(draw(st.integers(9, 14), label="boiler_n")):
            a = tail_pool[(3 * i) % len(tail_pool)]
            b = tail_pool[(3 * i + 1) % len(tail_pool)]
            docs.append(f"same lead key here {a} {b} x{i} y{i}")
    return [(i, d) for i, d in enumerate(docs)]


def _engine(spark, rows, budget, skew):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = similarity_auto_pairs(df, budget=budget, skew_budget_ppm=skew)
    return sorted(tuple(r) for r in out.collect())


def _oracle(rows, budget, skew):
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = sorted(tuple(r) for r in con.sql(_sim_auto_oracle(budget, skew)).fetchall())
    con.close()
    return got


@settings(max_examples=6, deadline=None)
@given(data=st.data())
def test_route_flip_pair_set_equality(spark, data):
    rows = data.draw(_corpus(), label="corpus")

    # Probe run: a budget no corpus here can exceed -> ppjoin; the output
    # rows carry the engine's exact integer candidate estimate.
    probe = _engine(spark, rows, 10**15, 1_000_000)
    assert probe, "corpus construction must force at least one pair"
    est = probe[0][5]
    assert {t[4] for t in probe} == {"ppjoin"}

    # ---- Gate 1 straddle: budget exactly AT the estimate (<= -> ppjoin)
    # and exactly one BELOW it (-> the linear regimes).
    at = _engine(spark, rows, est, 1_000_000)
    assert at == _oracle(rows, est, 1_000_000)
    assert {t[4] for t in at} == {"ppjoin"}
    assert {(t[0], t[1], t[2], t[3]) for t in at} == {
        (t[0], t[1], t[2], t[3]) for t in probe
    }

    below = _engine(spark, rows, est - 1, 1_000_000)
    assert below == _oracle(rows, est - 1, 1_000_000)
    assert {t[4] for t in below} == {"snm"}, "flip must land in snm here"
    skew = below[0][6]
    assert skew >= 0  # gate 2 was consulted on the over-budget side

    # ---- Gate 2 straddle at the measured head-key mass: AT the measured
    # ppm (<= -> single-pass snm) and one BELOW it (-> multipass).
    at2 = _engine(spark, rows, est - 1, skew)
    assert at2 == _oracle(rows, est - 1, skew)
    assert {t[4] for t in at2} == {"snm"}
    assert at2 == below  # same route, same gates -> identical rows

    multi = _engine(spark, rows, est - 1, skew - 1)
    assert multi == _oracle(rows, est - 1, skew - 1)
    assert {t[4] for t in multi} == {"snm_multipass"}

    # Multipass = pass-1 UNION pass-2: its pair set can only grow.
    snm_pairs = {(t[0], t[1], t[2], t[3]) for t in below}
    multi_pairs = {(t[0], t[1], t[2], t[3]) for t in multi}
    assert snm_pairs <= multi_pairs
