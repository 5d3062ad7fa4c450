"""Invariant tests for the round-5 training-pipeline operators (the oracle
gate proves engine parity; these pin the SEMANTICS both engines share)."""

from __future__ import annotations

import pandas as pd

from sparkstreamingrealtimedatawithkafka_spark.plans import REGISTRY

from conftest import SF_DIR


def test_pack_sequences_conserves_tokens_and_fills_blocks(spark):
    """Every block except the last holds exactly 512 tokens; block ids are
    contiguous from 0; total occupancy equals the corpus token count."""
    from pyspark.sql import functions as F

    from sparkstreamingrealtimedatawithkafka_spark.functions import text as TX
    from sparkstreamingrealtimedatawithkafka_spark.plans._util import t

    out = (
        REGISTRY["pack_training_sequences"].fn(spark, SF_DIR)
        .orderBy("seq_id")
        .toPandas()
    )
    assert list(out["seq_id"]) == list(range(len(out)))
    assert (out["n_tokens"].iloc[:-1] == 512).all()
    assert 0 < out["n_tokens"].iloc[-1] <= 512
    total = (
        t(spark, SF_DIR, "documents")
        .select(F.sum(F.size(TX.tokenize("text"))).alias("s"))
        .collect()[0]["s"]
    )
    assert int(out["n_tokens"].sum()) == int(total)
    assert (out["n_docs"] >= 1).all()


def test_cdc_diff_matches_pandas_replay(spark):
    """insert/update/delete classification replayed row-for-row in pandas."""
    from sparkstreamingrealtimedatawithkafka_spark.plans._util import t
    from sparkstreamingrealtimedatawithkafka_spark.plans.events import (
        _CDC_T1_US,
        _CDC_T2_US,
        _CDC_WINDOW_US,
    )

    ev = (
        t(spark, SF_DIR, "events")
        .select("user_id", "event_id", "ts_us", "value")
        .toPandas()
    )
    ev["c"] = (ev["value"] * 100).round(0).astype("int64")

    def snap(hi):
        w = ev[(ev["ts_us"] > hi - _CDC_WINDOW_US) & (ev["ts_us"] <= hi)]
        w = w.sort_values(["ts_us", "event_id"]).groupby("user_id").tail(1)
        return dict(zip(w["user_id"], w["c"]))

    s1, s2 = snap(_CDC_T1_US), snap(_CDC_T2_US)
    expect = {}
    for u in set(s1) | set(s2):
        if u not in s1:
            expect[u] = ("insert", None, s2[u])
        elif u not in s2:
            expect[u] = ("delete", s1[u], None)
        elif s1[u] != s2[u]:
            expect[u] = ("update", s1[u], s2[u])

    out = REGISTRY["events_cdc_snapshot_diff"].fn(spark, SF_DIR).toPandas()
    got = {
        r.user_id: (
            r.op,
            None if pd.isna(r.old_cents) else int(r.old_cents),
            None if pd.isna(r.new_cents) else int(r.new_cents),
        )
        for r in out.itertuples()
    }
    assert got == expect


def test_zscore_flags_match_pandas_rolling(spark):
    """Flagged (user, event) set equals a pandas rolling-window replay of
    the trailing-10 z-score rule, and partial windows are never flagged."""
    from sparkstreamingrealtimedatawithkafka_spark.plans._util import t

    ev = (
        t(spark, SF_DIR, "events")
        .select("user_id", "event_id", "ts_us", "value")
        .toPandas()
        .sort_values(["user_id", "ts_us", "event_id"])
    )
    ev["c"] = (ev["value"] * 100).round(0).astype("int64")
    flagged = set()
    k = 10
    for _, g in ev.groupby("user_id"):
        cs = g["c"].to_numpy()
        ids = g["event_id"].to_numpy()
        for i in range(k, len(cs)):
            win = cs[i - k : i]
            s1, s2 = int(win.sum()), int((win.astype(object) ** 2).sum())
            dev = int(cs[i]) * k - s1
            var_num = s2 * k - s1 * s1
            if dev * dev * (k - 1) > 4 * k * var_num:
                flagged.add((g["user_id"].iloc[0], int(ids[i])))
    out = REGISTRY["events_anomaly_zscore"].fn(spark, SF_DIR).toPandas()
    got = set(zip(out["user_id"], out["event_id"]))
    assert got == flagged


def test_incremental_dedup_touches_only_delta(spark):
    """Every emitted pair involves at least one delta doc (doc_id % 10 == 0)
    and is ordered id_a < id_b."""
    out = REGISTRY["dedup_incremental_batch"].fn(spark, SF_DIR).toPandas()
    assert ((out["id_a"] % 10 == 0) | (out["id_b"] % 10 == 0)).all()
    assert (out["id_a"] < out["id_b"]).all()
    assert (out["jaccard"] >= 0.4).all()


def test_quantile_deciles_are_monotone_and_balanced(spark):
    """Deciles are monotone in cents (bucket-granular) and each decile holds
    roughly a tenth of the rows (histogram-width slack)."""
    out = REGISTRY["quantile_bucket_assignment"].fn(spark, SF_DIR).toPandas()
    n = len(out)
    by_decile = out.groupby("decile")["cents"]
    lo, hi = by_decile.min(), by_decile.max()
    # monotone: decile d's max <= decile d+1's min across bucket boundaries
    for d in range(1, int(out["decile"].max())):
        if d in hi.index and d + 1 in lo.index:
            assert hi[d] <= lo[d + 1]
    counts = out["decile"].value_counts()
    # bucket granularity means deciles are approximate; still no decile may
    # be empty-ish or grossly oversized at this distribution
    assert counts.max() <= 0.35 * n
    assert int(out["decile"].min()) == 1


def test_session_paths_are_three_step_prefixes(spark):
    """Paths are '>'-joined prefixes of at most 3 known event types."""
    out = REGISTRY["events_session_paths"].fn(spark, SF_DIR).toPandas()
    types = {"view", "click", "purchase", "signup", "error"}
    assert len(out) <= 10
    for p in out["path"]:
        steps = p.split(">")
        assert 1 <= len(steps) <= 3
        assert set(steps) <= types
    assert (out["cnt"] > 0).all()
