"""The r12 bench protocol: same-run canary ratio (r11 verdict finding #2).

The decision metrics are the raw session total and the per-key deltas vs
the previous committed record at MATCHED CANARY — five round-1-untouched
plans interleaved at the 0/25/50/75/100% positions; each measured key is
compared against the previous record scaled by its two BRACKETING
canaries' this/prev ratios. These tests pin the construction on synthetic
records so a protocol refactor can't silently reintroduce the run-flat
host assumption the retired v1/v2/v4 scalars carried
(tools/bench_drift_r11.json: ±50% host swings on minute timescales).
"""

from __future__ import annotations

import pytest

from bench import (
    BENCH_QUERIES,
    BW_CANARY_KEYS,
    CANARY_KEYS,
    bracketing_canaries,
    bw_canary_ratio,
    canary_deltas,
    compact_record,
    interleaved_order,
    v3_reference,
)

KEYS = ["c0", "k1", "k2", "c1", "k3", "k4", "c2"]  # list order, not run order
CANARIES = ["c0", "c1", "c2"]


def test_interleaved_order_is_a_permutation_with_canaries_at_fractions():
    order = interleaved_order(list(BENCH_QUERIES), CANARY_KEYS)
    assert sorted(order) == sorted(BENCH_QUERIES)
    n = len(order)
    positions = [order.index(c) for c in CANARY_KEYS]
    assert positions[0] == 0 and positions[-1] == n - 1
    # strictly increasing, roughly evenly spaced (within one key of exact)
    assert positions == sorted(positions)
    for i, p in enumerate(positions):
        assert abs(p - i * (n - 1) / (len(CANARY_KEYS) - 1)) <= 1
    # non-canary keys keep their BENCH_QUERIES relative order
    rest = [k for k in BENCH_QUERIES if k not in CANARY_KEYS]
    assert [k for k in order if k not in CANARY_KEYS] == rest


def test_bracketing_covers_every_non_canary_key():
    brackets = bracketing_canaries(KEYS, CANARIES)
    assert set(brackets) == {"k1", "k2", "k3", "k4"}
    assert brackets["k1"] == ("c0", "c1")
    assert brackets["k4"] == ("c1", "c2")
    full = bracketing_canaries(list(BENCH_QUERIES), CANARY_KEYS)
    assert set(full) == set(BENCH_QUERIES) - set(CANARY_KEYS)


def test_uniformly_slower_host_cancels_to_zero_delta():
    """A 2x-slower host with unchanged plans must show ~0 deltas — the
    exact failure mode of raw round-over-round comparison (r10/r11)."""
    prev = {k: 1.0 for k in KEYS}
    times = {k: 2.0 for k in KEYS}
    ratios, overall, deltas = canary_deltas(times, prev, KEYS, CANARIES)
    assert overall == pytest.approx(2.0)
    assert ratios == {c: 2.0 for c in CANARIES}
    assert deltas == {k: 0.0 for k in ("k1", "k2", "k3", "k4")}


def test_piecewise_host_factor_uses_local_canaries():
    """Host 1x in the first segment, 3x in the second: k1 must be judged
    by its local (1x-ish) canaries, k4 by the 3x segment — NOT by the
    run-mean, which would flag k1 as improved and mask a real k4 change."""
    prev = {k: 1.0 for k in KEYS}
    times = {"c0": 1.0, "k1": 1.0, "k2": 1.0, "c1": 1.0, "k3": 3.0, "k4": 3.0, "c2": 3.0}
    _, _, deltas = canary_deltas(times, prev, KEYS, CANARIES)
    assert deltas["k1"] == pytest.approx(0.0)  # h = (1+1)/(1+1) = 1
    assert deltas["k4"] == pytest.approx(1.0)  # h = (1+3)/(1+1) = 2 -> 3 - 2
    # the same data under a run-flat factor (5/3) would misjudge both


def test_bracket_factor_is_magnitude_weighted_against_small_canary_jitter():
    """The bracket factor must be the SUM ratio, not the mean of
    per-canary ratios: ±0.1 s launch jitter on a 0.25 s canary is a ±40%
    per-canary ratio swing, and under a ratio-mean it would shift every
    neighboring key's delta by ±20% of its prev time. Under the sum ratio
    the same jitter moves h only by its share of the bracket's total."""
    prev = {"c0": 0.25, "k1": 5.0, "c1": 2.0, "k3": 1.0, "k4": 1.0, "c2": 2.0}
    keys = ["c0", "k1", "c1", "k3", "k4", "c2"]
    # c0 jitters 0.25 -> 0.35 (+0.1 s); everything else exactly matches prev
    times = dict(prev) | {"c0": 0.35}
    _, _, deltas = canary_deltas(times, prev, keys, CANARIES)
    # sum ratio h = (0.35+2.0)/(0.25+2.0) = 1.0444 -> |delta| bounded by
    # prev_k1 * 0.0444 ~ 0.22; the ratio-mean construction would give
    # h = (1.4+1.0)/2 = 1.2 -> delta -1.0, five times worse
    assert abs(deltas["k1"]) < 0.25
    # k4 sits in the (c1, c2) bracket, untouched by the c0 jitter
    assert deltas["k4"] == pytest.approx(0.0)


def test_real_regression_survives_host_cancellation():
    prev = {k: 1.0 for k in KEYS}
    times = {k: 2.0 for k in KEYS} | {"k3": 5.0}
    _, _, deltas = canary_deltas(times, prev, KEYS, CANARIES)
    assert deltas["k3"] == pytest.approx(3.0)
    assert deltas["k1"] == pytest.approx(0.0)


def test_canaries_never_appear_in_deltas_and_missing_prev_is_empty():
    prev = {k: 1.0 for k in KEYS}
    _, _, deltas = canary_deltas({k: 1.5 for k in KEYS}, prev, KEYS, CANARIES)
    assert not set(deltas) & set(CANARIES)
    # prev record lacking a canary (cross-sf/old format) -> no comparison
    ratios, overall, deltas = canary_deltas(
        {k: 1.0 for k in KEYS}, {"k1": 1.0}, KEYS, CANARIES
    )
    assert (ratios, overall, deltas) == ({}, None, {})


def test_bw_canary_is_a_bench_key_disjoint_from_cpu_canaries():
    """r12 verdict finding #4: the bw yardstick must be a real bench key
    (so every committed record carries it) and must NOT join CANARY_KEYS
    (the five CPU canaries stay untouched for cross-record
    comparability; the bw key keeps its ordinary bracket-scaled entry in
    delta_vs_prev)."""
    assert BW_CANARY_KEYS == ["dedup_minhash_lsh"]
    assert set(BW_CANARY_KEYS) <= set(BENCH_QUERIES)
    assert not set(BW_CANARY_KEYS) & set(CANARY_KEYS)
    # annotate, never rescale: the bw key is NOT excluded from deltas
    prev = {k: 1.0 for k in KEYS} | {"dedup_minhash_lsh": 4.0}
    keys = KEYS[:-1] + ["dedup_minhash_lsh", KEYS[-1]]
    times = {k: 1.0 for k in KEYS} | {"dedup_minhash_lsh": 8.0}
    _, _, deltas = canary_deltas(times, prev, keys, CANARIES)
    assert "dedup_minhash_lsh" in deltas


def test_bw_canary_ratio_construction():
    """Sum-ratio construction, None on either side missing (cross-sf or
    pre-r8 records) — same contract as the CPU canary ratio."""
    assert bw_canary_ratio(
        {"dedup_minhash_lsh": 6.0}, {"dedup_minhash_lsh": 3.0}
    ) == pytest.approx(2.0)
    assert bw_canary_ratio({"dedup_minhash_lsh": 6.0}, {}) is None
    assert bw_canary_ratio({}, {"dedup_minhash_lsh": 3.0}) is None
    # multi-key form stays magnitude-weighted (sum ratio, not ratio mean)
    assert bw_canary_ratio(
        {"a": 0.35, "b": 2.0}, {"a": 0.25, "b": 2.0}, keys=["a", "b"]
    ) == pytest.approx((0.35 + 2.0) / (0.25 + 2.0), abs=1e-3)


def test_bw_canary_ratio_survives_compact_record():
    record = {
        "metric": "headline_queries_total_runtime",
        "value": 10.0,
        "unit": "sec",
        "queries": {k: 1.0 for k in KEYS},
        "sf": 0.1,
        "canary_ratio": 1.0,
        "canary_ratio_bw": 1.8,
        "bw_canary_keys": BW_CANARY_KEYS,
        "delta_vs_prev": {},
    }
    back = compact_record(record)
    assert back["canary_ratio_bw"] == 1.8
    # r15: the constant key LIST is full-record-only — the compact line
    # spends its tail budget on the per-key queries map instead.
    assert "bw_canary_keys" not in back


def test_v3_reference_selection_and_cross_sf_guard():
    """r11 advice (medium + both lows): prev same-sf parallel probe wins,
    mean preferred over the single start sample; the pinned constant
    applies ONLY at sf0.1; cross-sf with no comparable record -> None
    (never a silently-bogus normalization)."""
    assert v3_reference({"probe_par_mean": 0.45, "probe_par_sec": 0.5}, 0.1, 0.489) == 0.45
    assert v3_reference({"probe_par_sec": 0.5}, 0.1, 0.489) == 0.5
    assert v3_reference({"probe_par_sec": 0.5}, 0.01, 0.489) == 0.5
    assert v3_reference(None, 0.1, 0.489) == 0.489
    assert v3_reference(None, 0.01, 0.489) is None
    assert v3_reference({}, 0.01, 0.489) is None


def test_retired_normalizations_absent_from_fresh_records():
    """v1/v2/v4 and the probe series are retired (r11 verdict finding #2):
    within one r11 run they spanned 61.1-131.2 s for the same 91.8 s raw
    measurement. A fresh compact record must carry none of them."""
    record = {
        "metric": "headline_queries_total_runtime",
        "value": 10.0,
        "unit": "sec",
        "queries": {k: 1.0 for k in KEYS},
        "sf": 0.1,
        "canary_ratio": 1.0,
        "canary_ratios": {c: 1.0 for c in CANARIES},
        "delta_vs_prev": {},
    }
    back = compact_record(record)
    for retired in ("normalized_total", "normalized_total_v2",
                    "normalized_total_v4", "probe_series", "probe_mean",
                    "probe_sec_end"):
        assert retired not in back
    assert back["canary_ratio"] == 1.0
    import bench as bench_mod
    import inspect

    src = inspect.getsource(bench_mod)
    for retired in ("normalized_total_v2", "normalized_total_v4", "_v4_total"):
        assert retired not in src, f"retired metric {retired} still emitted"
