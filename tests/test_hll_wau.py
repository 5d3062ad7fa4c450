"""The HLL rolling-WAU escape hatch must track the exact entry: per-day
estimates within 5% (HLL lgConfigK=12 gives ~1.6% typical error), same
day domain, same row count."""

from __future__ import annotations

from sparkstreamingrealtimedatawithkafka_spark.plans import REGISTRY

from conftest import SF_DIR


def test_hll_wau_within_tolerance_of_exact(spark):
    exact = {
        r["day"]: r["wau"]
        for r in REGISTRY["events_rolling_wau"].fn(spark, SF_DIR).collect()
    }
    approx = {
        r["day"]: r["wau_approx"]
        for r in REGISTRY["events_rolling_wau_hll"].fn(spark, SF_DIR).collect()
    }
    assert set(exact) == set(approx), "day domains differ"
    for day, wau in exact.items():
        err = abs(approx[day] - wau) / max(wau, 1)
        assert err <= 0.05, f"day {day}: approx {approx[day]} vs exact {wau}"
