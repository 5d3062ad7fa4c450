"""Holt linear-trend smoothing: full python replay of the registered
entry on the fixture corpus — the fold is order-sensitive recursive
float math, so the replay pins both the (ts_us, event_id) ordering and
the exact operand order of the recurrence."""

from __future__ import annotations

import duckdb

from sparkstreamingrealtimedatawithkafka_spark.plans import REGISTRY

from conftest import SF_DIR


def test_holt_matches_python_replay(spark):
    got = {
        r.user_id: (r.n_events, r.level_c, r.trend_c, r.forecast_c)
        for r in REGISTRY["events_holt_linear_forecast"].fn(spark, SF_DIR).collect()
    }
    rows = duckdb.sql(
        f"""SELECT user_id, epoch_ns(ts)//1000 AS us, event_id,
                   CAST(CAST(ROUND(value*100,0) AS BIGINT) AS DOUBLE) AS c
            FROM read_parquet('{SF_DIR}/events.parquet')
            ORDER BY user_id, us, event_id"""
    ).fetchall()
    series: dict[int, list[float]] = {}
    for uid, _, _, c in rows:
        series.setdefault(uid, []).append(c)
    want = {}
    for uid, vs in series.items():
        l, b = vs[0], 0.0
        for v in vs[1:]:
            lp = v / 2 + (l + b) / 2
            bp = (lp - l) / 2 + b / 2
            l, b = lp, bp
        want[uid] = (len(vs), l, b, l + b)
    assert got == want  # bit-exact, including the doubles
    assert want
