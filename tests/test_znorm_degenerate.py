"""Degenerate-fixture parity for events_ts_znorm_search's denq guard
(r7 advisory #2): when the QUERY window is constant (denq = 0, Pearson r
undefined — num/0 is IEEE Inf/NaN in Spark but version-dependent in
DuckDB), BOTH engines must exclude every window via the exact integer
predicate and agree on the empty result, even though non-degenerate
candidate windows (corr_denx > 0) exist that only the denq guard removes.
"""

from __future__ import annotations

import datetime
import os
import tempfile

import duckdb
import pandas as pd

from sparkstreamingrealtimedatawithkafka_spark.plans.events import (
    _TSZN_ORACLE,
    events_ts_znorm_search,
)

SRC = "/root/testdata/sf0.001"


def _degenerate_events() -> pd.DataFrame:
    """Type 'aaa' (lexicographically first -> chosen as the query type):
    exactly one event per day for 14 days — the first-7-day query window
    is CONSTANT (denq = 0). Type 'bbb': varying daily counts, so windows
    with corr_denx > 0 exist and would score r = num/0 without the
    guard."""
    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for d in range(14):
        rows.append((eid, base + datetime.timedelta(days=d), 1, "aaa", 1.0, "{}"))
        eid += 1
        for _ in range((d % 3) + 1):  # 1..3 events/day -> variance > 0
            rows.append(
                (eid, base + datetime.timedelta(days=d, hours=2), 2, "bbb", 1.0, "{}")
            )
            eid += 1
    return pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )


def test_constant_query_window_yields_empty_on_both_engines(spark, tmp_path):
    sf_dir = str(tmp_path)
    for name in os.listdir(SRC):
        if name != "events.parquet":
            os.symlink(f"{SRC}/{name}", f"{sf_dir}/{name}")
    pdf = _degenerate_events()
    pdf.to_parquet(f"{sf_dir}/events.parquet", index=False)

    got = events_ts_znorm_search(spark, sf_dir)
    rows = got.collect()
    assert rows == [], f"engine emitted rows with denq=0: {rows[:3]}"
    # schema stays stable even when empty (driver hashes schema too)
    assert got.columns == ["event_type", "win_start", "corr_num", "corr_denx", "r"]

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    oracle = con.sql(_TSZN_ORACLE).fetchall()
    assert oracle == []

    # the guard is doing real work: without it, candidate windows survive
    # every OTHER filter (npts = W, corr_denx > 0, not-self)
    sans_denq = _TSZN_ORACLE.replace("AND corr_denx > 0 AND denq > 0", "AND corr_denx > 0")
    assert sans_denq != _TSZN_ORACLE
    assert len(con.sql(sans_denq).fetchall()) > 0
