"""Third decade (r8): 100x -> 1000x on the three cheapest headline shapes.

Completes the scale ladder 600k -> 600M lineitem rows (with orders to
150M and events to 100M) — three decades of measured scaling on one
machine, ending at roughly 1/1000th of the 100 TB design target's row
volume. Shapes: q1 aggregation, q3 join+agg (a 600M x 150M sort-merge
join under AQE), and the as-of join (union + running-last over 100M
events). Heavier text/dedup shapes stop at the 100x sweep
(tools/scale100_r8.py) — their oracles and corpora, not the engine,
set the cost there.

Reuses tools/scale_check.py's materializers at FACTOR=1000 (~25 GB of
parquet under $TMPDIR, written once). min-of-2, deterministic unpersist
+ GC. Output: tools/scale1000_r8.json. Run on an idle host (~30 min
first time).
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import tools.scale_check as sc  # noqa: E402
from sparkstreamingrealtimedatawithkafka_spark.session import build_session  # noqa: E402
from sparkstreamingrealtimedatawithkafka_spark.sources.registry import (  # noqa: E402
    load_table,
)

SCALE100_DIR = os.path.join(os.environ.get("TMPDIR", "/tmp"), "ssk_scale100_r8")
SCALE1000_DIR = os.path.join(os.environ.get("TMPDIR", "/tmp"), "ssk_scale1000_r8")


def timed(mk, runs: int = 2) -> float:
    best = None
    for _ in range(runs):
        e = sc.run_noop(mk)
        best = e if best is None else min(best, e)
    return round(best, 3)


if __name__ == "__main__":
    spark = build_session(app_name="ssk-scale1000")
    sc._SPARK = spark

    # 100x tables (the prior sweep's; materialized once)
    dir10 = sc.SCALE_DIR
    sc.FACTOR, sc.SCALE_DIR = 100, SCALE100_DIR
    sc.materialize(spark)
    sc.materialize_events(spark)
    # 1000x tables
    sc.FACTOR, sc.SCALE_DIR = 1000, SCALE1000_DIR
    sc.materialize(spark)
    sc.materialize_events(spark)
    sc.FACTOR, sc.SCALE_DIR = 10, dir10

    li100 = spark.read.parquet(os.path.join(SCALE100_DIR, "lineitem"))
    o100 = spark.read.parquet(os.path.join(SCALE100_DIR, "orders"))
    ev100 = spark.read.parquet(os.path.join(SCALE100_DIR, "events"))
    li1000 = spark.read.parquet(os.path.join(SCALE1000_DIR, "lineitem"))
    o1000 = spark.read.parquet(os.path.join(SCALE1000_DIR, "orders"))
    ev1000 = spark.read.parquet(os.path.join(SCALE1000_DIR, "events"))

    li1 = load_table(spark, sc.SF_DIR, "lineitem")

    shapes = {
        "q1_agg": (
            lambda: sc.q1_shape(li100),
            lambda: sc.q1_shape(li1000),
        ),
        "q3_join_agg": (
            lambda: sc.q3_shape(li100, o100),
            lambda: sc.q3_shape(li1000, o1000),
        ),
        "asof_join": (
            lambda: sc.asof_shape(ev100),
            lambda: sc.asof_shape(ev1000),
        ),
    }
    out = {
        "protocol": (
            "third decade: 100x -> 1000x (lineitem 60M -> 600M rows, "
            "orders 15M -> 150M, events 10M -> 100M), min-of-2 per "
            "scale, deterministic unpersist + GC; decade3_ratio = "
            "t(1000x)/t(100x)"
        ),
        "rows": {},
    }
    sc.run_noop(lambda: sc.q1_shape(li1))  # warm codegen at the cheap scale
    for name, (m100, m1000) in shapes.items():
        t100 = timed(m100)
        t1000 = timed(m1000)
        out["rows"][name] = {
            "t_100x_sec": t100,
            "t_1000x_sec": t1000,
            "decade3_ratio": round(t1000 / t100, 2),
        }
        print(name, out["rows"][name], flush=True)
    Path("tools/scale1000_r8.json").write_text(json.dumps(out, indent=1))
    print("wrote tools/scale1000_r8.json")
    spark.stop()
