"""Third decade for the BINNED INTERVAL-OVERLAP JOIN shape (r11, verdict
ask #5 — the last structurally distinct shuffle shape without a decade-3
row).

``events_interval_overlap`` (plans/events.py) is the engine's temporal-
algebra representative: a raw interval-overlap predicate is a theta join
(nested-loop at any scale), so both interval sets carry a coarse time-bin
equi key (the day) and the overlap condition rides as a residual on a
hash join. Neither decade-3 family measured so far exercises that
bin-equi-join-with-residual exchange (rolling_wau is a pure keyed window,
tfidf a keyed aggregate, pagerank an iterated equi-join).

Protocol: the UNMODIFIED catalog entry end-to-end (noop sink, min-of-2
after a codegen warm-up, deterministic unpersist + GC) against synthetic
sf-dirs whose events.parquet is a FULL-RAW-SCHEMA 100x (10M rows) /
1000x (100M) replication of sf0.1 events — event_id and user_id
perturbed per replica so KEY CARDINALITY scales with the data, ts
jittered +i seconds so per-user series grow realistically, props carried
verbatim (the schema contract loads it) — with every other table
symlinked from sf0.1. Driver heap 96g + 128 shuffle partitions at both
scales (DEPLOY.md sizing). decade3_ratio = t(1000x)/t(100x); <= 10 is
at-most-linear. Run on an idle host. Output:
tools/scale1000_interval_r11.json.

Why linear is expected: both join inputs are PARTIAL AGGREGATES of the
events scan (activity = user x day spans, incidents = day x hour error
windows with >= 2 errors) — the same single-exchange keyed-aggregate
shape rolling_wau pinned at 3.44x (tools/scale1000_r9b.json) — and the
incident side is bounded by 24 rows per day regardless of corpus size,
so the join build side is a dimension table by construction.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ["SPARK_GRAFT_DRIVER_MEM"] = "96g"

import tools.scale_check as sc  # noqa: E402
from tools.scale1000_r9 import timed  # noqa: E402
from sparkstreamingrealtimedatawithkafka_spark.plans import REGISTRY  # noqa: E402
from sparkstreamingrealtimedatawithkafka_spark.session import build_session  # noqa: E402
from sparkstreamingrealtimedatawithkafka_spark.sources.registry import TABLES  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
TMP = os.environ.get("TMPDIR", "/tmp")
ENTRY = "events_interval_overlap"
FACTORS = (100, 1000)


def materialize_sfdir(spark, factor: int) -> str:
    """Synthetic sf-dir with full-raw-schema factor-x events; every other
    table symlinked from sf0.1 (the entry only reads events)."""
    from pyspark.sql import functions as F

    sfdir = os.path.join(TMP, f"ssk_sfdir_ev{factor}_r11")
    os.makedirs(sfdir, exist_ok=True)
    ev_dst = os.path.join(sfdir, "events.parquet")
    if not os.path.exists(os.path.join(ev_dst, "_SUCCESS")):
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
        rep = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("i")
        (
            ev.select("*", rep)
            .withColumn("event_id", F.col("event_id") * factor + F.col("i"))
            .withColumn("user_id", F.col("user_id") * factor + F.col("i"))
            .withColumn("ts", F.expr("ts + make_interval(0,0,0,0,0,0,i)"))
            .drop("i")
            .write.mode("overwrite")
            .parquet(ev_dst)
        )
    for tname in TABLES:
        dst = os.path.join(sfdir, f"{tname}.parquet")
        if tname != "events" and not os.path.exists(dst):
            os.symlink(f"{SF_DIR}/{tname}.parquet", dst)
    return sfdir


if __name__ == "__main__":
    spark = build_session(app_name="ssk-scale1000-interval-r11", shuffle_partitions=128)
    sc._SPARK = spark

    sfdirs = {f: materialize_sfdir(spark, f) for f in FACTORS}
    fn = REGISTRY[ENTRY].fn

    def mk(factor):
        return lambda: fn(spark, sfdirs[factor])

    out = {
        "effective_driver_memory": spark.conf.get("spark.driver.memory"),
        "protocol": (
            "binned interval-overlap join, third decade: the UNMODIFIED "
            "events_interval_overlap catalog entry end-to-end against "
            "full-raw-schema events at 100x (10M rows) and 1000x (100M) "
            "of sf0.1 (event_id/user_id perturbed per replica so key "
            "cardinality scales, ts jittered +i seconds, props carried), "
            "min-of-2 after codegen warm-up, driver heap 96g + 128 "
            "shuffle partitions at both scales; decade3_ratio = "
            "t(1000x)/t(100x), <= 10 is at-most-linear"
        ),
        "rows": {},
    }
    sc.run_noop(mk(100))  # warm codegen before timing
    t100 = timed(mk(100))
    t1000 = timed(mk(1000))
    out["rows"][ENTRY] = {
        "t_100x_sec": t100,
        "t_1000x_sec": t1000,
        "decade3_ratio": round(t1000 / t100, 2),
    }
    print(ENTRY, out["rows"][ENTRY], flush=True)
    Path("tools/scale1000_interval_r11.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))
