"""Capture .explain("formatted") for every bench query into plans/r15/.

Usage: python tools/capture_plans_r15.py before|after [only_key ...]

Writes plans/r15/<query>_<tag>.txt for each BENCH_QUERIES key (or the
subset named on the command line). Explain-only — builds each DataFrame
and renders its formatted plan without executing it, so this is safe to
run alongside other work (no timing claims here; the bench measures).
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from bench import BENCH_QUERIES  # noqa: E402
from sparkstreamingrealtimedatawithkafka_spark.plans import REGISTRY  # noqa: E402
from sparkstreamingrealtimedatawithkafka_spark.session import build_session  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2:]
    keys = only or list(BENCH_QUERIES)
    out_dir = REPO / "plans" / "r15"
    out_dir.mkdir(parents=True, exist_ok=True)
    sf_dir = "/root/testdata/sf0.1"
    spark = build_session(app_name="ssk-plan-capture")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in keys:
        df = REGISTRY[name].fn(spark, sf_dir)
        text = df._jdf.queryExecution().explainString(mode)
        (out_dir / f"{name}_{tag}.txt").write_text(text)
        print(f"wrote {name}_{tag}.txt ({len(text)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
