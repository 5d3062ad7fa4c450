"""Driver-gate replica: every catalog query vs its DuckDB oracle at sf0.001."""

from __future__ import annotations

import pytest

from sparkstreamingrealtimedatawithkafka_spark.plans import REGISTRY
from tests.conftest import SF_DIR
from tests.oracle_harness import duck_connection, run_one


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, duck, name):
    spec = REGISTRY[name]
    # The driver hash-checks only the first 50 registration-order entries
    # (and errors on any of those without an oracle); later entries get a
    # rows-only pass here, mirroring tools/driver_sim.py.
    in_window = name in list(REGISTRY)[:50]
    result = run_one(spark, duck, SF_DIR, name, spec.fn, spec.oracle, in_window=in_window)
    assert result.ok, f"{name}: {result.detail}"
    if result.inexact_float_cols:
        pytest.fail(
            f"{name}: float cols not bit-exact (driver hash would likely fail): "
            f"{result.inexact_float_cols}"
        )


def test_entry_smoke(spark):
    import importlib.util
    from pathlib import Path

    path = Path(__file__).resolve().parent.parent / "__spark_entry__.py"
    spec = importlib.util.spec_from_file_location("__spark_entry__", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert rows[0]["cnt"] >= rows[-1]["cnt"]
