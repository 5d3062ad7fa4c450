"""Catalog meta-integrity: the driver contract cannot be broken by a
typo'd bench name or an oracle that DuckDB refuses to parse — both would
fail only at driver time otherwise."""

from __future__ import annotations

import duckdb
import pytest

from bench import BENCH_QUERIES
from sparkstreamingrealtimedatawithkafka_spark.plans import REGISTRY
from sparkstreamingrealtimedatawithkafka_spark.sources.registry import TABLES

from conftest import SF_DIR  # single source of truth for the fixture dir


def test_bench_names_resolve():
    missing = [n for n in BENCH_QUERIES if n not in REGISTRY]
    assert not missing, f"bench names not in registry: {missing}"


def test_every_oracle_parses_and_plans_in_duckdb():
    con = duckdb.connect()
    for t in TABLES:
        if t == "events":
            con.sql(
                f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
            )
        else:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    bad = {}
    for name, spec in REGISTRY.items():
        if not spec.oracle:
            continue
        try:
            con.sql(f"EXPLAIN {spec.oracle}")
        except Exception as e:  # noqa: BLE001
            bad[name] = str(e)[:120]
    assert not bad, f"oracles DuckDB cannot plan: {bad}"


def test_registry_docstrings_present():
    undocumented = [n for n, s in REGISTRY.items() if not s.doc.strip()]
    assert not undocumented, f"catalog entries without docstrings: {undocumented}"


@pytest.mark.parametrize("fn_name", ["entry", "queries", "oracle_sql"])
def test_driver_contract_surface(fn_name):
    import __spark_entry__ as mod

    assert callable(getattr(mod, fn_name))
