"""Named query catalog: every operator the engine claims is a named entry
pairing a PySpark program with (where SQL-expressible) a DuckDB oracle.

This is the engine's correctness contract (SURVEY.md §5): the driver runs
``queries()[name](spark, sf_dir)`` and the matching ``oracle_sql()[name]``
side-by-side and hash-compares results. Entries without an oracle get a
rows-only check (non-SQL-expressible ops: approximate/hashed algorithms,
pandas-UDF planes).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None
    doc: str


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def wrap(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return wrap


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}
