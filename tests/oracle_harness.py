"""Mini replica of the driver's correctness gate: run each catalog query in
Spark and its oracle in DuckDB over the same parquet, then compare
row-count + column names + order-insensitive values. Stricter than the
driver in one way: float columns are compared for *exact* equality first
and any non-exact match is reported, so determinism regressions surface
here before the driver's value-hash does.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb
import pandas as pd

from sparkstreamingrealtimedatawithkafka_spark.sources.registry import TABLES


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str = ""
    inexact_float_cols: list[str] = field(default_factory=list)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for table in TABLES:
        con.execute(
            f"CREATE VIEW {table} AS SELECT * FROM '{sf_dir}/{table}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        if df[col].dtype == object:
            df[col] = df[col].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _dtype_kind(s: pd.Series) -> str:
    """Collapse a dtype to the kind the driver's value hash is sensitive to:
    int vs float vs bool vs object (width variations hash identically)."""
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    return "object"


def compare(name: str, spark_df, oracle_df: pd.DataFrame) -> CompareResult:
    got = spark_df.toPandas()
    if len(got) != len(oracle_df):
        return CompareResult(name, False, f"row count {len(got)} != oracle {len(oracle_df)}")
    if sorted(got.columns) != sorted(oracle_df.columns):
        return CompareResult(
            name, False, f"columns {sorted(got.columns)} != oracle {sorted(oracle_df.columns)}"
        )
    # Predict the driver's value hash: DECIMAL-vs-DOUBLE or HUGEINT-vs-BIGINT
    # drift changes the hashed representation even when float(x) compares
    # equal, and unhashable cell values (lists/arrays) crash the driver's
    # canonicalizer outright (CORRECTNESS_r01.json: agg_approx_percentile).
    for col in got.columns:
        for side, frame in (("spark", got), ("oracle", oracle_df)):
            cell = frame[col].dropna().head(1)
            if len(cell) and isinstance(cell.iloc[0], (list, tuple, dict, set)) or (
                len(cell) and type(cell.iloc[0]).__name__ == "ndarray"
            ):
                return CompareResult(
                    name, False,
                    f"{side} col {col} holds {type(cell.iloc[0]).__name__} values — "
                    "driver canonicalizer crashes on unhashable cells",
                )
        ka, kb = _dtype_kind(got[col]), _dtype_kind(oracle_df[col])
        if ka != kb:
            return CompareResult(
                name, False,
                f"dtype kind mismatch on {col}: spark={got[col].dtype} ({ka}) "
                f"vs oracle={oracle_df[col].dtype} ({kb}) — driver hash would differ",
            )
    if len(got) == 0:
        return CompareResult(name, True, "empty (weak)")
    a, b = _normalize(got), _normalize(oracle_df)
    inexact: list[str] = []
    for col in a.columns:
        av, bv = a[col], b[col]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = av.astype(float)
            bv = bv.astype(float)
            exact = ((av == bv) | (av.isna() & bv.isna())).all()
            if not exact:
                close = all(
                    (math.isnan(x) and math.isnan(y))
                    or x == y
                    or math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-12)
                    for x, y in zip(av, bv)
                )
                if not close:
                    bad = [(x, y) for x, y in zip(av, bv) if x != y][:3]
                    return CompareResult(name, False, f"float col {col} differs: {bad}")
                inexact.append(col)
        else:
            eq = (av.astype(str) == bv.astype(str)).all()
            if not eq:
                bad = a.loc[av.astype(str) != bv.astype(str), col].head(3).tolist()
                badb = b.loc[av.astype(str) != bv.astype(str), col].head(3).tolist()
                return CompareResult(name, False, f"col {col} differs: spark={bad} oracle={badb}")
    return CompareResult(name, True, inexact_float_cols=inexact)


def run_one(
    spark, con, sf_dir: str, name: str, fn, sql: str | None, in_window: bool = True
) -> CompareResult:
    df = fn(spark, sf_dir)
    if sql is None:
        n = df.count()
        # The driver implements NO rows-only fallback: an in-window entry
        # without an oracle lands err:"no_oracle" (CORRECTNESS_r01.json).
        if in_window:
            return CompareResult(
                name, False, f"no_oracle — driver errors on this entry ({n} rows)"
            )
        return CompareResult(name, True, f"rows-only, out of driver window ({n} rows)")
    oracle_df = con.execute(sql).fetchdf()
    return compare(name, df, oracle_df)
