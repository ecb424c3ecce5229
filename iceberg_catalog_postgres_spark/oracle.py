"""Local mirror of the driver's DuckDB-oracle correctness check.

The driver runs each ``queries()[name]`` at sf0.01 and compares with
``oracle_sql()[name]`` on row-count + schema + order-insensitive value-hash
(columns sorted by name before hashing). This module reproduces that check so
we can iterate locally before the driver grades us.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import math
from dataclasses import dataclass

import duckdb
import pandas as pd

from iceberg_catalog_postgres_spark.registry import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _cell(v) -> str:
    """Canonical string for one value (engine-neutral)."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 12 significant digits: queries are expected to round() floats
        # themselves; this guards against representation noise only.
        return f"{v:.12g}"
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_cell(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def canonicalize(df: pd.DataFrame) -> tuple[list[str], list[tuple[str, ...]]]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_cell(_from_numpy(v)) for v in row))
    out.sort()
    return cols, out


def _from_numpy(v):
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if hasattr(v, "item") and type(v).__module__ == "numpy":
        try:
            if hasattr(v, "ndim") and v.ndim > 0:
                return list(v)
        except Exception:
            pass
        return v.item()
    if v is pd.NaT:
        return None
    try:
        if v is not None and not isinstance(v, (list, tuple, dict)) and pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    return v


def value_hash(df: pd.DataFrame) -> str:
    cols, rows = canonicalize(df)
    h = hashlib.sha256()
    h.update(("|".join(cols)).encode())
    for r in rows:
        h.update(("\x1f".join(r) + "\x1e").encode())
    return h.hexdigest()


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    schema_match: bool
    hash_match: bool
    detail: str = ""


def _dtype_class(series: pd.Series) -> str:
    """Coarse dtype class for cross-engine comparison: 'int' | 'float' | 'other'.

    The driver's value-hash distinguishes ``1821`` (int64) from ``1821.0``
    (float64) even though our ``%.12g`` canonicalizer collapses them — DuckDB
    returns HUGEINT for ``sum()`` over integers, which pandas widens to
    float64/object while Spark yields int64 (bit us on q12 in round 1). Treat
    an int-vs-float column pair as a failure so the local gate is at least as
    strict as the driver's.
    """
    kind = series.dtype.kind
    if kind in "iu":
        return "int"
    if kind == "f":
        return "float"
    if kind == "O":
        for v in series:
            v = _from_numpy(v)
            if v is None:
                continue
            if isinstance(v, bool):
                return "other"
            if isinstance(v, int):
                return "int"
            if isinstance(v, float):
                return "float"
            return "other"
    return "other"


def _dtype_mismatches(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    bad = []
    for col in spark_pdf.columns:
        cs, co = _dtype_class(spark_pdf[col]), _dtype_class(oracle_pdf[col])
        if {cs, co} == {"int", "float"}:
            bad.append(f"{col}: spark={cs} oracle={co}")
    return bad


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> CompareResult:
    cols_s = sorted(spark_pdf.columns)
    cols_o = sorted(oracle_pdf.columns)
    schema_match = cols_s == cols_o
    rows_match = len(spark_pdf) == len(oracle_pdf)
    hash_match = False
    detail = ""
    if schema_match and rows_match:
        dtype_bad = _dtype_mismatches(spark_pdf, oracle_pdf)
        hs, ho = value_hash(spark_pdf), value_hash(oracle_pdf)
        hash_match = hs == ho and not dtype_bad
        if dtype_bad:
            detail = f"dtype-class mismatch: {dtype_bad}"
        elif not hash_match:
            _, rs = canonicalize(spark_pdf)
            _, ro = canonicalize(oracle_pdf)
            diff = [(a, b) for a, b in zip(rs, ro) if a != b][:3]
            detail = f"first diffs: {diff}"
    elif not schema_match:
        detail = f"schema: spark={cols_s} oracle={cols_o}"
    else:
        detail = f"rows: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    return CompareResult(
        name=name,
        ok=schema_match and rows_match and hash_match,
        spark_rows=len(spark_pdf),
        oracle_rows=len(oracle_pdf),
        schema_match=schema_match,
        hash_match=hash_match,
        detail=detail,
    )
