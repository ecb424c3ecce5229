"""Mirror of the driver's correctness gate: every registered query with an
oracle must hash-match DuckDB at sf0.01; oracle-less queries must at least run
and return a stable schema.

Tiering (r18): the external driver runs this EXACT gate itself over every
declared query right after the suite, so the in-suite mirror's default tier
keeps a representative slice — every bench-tagged query plus a stable 1-in-8
of the rest (~9 min of the 42-min suite was this duplication). The full
344-query sweep runs under SPARK_GRAFT_SOAK=1."""

from __future__ import annotations

import zlib

import pytest

from iceberg_catalog_postgres_spark.oracle import compare, duckdb_connection
from iceberg_catalog_postgres_spark.registry import load_all
from tests.conftest import SOAK, soak_only

REGISTRY = load_all()
WITH_ORACLE = sorted(n for n, s in REGISTRY.items() if s.oracle)
ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if not s.oracle)


def _default_tier(name: str) -> bool:
    # stable, seed-free slice: crc32 keeps the same 1-in-8 across runs, so
    # a regression in a sliced-out query is caught by the driver gate and
    # by SOAK runs, never silently rotated away
    return "bench" in REGISTRY[name].tags or zlib.crc32(name.encode()) % 8 == 0


def _tiered(names):
    return [
        n if (SOAK or _default_tier(n)) else pytest.param(n, marks=soak_only)
        for n in names
    ]


@pytest.fixture(scope="module")
def duck(sf_oracle):
    con = duckdb_connection(sf_oracle)
    yield con
    con.close()


@pytest.mark.parametrize("name", _tiered(WITH_ORACLE))
def test_oracle_parity(spark, sf_oracle, duck, name):
    spec = REGISTRY[name]
    spark_pdf = spec.fn(spark, sf_oracle).toPandas()
    oracle_pdf = duck.execute(spec.oracle).fetchdf()
    res = compare(name, spark_pdf, oracle_pdf)
    assert res.ok, f"{name}: {res.detail} (rows {res.spark_rows}/{res.oracle_rows})"


@pytest.mark.parametrize("name", _tiered(ROWS_ONLY))
def test_rows_only(spark, sf_oracle, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_oracle)
    n = df.count()
    assert n >= 0
    assert df.schema is not None


def test_compare_rejects_int_vs_float_column():
    """Round-1 driver failure mode (q12): identical values, int64 on the Spark
    side vs DuckDB HUGEINT→float64 on the oracle side. Our %.12g canonicalizer
    collapses 1821 and 1821.0, the driver's hash does not — the local gate must
    be at least as strict."""
    import pandas as pd

    spark_pdf = pd.DataFrame({"band": ["low", "high"], "cnt": pd.Series([1821, 402], dtype="int64")})
    oracle_pdf = pd.DataFrame({"band": ["low", "high"], "cnt": [1821.0, 402.0]})
    res = compare("synthetic_sum_case", spark_pdf, oracle_pdf)
    assert not res.ok
    assert "dtype-class mismatch" in res.detail
    # same frames with matching dtype classes pass
    ok = compare("synthetic_ok", spark_pdf, spark_pdf.copy())
    assert ok.ok


def test_compare_accepts_object_int_vs_int64():
    """DuckDB HUGEINT sometimes lands as an object column of Python ints —
    values stringify identically, so this must NOT fail."""
    import pandas as pd

    a = pd.DataFrame({"n": pd.Series([7, 9], dtype="int64")})
    b = pd.DataFrame({"n": pd.Series([7, 9], dtype="object")})
    assert compare("obj_int", a, b).ok


def test_grading_prefix_spans_every_family():
    """The driver grades a bounded prefix of the registry (50 entries in
    round 1). Pin that the first 50 registered queries cover every SURVEY §2
    family so a new registration can't silently push a family out of the
    certification window."""
    names = list(REGISTRY)
    first50 = names[:50]
    fams = {REGISTRY[n].fn.__module__.rsplit(".", 1)[-1] for n in first50}
    required = {
        "tpch", "tpch2", "relational", "windows", "scalar", "udfs", "readers",
        "dedup", "similarity", "quantize", "text", "multimodal",
        "queries", "maintenance",
    }
    assert required <= fams, f"families missing from grading prefix: {required - fams}"
    with_oracle = sum(1 for n in first50 if REGISTRY[n].oracle)
    assert with_oracle >= 44, with_oracle
