"""Mirror of the driver's correctness gate: every registered query with an
oracle must hash-match DuckDB at sf0.01; oracle-less queries must at least run
and return a stable schema."""

from __future__ import annotations

import pytest

from iceberg_catalog_postgres_spark.oracle import compare, duckdb_connection
from iceberg_catalog_postgres_spark.registry import load_all

REGISTRY = load_all()
WITH_ORACLE = sorted(n for n, s in REGISTRY.items() if s.oracle)
ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if not s.oracle)


@pytest.fixture(scope="module")
def duck(sf_oracle):
    con = duckdb_connection(sf_oracle)
    yield con
    con.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, sf_oracle, duck, name):
    spec = REGISTRY[name]
    spark_pdf = spec.fn(spark, sf_oracle).toPandas()
    oracle_pdf = duck.execute(spec.oracle).fetchdf()
    res = compare(name, spark_pdf, oracle_pdf)
    assert res.ok, f"{name}: {res.detail} (rows {res.spark_rows}/{res.oracle_rows})"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only(spark, sf_oracle, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_oracle)
    n = df.count()
    assert n >= 0
    assert df.schema is not None
