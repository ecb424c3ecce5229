"""The parsed-SQL expression path must actually be TAKEN (VERDICT r17,
"What's wrong" #5): ``col_ref_sql`` renders via a private Catalyst surface
(``Column._jc.node().sql()``), and every caller keeps an identical-result
lambda-Column fallback.  A Spark upgrade that breaks the render would not
fail any result test — it would silently re-pay the ~3 py4j round trips
per lambda that r17/r18 removed.  These tests pin the fast path.

Discriminator: a Column built from Python lambdas renders its lambda
variables auto-numbered (``(x_1, y_2) -> *(x_1, y_2)``); a Column parsed
from SQL text keeps the original source (``(a, b) -> a * b``).  So the
presence of ``_<n> ->``-style numbered lambda args marks the fallback.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.exprs import col_ref_sql

_NUMBERED_LAMBDA = re.compile(r"\w+_\d+(?:, \w+_\d+)* ->")


def _is_parsed(col) -> bool:
    return not _NUMBERED_LAMBDA.search(repr(col))


def test_col_ref_sql_renders_plain_and_nested_refs(spark):
    assert col_ref_sql(F.col("qe")) == "qe"
    assert col_ref_sql(F.col("m.d")) == "m.d"
    assert col_ref_sql("already_sql") == "already_sql"


def test_col_ref_sql_refuses_non_columns(spark):
    assert col_ref_sql(object()) is None
    assert col_ref_sql(None) is None


def test_ann_scale_metrics_take_expr_path(spark):
    from iceberg_catalog_postgres_spark.llm.ann_scale import _cos, _l2

    cos = _cos(F.col("qe"), F.col("ne"))
    l2 = _l2(F.col("qe"), F.col("ne"))
    assert _is_parsed(cos), repr(cos)
    assert _is_parsed(l2), repr(l2)
    # the parsed text is the r17 fold, verbatim
    assert "zip_with(qe, ne, (a, b) -> a * b)" in repr(cos)
    assert "(a - b) * (a - b)" in repr(l2)


def test_similarity_dot_norm_take_expr_path(spark):
    from iceberg_catalog_postgres_spark.llm.similarity import _dot, _norm

    dot = _dot(F.col("a"), F.col("b"))
    nrm = _norm("e")
    assert _is_parsed(dot), repr(dot)
    assert _is_parsed(nrm), repr(nrm)


def test_pq_distance_columns_take_expr_path(spark):
    from iceberg_catalog_postgres_spark.llm.pq import _sq_dist_cols

    cols = _sq_dist_cols([[0.5, 1.5], [2.0, 3.0]], src="slice(r, 1, 2)")
    assert len(cols) == 2
    for c in cols:
        assert _is_parsed(c), repr(c)
        assert "slice(r, 1, 2)" in repr(c)


def test_residual_centroid_sql_parses_and_selects(spark):
    from iceberg_catalog_postgres_spark.llm.ann_residual import _centroid_sql

    cents = [(0, [1.0, 2.0]), (1, [3.0, 4.0])]
    df = spark.createDataFrame([(0,), (1,)], "cluster int").select(
        "cluster", F.expr(_centroid_sql(cents)).alias("c")
    )
    got = {r["cluster"]: r["c"] for r in df.collect()}
    assert got == {0: [1.0, 2.0], 1: [3.0, 4.0]}


def test_fallback_still_correct_when_render_fails(spark, monkeypatch):
    """If the private render surface vanishes, callers must degrade to the
    lambda build with identical results — never error."""
    import iceberg_catalog_postgres_spark.exprs as exprs_mod
    import iceberg_catalog_postgres_spark.llm.similarity as sim

    df = spark.createDataFrame([([3.0, 4.0],)], "e array<double>")
    fast = df.select(sim._norm("e").alias("n")).first()["n"]
    monkeypatch.setattr(sim, "_col_ref_sql", lambda _c: None)
    slow_col = sim._norm("e")
    assert not _is_parsed(slow_col)  # fallback really exercised
    slow = df.select(slow_col.alias("n")).first()["n"]
    assert fast == slow == 5.0
