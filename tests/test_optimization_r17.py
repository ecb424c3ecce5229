"""Round-17 optimization regression tests: internals changed for
performance must keep their semantics AND the optimized shape.

Covered here:
- merge_into join-type selection (r17): a MOR merge without
  WHEN NOT MATCHED BY SOURCE clauses joins RIGHT OUTER (the cached join
  materializes O(source) rows, not O(table)); by-source clauses and CoW
  keep the full outer join they need.
"""

from __future__ import annotations

import pyspark.sql
import pytest
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.catalog.catalog import TableIdentifier
from iceberg_catalog_postgres_spark.catalog.maintenance import merge_into


@pytest.fixture()
def seeded(tmp_path, spark):
    from iceberg_catalog_postgres_spark.catalog.catalog import PostgresCatalog

    cat = PostgresCatalog.connect(
        "opt_r17", f"sqlite://{tmp_path}/catalog.db", str(tmp_path / "wh")
    )
    cat.initialize()
    src = spark.createDataFrame(
        [(i, f"n{i}", i % 3) for i in range(20)], "id long, name string, grp int"
    )
    table = cat.create_table(TableIdentifier.parse("t.base"), src.schema)
    return table.new_transaction().append_dataframe(src).commit(), spark


def _join_types_during(monkeypatch, fn) -> list[str]:
    """Record the `how` of every DataFrame.join made while fn runs.

    Spark 4 routes instances to pyspark.sql.classic.dataframe.DataFrame,
    which overrides join — patch the concrete class, falling back to the
    public one on older builds."""
    try:
        from pyspark.sql.classic.dataframe import DataFrame as _DF
    except ImportError:  # pragma: no cover - pre-4.0 layout
        _DF = pyspark.sql.DataFrame
    seen: list[str] = []
    orig = _DF.join

    def spy(self, other, on=None, how=None):
        seen.append(how)
        return orig(self, other, on, how)

    monkeypatch.setattr(_DF, "join", spy)
    fn()
    return [h for h in seen if h in ("full_outer", "right_outer", "fullouter")]


def test_mor_merge_without_by_source_joins_right_outer(seeded, monkeypatch):
    table, spark = seeded
    updates = spark.createDataFrame([(3, "u3", 0), (99, "new", 9)], "id long, name string, grp int")
    types = _join_types_during(
        monkeypatch,
        lambda: merge_into(
            spark,
            table,
            updates,
            on=["id"],
            when_matched=[{"action": "update", "set": "all"}],
            when_not_matched=[{"action": "insert"}],
            strategy="mor",
        ),
    )
    assert "right_outer" in types and "full_outer" not in types


def test_mor_merge_with_by_source_keeps_full_outer(seeded, monkeypatch):
    table, spark = seeded
    updates = spark.createDataFrame([(3, "u3", 0)], "id long, name string, grp int")
    types = _join_types_during(
        monkeypatch,
        lambda: merge_into(
            spark,
            table,
            updates,
            on=["id"],
            when_matched=[{"action": "update", "set": "all"}],
            when_not_matched_by_source=[{"action": "delete", "condition": "t.grp = 2"}],
            strategy="mor",
        ),
    )
    assert "full_outer" in types and "right_outer" not in types


def test_cow_merge_keeps_full_outer(seeded, monkeypatch):
    table, spark = seeded
    updates = spark.createDataFrame([(3, "u3", 0)], "id long, name string, grp int")
    types = _join_types_during(
        monkeypatch,
        lambda: merge_into(
            spark,
            table,
            updates,
            on=["id"],
            when_matched=[{"action": "update", "set": "all"}],
            strategy="cow",
        ),
    )
    assert "full_outer" in types and "right_outer" not in types


def test_mor_right_outer_merge_result_matches_cow(seeded):
    """Same clauses through both strategies must read back identically —
    the join-type narrowing cannot change WHAT the merge computes."""
    table, spark = seeded
    updates = spark.createDataFrame(
        [(3, "u3", 0), (6, "u6", 0), (99, "new", 9)], "id long, name string, grp int"
    )
    kwargs = dict(
        on=["id"],
        when_matched=[
            {"action": "delete", "condition": "t.id = 6"},
            {"action": "update", "set": "all"},
        ],
        when_not_matched=[{"action": "insert"}],
    )
    t_mor = merge_into(spark, table, updates, strategy="mor", **kwargs)
    mor_rows = sorted(map(tuple, t_mor.to_df(spark).collect()))

    # fresh table for the CoW run
    cat = table.catalog
    src = spark.createDataFrame(
        [(i, f"n{i}", i % 3) for i in range(20)], "id long, name string, grp int"
    )
    t2 = cat.create_table(TableIdentifier.parse("t.base_cow"), src.schema)
    t2 = t2.new_transaction().append_dataframe(src).commit()
    t_cow = merge_into(spark, t2, updates, strategy="cow", **kwargs)
    cow_rows = sorted(map(tuple, t_cow.to_df(spark).collect()))
    assert mor_rows == cow_rows
