"""SQL transaction scripts (r13 continuation): ``BEGIN; <dml>; ...;
COMMIT`` through ``execute_script``/``execute_dml`` — every statement's
pointer swap lands in one database transaction. Parser refusals, snapshot
isolation (statements read pre-script state), all-or-nothing under a
concurrent winner, retry rebasing, every DML kind in one script, and the
strategy kwargs pass-through. Also pins the r13 DELETE strategy=\"cow\"
fix (previously a TypeError)."""

from __future__ import annotations

import pytest

from iceberg_catalog_postgres_spark.catalog.catalog import (
    CommitConflictError,
    PostgresCatalog,
    TableIdentifier,
)
from iceberg_catalog_postgres_spark.catalog.merge_sql import execute_dml
from iceberg_catalog_postgres_spark.catalog.transaction_sql import (
    execute_script,
    parse_script,
)


@pytest.fixture
def catalog(tmp_path):
    cat = PostgresCatalog.connect("tsql", None, str(tmp_path / "wh"))
    cat.initialize()
    yield cat
    cat.backend.close()


def _seed(catalog, spark, name, rows=()):
    df = spark.createDataFrame(list(rows) or [(0, 0, 0)], "k int, r int, v int")
    t = catalog.create_table(TableIdentifier.parse(name), df.schema)
    if rows:
        t = t.new_transaction().append_dataframe(df.coalesce(1)).commit()
    return t


# ---------------------------------------------------------------------------
# parser


def test_parse_script_shapes():
    body = parse_script(
        "BEGIN TRANSACTION; DELETE FROM a.t WHERE k = 1; "
        "INSERT INTO a.u VALUES (1, 2, 3); COMMIT;"
    )
    assert [(kw, tgt) for kw, tgt, _ in body] == [
        ("DELETE", "a.t"), ("INSERT", "a.u"),
    ]


def test_parse_script_refusals():
    with pytest.raises(ValueError, match="BEGIN"):
        parse_script("DELETE FROM a.t; COMMIT")
    with pytest.raises(ValueError, match="COMMIT"):
        parse_script("BEGIN; DELETE FROM a.t")
    with pytest.raises(ValueError, match="DDL"):
        parse_script("BEGIN; DROP TABLE a.t; COMMIT")
    with pytest.raises(ValueError, match="target of two statements"):
        parse_script(
            "BEGIN; DELETE FROM a.t WHERE k=1; UPDATE a.t SET v = 1; COMMIT"
        )
    with pytest.raises(ValueError, match="DDL|support"):
        parse_script("BEGIN; SELECT * FROM a.t; COMMIT")


# ---------------------------------------------------------------------------
# execution


def test_archive_script_atomic_and_isolated(spark, catalog):
    _seed(catalog, spark, "ns.hot", [(i, i % 3, i * 10) for i in range(12)])
    _seed(catalog, spark, "ns.cold")
    res = execute_dml(
        spark, catalog,
        """
        BEGIN;
        DELETE FROM ns.hot WHERE r = 2;
        INSERT INTO ns.cold SELECT k, r, v FROM ns.hot WHERE r = 2;
        COMMIT
        """,
    )
    assert len(res) == 2 and all(t is not None for t in res)
    hot = catalog.load_table(TableIdentifier.parse("ns.hot"))
    cold = catalog.load_table(TableIdentifier.parse("ns.cold"))
    # snapshot isolation: the INSERT's SELECT read hot's PRE-script state,
    # so the deleted rows were still visible to it — the move is lossless
    assert hot.to_df(spark).count() == 8
    assert cold.to_df(spark).count() == 4
    got = sorted(
        r.k for r in hot.to_df(spark).union(cold.to_df(spark)).collect()
    )
    assert got == list(range(12))


def test_all_dml_kinds_in_one_script(spark, catalog):
    _seed(catalog, spark, "ns.a", [(1, 0, 10)])
    _seed(catalog, spark, "ns.b", [(1, 0, 10), (2, 0, 20)])
    _seed(catalog, spark, "ns.c", [(9, 9, 90)])
    _seed(catalog, spark, "ns.d", [(5, 5, 50)])
    execute_dml(
        spark, catalog,
        """
        BEGIN;
        INSERT INTO ns.a VALUES (2, 0, 20);
        UPDATE ns.b SET v = v + 1 WHERE k = 1;
        DELETE FROM ns.c WHERE k = 9;
        MERGE INTO ns.d AS t USING (SELECT 6 AS k, 6 AS r, 60 AS v) AS s
          ON t.k = s.k WHEN NOT MATCHED THEN INSERT (k, r, v)
          VALUES (s.k, s.r, s.v);
        COMMIT
        """,
    )
    assert catalog.load_table(TableIdentifier.parse("ns.a")).record_count() == 2
    b = catalog.load_table(TableIdentifier.parse("ns.b")).to_df(spark)
    assert {(x.k, x.v) for x in b.collect()} == {(1, 11), (2, 20)}
    assert catalog.load_table(
        TableIdentifier.parse("ns.c")
    ).to_df(spark).count() == 0
    assert catalog.load_table(TableIdentifier.parse("ns.d")).record_count() == 2


def test_script_conflict_commits_nothing_then_rebases(spark, catalog):
    from iceberg_catalog_postgres_spark.catalog import transaction_sql as _ts

    _seed(catalog, spark, "ns.a", [(i, 0, 0) for i in range(4)])
    _seed(catalog, spark, "ns.b")
    # a concurrent writer lands between statement prep and the swap:
    # monkeypatch update_tables to inject one append on ns.a first
    real = catalog.update_tables
    injected = []

    def sabotage(updates):
        if not injected:
            injected.append(True)
            extra = spark.createDataFrame([(99, 9, 9)], "k int, r int, v int")
            catalog.load_table(
                TableIdentifier.parse("ns.a")
            ).new_transaction().append_dataframe(extra.coalesce(1)).commit()
        return real(updates)

    catalog.update_tables = sabotage
    try:
        res = execute_script(
            spark, catalog,
            "BEGIN; DELETE FROM ns.a WHERE k = 0; "
            "INSERT INTO ns.b VALUES (1, 1, 1); COMMIT",
        )
    finally:
        catalog.update_tables = real
    # the retry re-ran both statements on the winner's state: the injected
    # row survives, k=0 is gone, and ns.b got exactly ONE row
    a = catalog.load_table(TableIdentifier.parse("ns.a")).to_df(spark)
    assert sorted(x.k for x in a.collect()) == [1, 2, 3, 99]
    assert catalog.load_table(TableIdentifier.parse("ns.b")).record_count() == 1
    assert len(res) == 2

    # with retries exhausted the conflict surfaces and nothing commits
    injected.clear()
    catalog.update_tables = sabotage
    try:
        with pytest.raises(CommitConflictError):
            execute_script(
                spark, catalog,
                "BEGIN; DELETE FROM ns.a WHERE k = 1; "
                "INSERT INTO ns.b VALUES (2, 2, 2); COMMIT",
                max_retries=0,
            )
    finally:
        catalog.update_tables = real
    assert catalog.load_table(TableIdentifier.parse("ns.b")).record_count() == 1


def test_script_kwargs_passthrough_mor(spark, catalog):
    _seed(catalog, spark, "ns.a", [(i, i % 2, 0) for i in range(6)])
    _seed(catalog, spark, "ns.b", [(0, 0, 0)])
    execute_script(
        spark, catalog,
        "BEGIN; DELETE FROM ns.a WHERE r = 1; "
        "UPDATE ns.b SET v = 7 WHERE k = 0; COMMIT",
        strategy="mor",
    )
    a = catalog.load_table(TableIdentifier.parse("ns.a"))
    snap = a.metadata.current_snapshot()
    # MOR honored through the script: deletion vectors, no data rewrite
    assert snap.deletion_vectors
    assert a.to_df(spark).count() == 3


def test_delete_cow_strategy_fixed(spark, catalog):
    """r13 regression pin: DELETE ... strategy='cow' was a TypeError
    (delete_where_cow's range signature); now an arbitrary-predicate CoW
    overwrite."""
    _seed(catalog, spark, "ns.t", [(i, i % 3, 0) for i in range(9)])
    t = execute_dml(
        spark, catalog, "DELETE FROM ns.t WHERE r = 1", strategy="cow"
    )
    snap = t.metadata.current_snapshot()
    assert t.to_df(spark).count() == 6
    assert not snap.deletion_vectors  # CoW: rewrite, no delete artifacts
    assert not snap.position_delete_files
