"""SQL front-end for MERGE INTO (r12): grammar -> merge_into dispatch.
The parser is pinned on clause structure, alias normalization, CASE
nesting, and loud refusals; the execution tests run the same decision
table as ``test_merge_into`` through the SQL string path, both CoW and
MOR."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.catalog.catalog import (
    PostgresCatalog,
    TableIdentifier,
)
from iceberg_catalog_postgres_spark.catalog.merge_sql import merge_sql, parse_merge


@pytest.fixture
def catalog(tmp_path):
    cat = PostgresCatalog.connect("msql", None, str(tmp_path / "wh"))
    cat.initialize()
    yield cat
    cat.backend.close()


def _seed(catalog, spark, name="m.t", rows=None):
    rows = rows or [(i, f"n{i}", i % 3) for i in range(9)]
    df = spark.createDataFrame(rows, "k long, name string, r long")
    t = catalog.create_table(TableIdentifier.parse(name), df.schema)
    return t.new_transaction().append_dataframe(df.coalesce(2)).commit()


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


def test_parse_full_decision_table():
    p = parse_merge("""
        MERGE INTO m.t AS tgt
        USING (SELECT * FROM src_view) AS src
        ON tgt.k = src.k
        WHEN MATCHED AND tgt.r = 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET name = src.name
        WHEN NOT MATCHED THEN INSERT (k, name, r) VALUES (src.k, src.name, 9)
        WHEN NOT MATCHED BY SOURCE AND tgt.r = 3
            THEN UPDATE SET name = upper(tgt.name)
        WHEN NOT MATCHED BY SOURCE AND tgt.r = 4 THEN DELETE
    """)
    assert p["target"] == "m.t" and p["on"] == ["k"]
    assert p["source"] == ("subquery", "SELECT * FROM src_view")
    assert p["when_matched"] == [
        {"action": "delete", "condition": "t.r = 0"},
        {"action": "update", "set": {"name": "s.name"}},
    ]
    assert p["when_not_matched"] == [
        {"action": "insert", "values": {"k": "s.k", "name": "s.name", "r": "9"}}
    ]
    assert p["when_not_matched_by_source"] == [
        {"action": "update", "condition": "t.r = 3",
         "set": {"name": "upper ( t.name )"}},
        {"action": "delete", "condition": "t.r = 4"},
    ]


def test_parse_defaults_star_and_multi_key():
    p = parse_merge("""
        MERGE INTO db.tbl USING updates
        ON t.a = s.a AND t.b <=> s.b
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
    """)
    assert p["on"] == ["a", "b"]
    assert p["source"] == ("name", "updates")
    assert p["when_matched"] == [{"action": "update", "set": "all"}]
    assert p["when_not_matched"] == [{"action": "insert"}]


def test_parse_case_when_inside_condition_and_set():
    """CASE WHEN ... THEN ... END inside expressions must not split
    clauses (the WHEN/THEN tracker is CASE-aware)."""
    p = parse_merge("""
        MERGE INTO m.t USING u ON t.k = u.k
        WHEN MATCHED AND (CASE WHEN u.r > 1 THEN 1 ELSE 0 END) = 1
            THEN UPDATE SET name = CASE WHEN u.r = 2 THEN 'two' ELSE u.name END
    """)
    (cl,) = p["when_matched"]
    assert "CASE WHEN s.r > 1 THEN 1 ELSE 0 END" in cl["condition"]
    assert cl["set"]["name"].startswith("CASE WHEN s.r = 2 THEN 'two'")


def test_parse_alias_shadowing_and_string_literals():
    """A target aliased `s` shadows the default source alias; alias-like
    text inside string literals is untouched."""
    p = parse_merge("""
        MERGE INTO m.t AS s USING u AS x ON s.k = x.k
        WHEN MATCHED THEN UPDATE SET name = 's.not_an_alias'
        WHEN NOT MATCHED BY SOURCE AND s.name = 'x' THEN DELETE
    """)
    assert p["when_matched"] == [
        {"action": "update", "set": {"name": "'s.not_an_alias'"}}
    ]
    assert p["when_not_matched_by_source"] == [
        {"action": "delete", "condition": "t.name = 'x'"}
    ]


@pytest.mark.parametrize(
    "sql, msg",
    [
        ("MERGE INTO m.t USING u ON t.k < s.k WHEN MATCHED THEN DELETE",
         "conjunction of t.col = s.col"),
        ("MERGE INTO m.t USING u ON t.k = s.other WHEN MATCHED THEN DELETE",
         "share a name"),
        ("MERGE INTO m.t USING u ON t.k = s.k WHEN MATCHED THEN INSERT *",
         "only valid in WHEN NOT MATCHED"),
        ("MERGE INTO m.t USING u ON t.k = s.k", "at least one WHEN"),
        ("MERGE INTO m.t USING u ON t.k = s.k "
         "WHEN NOT MATCHED THEN INSERT (a, b) VALUES (1)", "2 columns but 1"),
        ("MERGE INTO m.t AS x USING u AS x ON x.k = x.k WHEN MATCHED THEN DELETE",
         "share the alias"),
    ],
)
def test_parse_refusals(sql, msg):
    with pytest.raises(ValueError, match=msg):
        parse_merge(sql)


# ---------------------------------------------------------------------------
# execution: same decision table as test_merge_into, via SQL
# ---------------------------------------------------------------------------

_STMT = """
    MERGE INTO {ident} AS tgt
    USING updates AS u
    ON tgt.k = u.k
    WHEN MATCHED AND tgt.r = 0 THEN DELETE
    WHEN MATCHED THEN UPDATE SET name = u.name
    WHEN NOT MATCHED THEN INSERT (k, name, r) VALUES (u.k, u.name, u.r)
    WHEN NOT MATCHED BY SOURCE AND tgt.r = 1
        THEN UPDATE SET name = upper(tgt.name)
    WHEN NOT MATCHED BY SOURCE AND tgt.r = 2 THEN DELETE
"""

_EXPECT = {
    # matched & r=0 (k 0,3) deleted; matched else (1,2) updated;
    # NMBS r=1 (4,7) uppercased; NMBS r=2 (5,8) deleted; r=0 (6) kept;
    # inserts 20,21
    1: "s1", 2: "s2", 4: "N4", 6: "n6", 7: "N7", 20: "x20", 21: "x21",
}


def _run(spark, catalog, t, strategy):
    src = spark.createDataFrame(
        [(0, "s0", 0), (1, "s1", 1), (2, "s2", 2), (3, "s3", 0),
         (20, "x20", 5), (21, "x21", 5)],
        "k long, name string, r long",
    )
    src.createOrReplaceTempView("updates")
    return merge_sql(
        spark, catalog, _STMT.format(ident=t.identifier),
        preserve_lineage=True, strategy=strategy,
    )


def test_merge_sql_cow_decision_table(catalog, spark):
    t = _seed(catalog, spark, "m.sqlcow")
    t = _run(spark, catalog, t, "cow")
    got = {r.k: r.name for r in t.to_df(spark).collect()}
    assert got == _EXPECT


def test_merge_sql_mor_row_delta(catalog, spark):
    t = _seed(catalog, spark, "m.sqlmor")
    before_files = set(t.metadata.current_data_files())
    t = _run(spark, catalog, t, "mor")
    got = {r.k: r.name for r in t.to_df(spark).collect()}
    assert got == _EXPECT
    snap = t.metadata.current_snapshot()
    assert snap.operation == "rowdelta"
    assert before_files <= set(snap.data_files)  # base files untouched


def test_merge_sql_sources_dict_and_subquery(catalog, spark):
    t = _seed(catalog, spark, "m.sqlsrc", rows=[(1, "a", 0), (2, "b", 1)])
    upd = spark.createDataFrame([(1, "A", 0)], "k long, name string, r long")
    t = merge_sql(
        spark, catalog,
        f"MERGE INTO {t.identifier} USING upd ON t.k = upd.k "
        "WHEN MATCHED THEN UPDATE SET *",
        sources={"upd": upd},
    )
    assert {r.k: r.name for r in t.to_df(spark).collect()} == {1: "A", 2: "b"}
    upd.createOrReplaceTempView("upd_view")
    t = merge_sql(
        spark, catalog,
        f"MERGE INTO {t.identifier} USING "
        "(SELECT k, 'Z' AS name, r FROM upd_view) z ON t.k = z.k "
        "WHEN MATCHED THEN UPDATE SET name = z.name",
    )
    assert {r.k: r.name for r in t.to_df(spark).collect()} == {1: "Z", 2: "b"}


def test_merge_sql_cardinality_guard_fires(catalog, spark):
    t = _seed(catalog, spark, "m.sqlguard", rows=[(1, "a", 0)])
    dup = spark.createDataFrame(
        [(1, "x", 0), (1, "y", 0)], "k long, name string, r long"
    )
    dup.createOrReplaceTempView("dup_src")
    with pytest.raises(ValueError, match="cardinality"):
        merge_sql(
            spark, catalog,
            f"MERGE INTO {t.identifier} USING dup_src "
            "ON t.k = dup_src.k WHEN MATCHED THEN UPDATE SET *",
        )


# ---------------------------------------------------------------------------
# UPDATE / DELETE statements (r12: the rest of the SQL DML surface)
# ---------------------------------------------------------------------------

from iceberg_catalog_postgres_spark.catalog.merge_sql import (  # noqa: E402
    delete_sql,
    execute_dml,
    parse_delete,
    parse_update,
    update_sql,
)


def test_parse_update_and_delete():
    p = parse_update(
        "UPDATE m.t AS x SET name = upper(x.name), r = x.r + 1 "
        "WHERE x.r = 2 AND x.name <> 'keep'"
    )
    assert p["target"] == "m.t"
    assert p["set"] == {"name": "upper ( name )", "r": "r + 1"}
    assert p["where"] == "r = 2 AND name <> 'keep'"
    p = parse_update("UPDATE db.t SET a = 1")
    assert p["set"] == {"a": "1"} and p["where"] is None
    p = parse_delete("DELETE FROM db.t WHERE t.k IN (SELECT k FROM other)")
    assert p["where"] == "k IN ( SELECT k FROM other )"
    assert parse_delete("DELETE FROM db.t")["where"] is None
    with pytest.raises(ValueError, match="expected FROM"):
        parse_delete("DELETE db.t WHERE k = 1")
    with pytest.raises(ValueError, match="col = expr"):
        parse_update("UPDATE db.t SET WHERE k = 1")


def test_update_sql_mor_row_delta_and_lineage(catalog, spark):
    t = _seed(catalog, spark, "m.upd")
    before_files = set(t.metadata.current_data_files())
    t = update_sql(
        spark, catalog,
        f"UPDATE {t.identifier} AS t SET name = upper(t.name) WHERE t.r = 1",
        preserve_lineage=True,
    )
    snap = t.metadata.current_snapshot()
    assert snap.operation == "rowdelta"
    assert before_files <= set(snap.data_files)  # originals untouched
    got = {r.k: r.name for r in t.to_df(spark).collect()}
    assert got == {
        i: (f"n{i}".upper() if i % 3 == 1 else f"n{i}") for i in range(9)
    }
    # lineage-diff: the batch changelog reconstructs update pairs
    pairs = {
        (r._change_type, r.k)
        for r in t.changelog_df(
            spark, sorted(t.metadata.snapshots, key=lambda s: s.sequence_number)[0].snapshot_id
        ).collect()
        if r._change_type.startswith("update")
    }
    assert pairs == {
        (ct, k) for k in (1, 4, 7) for ct in ("update_before", "update_after")
    }


def test_update_where_cow_and_no_match_noop(catalog, spark):
    from iceberg_catalog_postgres_spark.catalog.maintenance import update_where

    t = _seed(catalog, spark, "m.updcow")
    t = update_where(
        spark, t, "r = 0", {"name": "concat(name, '!')"}, strategy="cow"
    )
    assert t.metadata.current_snapshot().operation == "overwrite"
    got = {r.k: r.name for r in t.to_df(spark).collect()}
    assert got[0] == "n0!" and got[3] == "n3!" and got[1] == "n1"
    n_snaps = len(t.metadata.snapshots)
    t = update_where(spark, t, "k = 999", {"name": "'x'"})  # matches nothing
    assert len(t.metadata.snapshots) == n_snaps  # no-op: no commit


def test_delete_sql_dv_and_execute_dml_dispatch(catalog, spark):
    t = _seed(catalog, spark, "m.del")
    t = delete_sql(
        spark, catalog, f"DELETE FROM {t.identifier} WHERE k >= 6"
    )
    assert len(t.metadata.current_deletion_vectors()) >= 1
    assert sorted(r.k for r in t.to_df(spark).collect()) == list(range(6))
    # dispatcher routes all three statement kinds
    upd = spark.createDataFrame([(0, "M", 0)], "k long, name string, r long")
    t = execute_dml(
        spark, catalog,
        f"MERGE INTO {t.identifier} USING u ON t.k = u.k "
        "WHEN MATCHED THEN UPDATE SET *",
        sources={"u": upd},
    )
    t = execute_dml(spark, catalog, f"UPDATE {t.identifier} SET r = 9 WHERE k = 1")
    t = execute_dml(spark, catalog, f"DELETE FROM {t.identifier} WHERE k = 2")
    got = {r.k: (r.name, r.r) for r in t.to_df(spark).collect()}
    assert got[0] == ("M", 0) and got[1][1] == 9 and 2 not in got
    # SELECT dispatches to the read front-end since r13 (test_select_sql)
    assert execute_dml(spark, catalog, "SELECT 1 AS one").first().one == 1
    with pytest.raises(ValueError, match="MERGE/UPDATE/DELETE"):
        execute_dml(spark, catalog, "GRANT ALL ON t TO nobody")


# ---------------------------------------------------------------------------
# INSERT / CREATE TABLE AS SELECT (r12: the DDL/DML quartet complete)
# ---------------------------------------------------------------------------

from iceberg_catalog_postgres_spark.catalog.merge_sql import (  # noqa: E402
    create_table_sql,
    insert_sql,
    parse_create_table,
    parse_insert,
)


def test_parse_insert_and_ctas():
    p = parse_insert("INSERT INTO db.t (k, name) VALUES (1, 'a'), (2, 'b')")
    assert p == {
        "target": "db.t", "overwrite": False, "partition": None,
        "columns": ["k", "name"], "by_name": False,
        "source": ("values", "( 1 , 'a' ) , ( 2 , 'b' )"),
    }
    p = parse_insert("INSERT OVERWRITE db.t SELECT * FROM v WHERE k > 1")
    assert p["overwrite"] and p["columns"] is None
    assert p["source"] == ("select", "SELECT * FROM v WHERE k > 1")
    p = parse_create_table(
        "CREATE TABLE db.c PARTITIONED BY (r, bucket(4, k)) AS SELECT k, r FROM v"
    )
    # r16: entries canonicalize to the spec spelling (space-joined
    # "day ( ts )" never matched the transform regex and failed creation)
    assert p["partition_by"] == ["r", "bucket(4, k)"]
    assert p["select"] == "SELECT k , r FROM v"
    with pytest.raises(ValueError, match="VALUES or SELECT"):
        parse_insert("INSERT INTO db.t SET k = 1")
    # r13: a bare column list is the column-DDL form (empty table), no AS
    p = parse_create_table("CREATE TABLE db.t (k long)")
    assert p["select"] is None and p["columns"] == [("k", ["long"])]
    with pytest.raises(ValueError, match="column list or AS SELECT"):
        parse_create_table("CREATE TABLE db.t")


def test_insert_sql_values_select_and_overwrite(catalog, spark):
    t = _seed(catalog, spark, "m.ins", rows=[(1, "a", 0)])
    t = insert_sql(
        spark, catalog,
        f"INSERT INTO {t.identifier} (k, name) VALUES (2, 'b'), (3, 'c')",
    )
    got = {r.k: (r.name, r.r) for r in t.to_df(spark).collect()}
    assert got == {1: ("a", 0), 2: ("b", None), 3: ("c", None)}
    spark.createDataFrame(
        [(10, "x", 5)], "k long, name string, r long"
    ).createOrReplaceTempView("ins_src")
    t = insert_sql(
        spark, catalog,
        f"INSERT INTO {t.identifier} SELECT k, name, r FROM ins_src",
    )
    assert t.to_df(spark).count() == 4
    # OVERWRITE replaces the whole table in one CoW commit
    t = insert_sql(
        spark, catalog,
        f"INSERT OVERWRITE {t.identifier} SELECT k, name, r FROM ins_src",
    )
    assert t.metadata.current_snapshot().operation == "overwrite"
    assert [(r.k, r.name, r.r) for r in t.to_df(spark).collect()] == [(10, "x", 5)]
    # declared-type casting: a wider literal cannot poison the table
    t = insert_sql(spark, catalog, f"INSERT INTO {t.identifier} VALUES (4, 'd', 9)")
    assert t.to_df(spark).filter("k = 4").count() == 1


def test_create_table_as_select_partitioned(catalog, spark):
    spark.createDataFrame(
        [(i, f"n{i}", i % 3) for i in range(9)], "k long, name string, r long"
    ).createOrReplaceTempView("ctas_src")
    t = create_table_sql(
        spark, catalog,
        "CREATE TABLE m.ctas PARTITIONED BY (r) AS "
        "SELECT k, name, r FROM ctas_src WHERE k < 6",
    )
    assert t.to_df(spark).count() == 6
    assert t.metadata.partition_spec == ["r"]
    # partition pruning serves r=1 from its own files only
    pruned = t.to_df(spark, partition_filter={"r": 1})
    assert sorted(r.k for r in pruned.collect()) == [1, 4]


def test_insert_by_name_binding(catalog, spark):
    """r13: INSERT INTO t BY NAME binds the SELECT's output names to table
    columns — a reordered SELECT cannot transpose values; positional
    binding (the ANSI default) still transposes by design."""
    t = _seed(catalog, spark, "m.bn")
    spark.createDataFrame(
        [("byname", 77, 1)], "name string, k long, r long"
    ).createOrReplaceTempView("bn_src")
    t = execute_dml(
        spark, catalog,
        "INSERT INTO m.bn BY NAME SELECT name, k, r FROM bn_src",
    )
    got = {r.k: r.name for r in t.to_df(spark).collect()}
    assert got[77] == "byname"
    # missing select outputs fill NULL under BY NAME
    spark.createDataFrame([(88,)], "k long").createOrReplaceTempView("bn_k")
    t = execute_dml(spark, catalog, "INSERT INTO m.bn BY NAME SELECT k FROM bn_k")
    row = [r for r in t.to_df(spark).collect() if r.k == 88][0]
    assert row.name is None and row.r is None
    with pytest.raises(ValueError, match="unknown column"):
        execute_dml(
            spark, catalog,
            "INSERT INTO m.bn BY NAME SELECT k AS nope FROM bn_k",
        )
    with pytest.raises(ValueError, match="no column list"):
        execute_dml(
            spark, catalog,
            "INSERT INTO m.bn BY NAME (k) SELECT k FROM bn_k",
        )
    with pytest.raises(ValueError, match="requires a SELECT"):
        execute_dml(spark, catalog, "INSERT INTO m.bn BY NAME VALUES (1, 'x', 2)")
