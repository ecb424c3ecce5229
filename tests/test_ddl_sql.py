"""SQL DDL front-end (r13): ALTER TABLE schema/spec evolution and CALL
maintenance procedures as thin grammars over the certified Python APIs.
Parser pins, execution round-trips (rename keeps old file values, defaults
fill pre-column files, widening reads old narrow files), loud refusals
(narrowing cast, unknown column, positional CALL args)."""

from __future__ import annotations

import pytest

from iceberg_catalog_postgres_spark.catalog.catalog import (
    PostgresCatalog,
    TableIdentifier,
)
from iceberg_catalog_postgres_spark.catalog.ddl_sql import (
    alter_sql,
    call_sql,
    parse_alter,
    parse_call,
)
from iceberg_catalog_postgres_spark.catalog.merge_sql import execute_dml


@pytest.fixture
def catalog(tmp_path):
    cat = PostgresCatalog.connect("dsql", None, str(tmp_path / "wh"))
    cat.initialize()
    yield cat
    cat.backend.close()


def _seed(catalog, spark, name="d.t", ddl="k int, name string, r long", rows=None):
    rows = rows or [(i, f"n{i}", i % 3) for i in range(9)]
    df = spark.createDataFrame(rows, ddl)
    t = catalog.create_table(TableIdentifier.parse(name), df.schema)
    return t.new_transaction().append_dataframe(df.coalesce(1)).commit()


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


def test_parse_alter_forms():
    p = parse_alter("ALTER TABLE ns.t ADD COLUMN grade BIGINT DEFAULT 5")
    assert p["op"] == "add_columns"
    assert p["columns"][0][0] == "grade" and p["columns"][0][2] == 5
    p = parse_alter(
        "ALTER TABLE ns.t ADD COLUMNS (a INT, b STRING DEFAULT 'x')"
    )
    assert [(c[0], c[2]) for c in p["columns"]] == [("a", None), ("b", "x")]
    p = parse_alter("ALTER TABLE ns.t RENAME COLUMN a TO b")
    assert (p["op"], p["from"], p["to"]) == ("rename_column", "a", "b")
    p = parse_alter("ALTER TABLE ns.t ALTER COLUMN k TYPE BIGINT")
    assert p["op"] == "alter_column_type" and p["type"].simpleString() == "bigint"
    p = parse_alter("ALTER TABLE ns.t ALTER COLUMN k SET DATA TYPE DOUBLE")
    assert p["type"].simpleString() == "double"
    p = parse_alter("ALTER TABLE ns.t DROP COLUMN old")
    assert p["op"] == "drop_column" and p["column"] == "old"
    p = parse_alter("ALTER TABLE ns.t ADD PARTITION FIELD bucket(8, k)")
    assert p["entry"] == "bucket(8, k)"
    p = parse_alter("ALTER TABLE ns.t DROP PARTITION FIELD r")
    assert (p["op"], p["entry"]) == ("drop_partition_field", "r")
    with pytest.raises(ValueError, match="unsupported column type"):
        parse_alter("ALTER TABLE ns.t ADD COLUMN x BLOB")
    # SET TBLPROPERTIES graduated from refusal to a real action (r13
    # continuation — full coverage in tests/test_props_refs_sql.py)
    p = parse_alter("ALTER TABLE ns.t SET TBLPROPERTIES ('a'='b')")
    assert (p["op"], p["props"]) == ("set_properties", {"a": "b"})
    with pytest.raises(ValueError, match="unsupported action"):
        parse_alter("ALTER TABLE ns.t CLUSTER BY k")


def test_parse_call_forms():
    p = parse_call("CALL system.expire_snapshots('ns.t', keep_last => 3)")
    assert (p["proc"], p["target"], p["args"]) == (
        "expire_snapshots", "ns.t", {"keep_last": 3},
    )
    p = parse_call(
        "CALL compact_table('ns.t', target_partitions => 2, "
        "preserve_lineage => true)"
    )
    assert p["args"] == {"target_partitions": 2, "preserve_lineage": True}
    with pytest.raises(ValueError, match="unknown procedure"):
        parse_call("CALL system.do_magic('ns.t')")
    with pytest.raises(ValueError, match="must be named"):
        parse_call("CALL system.expire_snapshots('ns.t', 3)")
    with pytest.raises(ValueError, match="string literal"):
        parse_call("CALL system.expire_snapshots(42)")


# ---------------------------------------------------------------------------
# ALTER execution
# ---------------------------------------------------------------------------


def test_alter_add_default_rename_widen_roundtrip(catalog, spark):
    _seed(catalog, spark)
    t = execute_dml(
        spark, catalog, "ALTER TABLE d.t ADD COLUMN grade BIGINT DEFAULT 7"
    )
    t = execute_dml(spark, catalog, "ALTER TABLE d.t RENAME COLUMN name TO label")
    t = execute_dml(spark, catalog, "ALTER TABLE d.t ALTER COLUMN k TYPE BIGINT")
    # post-evolution append under the new schema
    extra = spark.createDataFrame(
        [(100, "new", 9, 1)], "k long, label string, r long, grade long"
    )
    t = t.new_transaction().append_dataframe(extra.coalesce(1)).commit()
    rows = execute_dml(
        spark, catalog, "SELECT k, label, grade FROM d.t ORDER BY k"
    ).collect()
    # pre-column files fill the default; pre-rename values survive
    assert (rows[0].k, rows[0].label, rows[0].grade) == (0, "n0", 7)
    assert (rows[-1].k, rows[-1].label, rows[-1].grade) == (100, "new", 1)
    assert dict((f.name, f.dataType.simpleString()) for f in t.schema.fields)[
        "k"
    ] == "bigint"


def test_alter_drop_column_and_partition_fields(catalog, spark):
    _seed(catalog, spark, "d.p")
    t = execute_dml(spark, catalog, "ALTER TABLE d.p ADD PARTITION FIELD r")
    assert t.metadata.partition_spec == ["r"]
    t = execute_dml(
        spark, catalog, "ALTER TABLE d.p ADD PARTITION FIELD truncate(4, k)"
    )
    assert t.metadata.partition_spec == ["r", "truncate(4, k)"]
    t = execute_dml(spark, catalog, "ALTER TABLE d.p DROP PARTITION FIELD r")
    assert t.metadata.partition_spec == ["truncate(4, k)"]
    t = execute_dml(spark, catalog, "ALTER TABLE d.p DROP COLUMN name")
    assert [f.name for f in t.schema.fields] == ["k", "r"]
    assert execute_dml(
        spark, catalog, "SELECT count(*) AS n FROM d.p"
    ).first().n == 9


def test_alter_refusals(catalog, spark):
    _seed(catalog, spark, "d.r", ddl="k long, name string, r long")
    with pytest.raises(ValueError, match="incompatible type change"):
        alter_sql(spark, catalog, "ALTER TABLE d.r ALTER COLUMN k TYPE INT")
    with pytest.raises(ValueError, match="unknown column"):
        alter_sql(spark, catalog, "ALTER TABLE d.r RENAME COLUMN zzz TO a")
    with pytest.raises(ValueError, match="column exists"):
        alter_sql(spark, catalog, "ALTER TABLE d.r ADD COLUMN k INT")
    with pytest.raises(ValueError, match="target name exists"):
        alter_sql(spark, catalog, "ALTER TABLE d.r RENAME COLUMN k TO name")
    with pytest.raises(ValueError, match="not in spec"):
        alter_sql(spark, catalog, "ALTER TABLE d.r DROP PARTITION FIELD r")


# ---------------------------------------------------------------------------
# CALL execution
# ---------------------------------------------------------------------------


def test_call_small_files_then_expire(catalog, spark):
    df = spark.createDataFrame([(i, f"x{i}") for i in range(20)], "k long, v string")
    t = catalog.create_table(TableIdentifier.parse("d.m"), df.schema)
    for i in range(4):
        t = (
            t.new_transaction()
            .append_dataframe(df.filter(f"k % 4 = {i}").coalesce(1))
            .commit()
        )
    rep = call_sql(
        spark, catalog, "CALL system.rewrite_small_files('d.m', target_rows => 100)"
    ).first()
    assert (rep.rewritten_data_files_count, rep.added_data_files_count) == (4, 1)
    rep = call_sql(
        spark, catalog, "CALL system.expire_snapshots('d.m', keep_last => 2)"
    ).first()
    assert (rep.snapshots_before, rep.snapshots_after) == (5, 2)
    assert execute_dml(
        spark, catalog, "SELECT count(*) AS n FROM d.m"
    ).first().n == 20


def test_call_pos_deletes_to_dvs_and_vacuum(catalog, spark):
    df = spark.createDataFrame([(i, f"x{i}") for i in range(12)], "k long, v string")
    t = catalog.create_table(TableIdentifier.parse("d.v"), df.schema)
    t = t.new_transaction().append_dataframe(df.coalesce(1)).commit()
    execute_dml(spark, catalog, "DELETE FROM d.v WHERE k = 3", as_dv=False)
    rep = call_sql(
        spark, catalog, "CALL system.rewrite_position_deletes_to_dvs('d.v')"
    ).first()
    assert (rep.pos_delete_files_before, rep.pos_delete_files_after,
            rep.deletion_vectors) == (1, 0, 1)
    rep = call_sql(
        spark, catalog, "CALL system.vacuum('d.v', keep_last_snapshots => 2)"
    ).first()
    assert rep.snapshots_after <= 2
    rows = execute_dml(
        spark, catalog, "SELECT k FROM d.v ORDER BY k"
    ).collect()
    assert [r.k for r in rows] == [i for i in range(12) if i != 3]


# ---------------------------------------------------------------------------
# lifecycle: CREATE (column DDL) / SHOW / DESCRIBE / DROP
# ---------------------------------------------------------------------------


def test_create_show_describe_drop_lifecycle(catalog, spark):
    t = execute_dml(
        spark, catalog,
        "CREATE TABLE d.life (k BIGINT, name STRING, r INT) "
        "PARTITIONED BY (r)",
    )
    assert [f.name for f in t.schema.fields] == ["k", "name", "r"]
    assert t.metadata.partition_spec == ["r"]
    assert t.metadata.current_snapshot() is None  # empty table
    # IF NOT EXISTS returns the existing table instead of raising
    t2 = execute_dml(
        spark, catalog, "CREATE TABLE IF NOT EXISTS d.life (x INT)"
    )
    assert [f.name for f in t2.schema.fields] == ["k", "name", "r"]
    execute_dml(spark, catalog, "CREATE TABLE d.other (a INT)")
    shown = execute_dml(spark, catalog, "SHOW TABLES IN d").collect()
    assert [(r.namespace, r.table_name) for r in shown] == [
        ("d", "life"), ("d", "other"),
    ]
    desc = execute_dml(spark, catalog, "DESCRIBE TABLE d.life").collect()
    cols = [(r.col_name, r.data_type) for r in desc if r.col_name]
    assert cols == [("k", "bigint"), ("name", "string"), ("r", "int")]
    assert [r.partition_entry for r in desc if r.partition_entry] == ["r"]
    # the empty table still SELECTs (declared schema, zero rows)
    assert execute_dml(
        spark, catalog, "SELECT count(*) AS n FROM d.life"
    ).first().n == 0
    execute_dml(spark, catalog, "DROP TABLE d.other")
    shown = execute_dml(spark, catalog, "SHOW TABLES IN d").collect()
    assert [r.table_name for r in shown] == ["life"]
    # IF EXISTS swallows the missing case; bare DROP raises
    execute_dml(spark, catalog, "DROP TABLE IF EXISTS d.other")
    with pytest.raises(Exception):
        execute_dml(spark, catalog, "DROP TABLE d.other")
    with pytest.raises(ValueError, match="column list OR AS SELECT"):
        execute_dml(
            spark, catalog,
            "CREATE TABLE d.bad (k INT) AS SELECT 1 AS k",
        )


def test_review_r13_partition_entry_spelling_canonicalized(catalog, spark):
    """Self-review: the SQL path renders 'bucket(8, k)' with a space while
    the Python API writes 'bucket(8,k)' — membership checks canonicalize,
    so DROP matches either spelling and ADD refuses the duplicate."""
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    t = catalog.create_table(
        TableIdentifier.parse("d.sp"), df.schema, partition_by=["bucket(8,k)"]
    )
    with pytest.raises(ValueError, match="already in spec"):
        alter_sql(spark, catalog, "ALTER TABLE d.sp ADD PARTITION FIELD bucket(8, k)")
    t = alter_sql(spark, catalog, "ALTER TABLE d.sp DROP PARTITION FIELD bucket(8, k)")
    assert t.metadata.partition_spec == []


def test_review_r13_call_refuses_unknown_argument(catalog, spark):
    with pytest.raises(ValueError, match="unknown argument"):
        parse_call(
            "CALL system.expire_snapshots('d.t', keep_last_snapshots => 10)"
        )


def test_call_rewrite_manifests(catalog, spark, monkeypatch):
    """r16: Iceberg's manifest-compaction procedure through SQL — a
    delta-chunk chain consolidates into clustered bounded chunks; the
    report returns before/after counts; a second call is a stable
    no-op; reads unchanged."""
    from iceberg_catalog_postgres_spark.catalog import metadata as md_mod

    monkeypatch.setattr(md_mod, "MANIFEST_THRESHOLD", 2)
    df_schema = "k long, v string"
    t = catalog.create_table(
        TableIdentifier.parse("d.rm"),
        spark.createDataFrame([], df_schema).schema,
    )
    for i in range(7):
        t = t.new_transaction().append_dataframe(
            spark.createDataFrame([(i, f"x{i}")], df_schema).coalesce(1)
        ).commit()
    assert len(t.metadata.current_snapshot().manifests) > 3
    rep = call_sql(
        spark, catalog,
        "CALL system.rewrite_manifests('d.rm', max_chunks => 3)",
    ).first()
    assert rep.manifest_chunks_before > 3 and rep.manifest_chunks_after == 1
    rep2 = call_sql(
        spark, catalog,
        "CALL system.rewrite_manifests('d.rm', max_chunks => 3)",
    ).first()
    assert (rep2.manifest_chunks_before, rep2.manifest_chunks_after) == (1, 1)
    rows = execute_dml(spark, catalog, "SELECT k FROM d.rm ORDER BY k").collect()
    assert [r.k for r in rows] == list(range(7))
    # target_entries forces a bounded multi-chunk layout
    rep3 = call_sql(
        spark, catalog,
        "CALL system.rewrite_manifests('d.rm', max_chunks => 1, "
        "target_entries => 3)",
    ).first()
    # 7 entries / target 3 -> 3 chunks (balanced), each <= 3 entries
    assert rep3.manifest_chunks_after == 3
    t2 = catalog.load_table(TableIdentifier.parse("d.rm"))
    refs = t2.metadata.current_snapshot().chunk_refs()
    assert all(sum(c["summary"]["counts"].values()) <= 3 for c in refs)


def test_call_rollback_timestamp_and_set_current_snapshot(catalog, spark):
    """r16: the remaining Iceberg snapshot-management procedures.
    rollback_to_timestamp resolves the snapshot current AS OF the given
    time; rollback_* refuse non-ancestor targets (Iceberg's rule) while
    set_current_snapshot points head anywhere retained — including
    forward again, restoring a rolled-past commit."""
    df_schema = "k long, v string"
    t = catalog.create_table(
        TableIdentifier.parse("d.rb"),
        spark.createDataFrame([], df_schema).schema,
    )
    snaps = []
    for i in range(3):
        t = t.new_transaction().append_dataframe(
            spark.createDataFrame([(i, f"x{i}")], df_schema).coalesce(1)
        ).commit()
        snaps.append(t.metadata.current_snapshot())
    mid_ts = snaps[1].timestamp_ms
    rep = call_sql(
        spark, catalog,
        f"CALL system.rollback_to_timestamp('d.rb', timestamp_ms => {mid_ts})",
    ).first()
    assert rep.current_snapshot_id == snaps[1].snapshot_id
    rows = execute_dml(spark, catalog, "SELECT k FROM d.rb ORDER BY k").collect()
    assert [r.k for r in rows] == [0, 1]
    # rolling FORWARD via rollback_* refuses — not an ancestor
    with pytest.raises(ValueError, match="set_current_snapshot"):
        call_sql(
            spark, catalog,
            f"CALL system.rollback_to_snapshot('d.rb', "
            f"snapshot_id => {snaps[2].snapshot_id})",
        )
    # set_current_snapshot restores the abandoned head
    rep = call_sql(
        spark, catalog,
        f"CALL system.set_current_snapshot('d.rb', "
        f"snapshot_id => {snaps[2].snapshot_id})",
    ).first()
    assert rep.current_snapshot_id == snaps[2].snapshot_id
    rows = execute_dml(spark, catalog, "SELECT k FROM d.rb ORDER BY k").collect()
    assert [r.k for r in rows] == [0, 1, 2]
    # a timestamp BEFORE every snapshot refuses cleanly
    with pytest.raises(ValueError, match="no ancestor snapshot"):
        call_sql(
            spark, catalog,
            f"CALL system.rollback_to_timestamp('d.rb', "
            f"timestamp_ms => {snaps[0].timestamp_ms - 10_000})",
        )


def test_alter_write_ordered_by(catalog, spark):
    """r16: Iceberg's write-order DDL. Declaring WRITE ORDERED BY makes
    every later plain append range-distribute on the columns — files
    cover disjoint key slices, so manifest-bounds planning goes from
    all-files to one file; WRITE UNORDERED restores plain writes. The
    order is registered in the metadata document's sort-orders."""
    import json

    df_schema = "k long, v string"
    t = catalog.create_table(
        TableIdentifier.parse("d.wo"),
        spark.createDataFrame([], df_schema).schema,
    )
    t = execute_dml(spark, catalog, "ALTER TABLE d.wo WRITE ORDERED BY (k)")
    doc = json.loads(
        catalog.object_store().get(t.metadata_location()).decode()
    )
    assert doc["default-sort-order-id"] == 1
    assert doc["sort-orders"][1]["fields"][0]["transform"] == "identity"
    # a PLAIN append (no sort_by) now range-distributes on k
    rows = [(k, f"v{k}") for k in range(400)]
    import random as _r

    _r.Random(7).shuffle(rows)
    df = spark.createDataFrame(rows, df_schema).repartition(8)
    t = t.new_transaction().append_dataframe(df, n_files=4).commit()
    snap = t.metadata.current_snapshot()
    files = snap.data_files
    assert len(files) >= 3
    from iceberg_catalog_postgres_spark.catalog.metadata import decode_bound

    ivs = sorted(
        (decode_bound(snap.file_stats[f]["bounds"]["k"][0]),
         decode_bound(snap.file_stats[f]["bounds"]["k"][1]))
        for f in files
    )
    assert all(a[1] < b[0] for a, b in zip(ivs, ivs[1:])), ivs  # disjoint
    # bounds planning: a point k plans exactly one file
    assert len(t.planned_files("k", 7, 7, require_stats=True)) == 1
    rows_back = sorted(r.k for r in t.to_df(spark).collect())
    assert rows_back == list(range(400))
    # UNORDERED restores plain writes and resets the default order
    t = execute_dml(spark, catalog, "ALTER TABLE d.wo WRITE UNORDERED")
    assert t.metadata.default_sort_order_id == 0
    assert t.metadata.default_sort_columns() == []
    # DESC refuses with guidance
    with pytest.raises(ValueError, match="ASC NULLS FIRST"):
        execute_dml(
            spark, catalog, "ALTER TABLE d.wo WRITE ORDERED BY (k DESC)"
        )


def test_show_create_table_round_trips(catalog, spark):
    """r16: SHOW CREATE TABLE emits reconstructible DDL — executing the
    emitted statements against a fresh namespace yields a table with the
    same columns, partition spec, write order, and user properties."""
    from iceberg_catalog_postgres_spark.catalog.ddl_sql import (
        show_tables_sql,
    )

    execute_dml(
        spark, catalog,
        "CREATE TABLE d.sc (k BIGINT, name STRING, ts TIMESTAMP_NTZ, "
        "r INT) PARTITIONED BY (r, day(ts))",
    )
    execute_dml(spark, catalog, "ALTER TABLE d.sc WRITE ORDERED BY (k)")
    execute_dml(
        spark, catalog,
        "ALTER TABLE d.sc SET TBLPROPERTIES ('owner' = 'pipeline')",
    )
    stmts = [
        r.statement
        for r in show_tables_sql(
            spark, catalog, "SHOW CREATE TABLE d.sc"
        ).orderBy("stmt_order").collect()
    ]
    assert stmts[0].startswith("CREATE TABLE d.sc (")
    assert "PARTITIONED BY (r, day(ts))" in stmts[0]
    assert any("WRITE ORDERED BY (k)" in s for s in stmts[1:])
    assert any("'owner' = 'pipeline'" in s for s in stmts[1:])
    # round trip into a sibling table name
    for s in stmts:
        execute_dml(spark, catalog, s.replace("d.sc", "d.sc2"))
    t1 = catalog.load_table(TableIdentifier.parse("d.sc"))
    t2 = catalog.load_table(TableIdentifier.parse("d.sc2"))
    assert t2.schema == t1.schema
    assert t2.metadata.partition_spec == t1.metadata.partition_spec
    assert t2.metadata.default_sort_columns() == ["k"]
    assert t2.metadata.properties.get("owner") == "pipeline"


def test_r16_review_fixes_ddl(catalog, spark):
    """Round-16 self-review regressions: (1) rollback_to_timestamp
    resolves among ANCESTORS (a prior rollback must not make it pick the
    abandoned head and refuse); (2) naive ISO timestamps read as UTC —
    the same rule as FOR SYSTEM_TIME AS OF; (3) PARTITIONED BY refuses
    trailing tokens instead of silently dropping them; (4) SHOW CREATE
    escapes quotes in property values and DECIMAL columns round-trip."""
    import datetime as dt

    from iceberg_catalog_postgres_spark.catalog.ddl_sql import (
        show_tables_sql,
    )

    df_schema = "k long, v string"
    t = catalog.create_table(
        TableIdentifier.parse("d.rr"),
        spark.createDataFrame([], df_schema).schema,
    )
    snaps = []
    for i in range(3):
        t = t.new_transaction().append_dataframe(
            spark.createDataFrame([(i, "x")], df_schema).coalesce(1)
        ).commit()
        snaps.append(t.metadata.current_snapshot())
    # roll back to s0, then rollback_to_timestamp(now): the latest
    # ANCESTOR is s0 itself — pre-fix snapshot_as_of picked abandoned s2
    # and the ancestor guard made the procedure unusable
    call_sql(
        spark, catalog,
        f"CALL system.rollback_to_snapshot('d.rr', "
        f"snapshot_id => {snaps[0].snapshot_id})",
    )
    rep = call_sql(
        spark, catalog,
        f"CALL system.rollback_to_timestamp('d.rr', "
        f"timestamp_ms => {snaps[2].timestamp_ms + 1000})",
    ).first()
    assert rep.current_snapshot_id == snaps[0].snapshot_id
    # naive ISO string == UTC: resolve s0 by its own UTC wall-clock
    iso = dt.datetime.fromtimestamp(
        snaps[0].timestamp_ms / 1000.0, dt.timezone.utc
    ).replace(tzinfo=None).isoformat()
    rep = call_sql(
        spark, catalog,
        f"CALL system.rollback_to_timestamp('d.rr', timestamp => '{iso}')",
    ).first()
    assert rep.current_snapshot_id == snaps[0].snapshot_id
    # (3) trailing tokens refuse loudly
    with pytest.raises(ValueError, match="trailing tokens"):
        execute_dml(
            spark, catalog,
            "CREATE TABLE d.bad (k BIGINT, r INT) PARTITIONED BY (r ASC)",
        )
    # (4) quote escaping + DECIMAL round-trip
    execute_dml(
        spark, catalog,
        "CREATE TABLE d.qq (k BIGINT, p DECIMAL(10, 2))",
    )
    execute_dml(
        spark, catalog,
        "ALTER TABLE d.qq SET TBLPROPERTIES ('comment' = 'it''s big')",
    )
    # decimals WRITE and read back (pyarrow cannot decode fixed-len
    # decimal footer stats — the stats collector must poison the bound,
    # not crash the commit)
    execute_dml(spark, catalog, "INSERT INTO d.qq VALUES (1, 12.34)")
    got = execute_dml(spark, catalog, "SELECT k, p FROM d.qq").collect()
    assert [(r.k, str(r.p)) for r in got] == [(1, "12.34")]
    t = catalog.load_table(TableIdentifier.parse("d.qq"))
    assert t.metadata.properties["comment"] == "it's big"
    assert t.schema["p"].dataType.simpleString() == "decimal(10,2)"
    stmts = [
        r.statement
        for r in show_tables_sql(spark, catalog, "SHOW CREATE TABLE d.qq")
        .orderBy("stmt_order").collect()
    ]
    assert "p decimal(10,2)" in stmts[0]
    assert any("'it''s big'" in s for s in stmts[1:])
    for s in stmts:
        execute_dml(spark, catalog, s.replace("d.qq", "d.qq2"))
    t2 = catalog.load_table(TableIdentifier.parse("d.qq2"))
    assert t2.schema == t.schema
    assert t2.metadata.properties["comment"] == "it's big"


def test_add_files_skips_non_hive_subtrees(catalog, spark):
    """r16 review fix: a non-hive subdirectory (an `archive/` tree next
    to the data) is IGNORED like the pre-r16 top-level glob, not a hard
    error; mixing flat and hive files still refuses."""
    from iceberg_catalog_postgres_spark.catalog import maintenance as m

    store = catalog.object_store()
    base = store.resolve("ext/mixed")
    spark.createDataFrame([(1, "a")], "k long, v string").coalesce(1) \
        .write.mode("overwrite").parquet(base)
    spark.createDataFrame([(9, "z")], "k long, v string").coalesce(1) \
        .write.mode("overwrite").parquet(f"{base}/archive/old")
    import glob as g
    import os as o

    for extra in g.glob(f"{base}/**/_SUCCESS", recursive=True):
        o.remove(extra)
    t = catalog.create_table(
        TableIdentifier.parse("d.mx"),
        spark.createDataFrame([], "k long, v string").schema,
    )
    t2, n_files, n_records = m.add_files(spark, t, "ext/mixed")
    assert (n_files, n_records) == (1, 1)  # archive/ ignored
    assert [r.k for r in t2.to_df(spark).collect()] == [1]


def test_describe_extended_and_streaming_write_order(catalog, spark, tmp_path):
    """r16: DESCRIBE EXTENDED appends machine-readable detail rows
    (location, snapshot, declared write order, user properties); and the
    declared write order composes with the STREAMING sink — every
    micro-batch append range-distributes without the stream author
    passing sort_by, so per-batch files carry disjoint key slices."""
    from iceberg_catalog_postgres_spark.catalog.ddl_sql import describe_sql

    execute_dml(
        spark, catalog, "CREATE TABLE d.dx (k BIGINT, v STRING)"
    )
    execute_dml(spark, catalog, "ALTER TABLE d.dx WRITE ORDERED BY (k)")
    execute_dml(
        spark, catalog,
        "ALTER TABLE d.dx SET TBLPROPERTIES ('owner' = 'pipeline')",
    )
    execute_dml(spark, catalog, "INSERT INTO d.dx VALUES (1, 'a')")
    rows = {r.col_name: r.data_type for r in describe_sql(
        spark, catalog, "DESCRIBE EXTENDED d.dx"
    ).collect() if r.col_name}
    assert rows["# write-order"] == "k"
    assert rows["# property owner"] == "pipeline"
    assert rows["# current-data-files"] == "1"
    assert rows["# format-version"] and rows["# location"]
    assert "k" in rows  # schema rows still present
    # plain DESCRIBE stays unchanged (no detail rows)
    plain = [r.col_name for r in describe_sql(
        spark, catalog, "DESCRIBE d.dx"
    ).collect() if r.col_name and r.col_name.startswith("#")]
    assert plain == []
    # streaming sink inherits the order: one micro-batch of shuffled keys
    # lands as range-distributed files with disjoint bounds
    import random as _r

    from iceberg_catalog_postgres_spark.catalog.metadata import decode_bound

    t = catalog.load_table(TableIdentifier.parse("d.dx"))
    ks = list(range(100, 400))
    _r.Random(3).shuffle(ks)
    batch = spark.createDataFrame(
        [(k, f"v{k}") for k in ks], "k long, v string"
    ).repartition(6)
    t = t.new_transaction().append_dataframe(batch, n_files=3).commit()
    snap = t.metadata.current_snapshot()
    new_files = [f for f in snap.data_files if snap.file_seqs[f] == snap.sequence_number]
    ivs = sorted(
        (decode_bound(snap.file_stats[f]["bounds"]["k"][0]),
         decode_bound(snap.file_stats[f]["bounds"]["k"][1]))
        for f in new_files
    )
    assert len(ivs) >= 2
    assert all(a[1] < b[0] for a, b in zip(ivs, ivs[1:])), ivs
