"""Full multi-clause MERGE (``merge_into``): decision-table semantics,
clause ordering, cardinality guard, lineage composition, and changelog
reconstruction. The copy-on-write commit rides the reference's CAS
transaction model (mod.rs:296-347); both catalog backends run the core
decision-table test."""

from __future__ import annotations

from tests.conftest import soak_only

import pytest
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.catalog.catalog import (
    PostgresCatalog,
    TableIdentifier,
)
from iceberg_catalog_postgres_spark.catalog.maintenance import merge_into


@pytest.fixture(params=["sqlite", "postgres"])
def catalog(request, tmp_path):
    if request.param == "postgres":
        import uuid as _uuid

        url = request.getfixturevalue("pg_url")
        cat = PostgresCatalog.connect(
            f"mrg_{_uuid.uuid4().hex[:10]}", url, str(tmp_path / "wh")
        )
    else:
        cat = PostgresCatalog.connect("mrg_catalog", None, str(tmp_path / "wh"))
    cat.initialize()
    yield cat
    cat.backend.close()


@pytest.fixture
def sqlite_catalog(tmp_path):
    cat = PostgresCatalog.connect("mrg_sqlite", None, str(tmp_path / "wh2"))
    cat.initialize()
    yield cat
    cat.backend.close()


def _seed(catalog, spark, name="m.t", rows=None):
    rows = rows or [(i, f"n{i}", i % 3) for i in range(9)]
    df = spark.createDataFrame(rows, "k long, name string, r long")
    t = catalog.create_table(TableIdentifier.parse(name), df.schema)
    return t.new_transaction().append_dataframe(df.coalesce(2)).commit()


def test_merge_into_full_decision_table(catalog, spark):
    """All five clause kinds in one commit, against both backends.

    target: k 0..8, r = k%3.  source: k in {0,1,2,3, 20,21}.
    - matched & r=0 (k 0,3)  -> DELETE
    - matched otherwise (1,2)-> UPDATE name = s.name
    - not matched (20,21)    -> INSERT
    - NMBS & r=1 (4,7)       -> UPDATE name = upper(t.name)
    - NMBS & r=2 (5,8)       -> DELETE
    - NMBS & r=0 (6)         -> no clause, kept unchanged
    """
    t = _seed(catalog, spark)
    src = spark.createDataFrame(
        [(0, "x0", 9), (1, "x1", 9), (2, "x2", 9), (3, "x3", 9),
         (20, "new20", 7), (21, "new21", 7)],
        "k long, name string, r long",
    )
    t = merge_into(
        spark, t, src, on=["k"],
        when_matched=[
            {"action": "delete", "condition": "t.r = 0"},
            {"action": "update", "set": {"name": "s.name"}},
        ],
        when_not_matched=[{"action": "insert"}],
        when_not_matched_by_source=[
            {"action": "update", "condition": "t.r = 1",
             "set": {"name": "upper(t.name)"}},
            {"action": "delete", "condition": "t.r = 2"},
        ],
    )
    got = {(r.k, r.name, r.r) for r in t.to_df(spark).collect()}
    assert got == {
        (1, "x1", 1), (2, "x2", 2),          # matched updates (r kept: set only name)
        (20, "new20", 7), (21, "new21", 7),  # inserts
        (4, "N4", 1), (7, "N7", 1),          # NMBS updates
        (6, "n6", 0),                        # no clause -> unchanged
    }


def test_merge_clause_order_first_wins(sqlite_catalog, spark):
    """Two overlapping matched clauses: the FIRST applicable one fires."""
    t = _seed(sqlite_catalog, spark, "m.o")
    src = spark.createDataFrame([(1, "a", 0), (2, "b", 0)], "k long, name string, r long")
    t = merge_into(
        spark, t, src, on=["k"],
        when_matched=[
            {"action": "update", "condition": "t.k = 1", "set": {"name": "'first'"}},
            {"action": "update", "set": {"name": "'second'"}},
        ],
    )
    got = {r.k: r.name for r in t.to_df(spark).collect()}
    assert got[1] == "first" and got[2] == "second"
    # no not-matched clause: source key absent from target is NOT inserted
    assert set(got) == set(range(9))


def test_merge_set_all_and_insert_values(sqlite_catalog, spark):
    t = _seed(sqlite_catalog, spark, "m.sa")
    src = spark.createDataFrame([(1, "S1", 77), (30, "S30", 88)], "k long, name string, r long")
    t = merge_into(
        spark, t, src, on=["k"],
        when_matched=[{"action": "update", "set": "all"}],
        when_not_matched=[
            {"action": "insert", "values": {"name": "concat(s.name, '!')"}}
        ],
    )
    got = {r.k: (r.name, r.r) for r in t.to_df(spark).collect()}
    assert got[1] == ("S1", 77)            # set all: every shared column
    assert got[30] == ("S30!", 88)         # values override + default s.r


def test_merge_cardinality_guard(sqlite_catalog, spark):
    t = _seed(sqlite_catalog, spark, "m.cg")
    dup = spark.createDataFrame(
        [(1, "a", 0), (1, "b", 0), (50, "c", 0), (50, "d", 0)],
        "k long, name string, r long",
    )
    with pytest.raises(ValueError, match="cardinality"):
        merge_into(
            spark, t, dup, on=["k"],
            when_matched=[{"action": "update", "set": "all"}],
        )
    # duplicate keys that DON'T match any target row are legal (both insert)
    ins_only = dup.where(F.col("k") == 50)
    t = merge_into(
        spark, t, ins_only, on=["k"],
        when_matched=[{"action": "update", "set": "all"}],
        when_not_matched=[{"action": "insert"}],
    )
    assert [r.k for r in t.to_df(spark).where("k = 50").collect()] == [50, 50]


def test_merge_type_cast_to_declared_schema(sqlite_catalog, spark):
    """Source columns wider than the table's declared types are cast back
    before the write — the int-widening parquet trap."""
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    schema = StructType(
        [StructField("k", IntegerType()), StructField("name", StringType())]
    )
    df = spark.createDataFrame([(1, "a"), (2, "b")], schema)
    t = sqlite_catalog.create_table(TableIdentifier.parse("m.ty"), schema)
    t = t.new_transaction().append_dataframe(df).commit()
    src = spark.createDataFrame([(1, "A"), (9, "I")], "k long, name string")
    t = merge_into(
        spark, t, src, on=["k"],
        when_matched=[{"action": "update", "set": "all"}],
        when_not_matched=[{"action": "insert"}],
    )
    out = t.to_df(spark)
    assert dict(out.dtypes)["k"] == "int"
    assert {r.k: r.name for r in out.collect()} == {1: "A", 2: "b", 9: "I"}


def test_merge_lineage_ids_and_changelog_pairs(sqlite_catalog, spark):
    """preserve_lineage: updated rows keep their _row_id, inserts get fresh
    ids, and changelog_df reconstructs the merge as update_before/update_after
    pairs + exact deletes + inserts — for BOTH delete flavors (matched and
    not-matched-by-source)."""
    t = _seed(sqlite_catalog, spark, "m.ln")
    base_snap = t.metadata.current_snapshot_id
    ids_before = {
        r.k: r._row_id for r in t.to_df(spark, with_row_lineage=True).collect()
    }
    src = spark.createDataFrame(
        [(1, "u1", 9), (3, "u3", 9), (40, "ins", 5)],
        "k long, name string, r long",
    )
    t = merge_into(
        spark, t, src, on=["k"],
        when_matched=[
            {"action": "delete", "condition": "t.k = 3"},
            {"action": "update", "set": {"name": "s.name"}},
        ],
        when_not_matched=[{"action": "insert"}],
        when_not_matched_by_source=[
            {"action": "delete", "condition": "t.k = 8"},
        ],
        preserve_lineage=True,
    )
    assert t.metadata.current_snapshot().summary.get("lineage-diff") == "true"
    after = {
        r.k: r._row_id for r in t.to_df(spark, with_row_lineage=True).collect()
    }
    # kept + updated rows ride their old identity; the insert got a fresh id
    for k in (0, 1, 2, 4, 5, 6, 7):
        assert after[k] == ids_before[k], f"row {k} lost its _row_id"
    assert after[40] not in set(ids_before.values())

    ch = t.changelog_df(spark, base_snap)
    by_kind = {
        kind: sorted(r.k for r in rows)
        for kind, rows in (
            (k, [r for r in ch.collect() if r._change_type == k])
            for k in ("insert", "delete", "update_before", "update_after")
        )
    }
    assert by_kind["update_before"] == [1] and by_kind["update_after"] == [1]
    assert by_kind["delete"] == [3, 8]
    assert by_kind["insert"] == [40]
    # the pair carries old AND new values
    ub = next(r for r in ch.collect() if r._change_type == "update_before")
    ua = next(r for r in ch.collect() if r._change_type == "update_after")
    assert ub.name == "n1" and ua.name == "u1"


def test_merge_no_clauses_is_noop(sqlite_catalog, spark):
    t = _seed(sqlite_catalog, spark, "m.np")
    n_snaps = len(t.metadata.snapshots)
    src = spark.createDataFrame([(1, "x", 0)], "k long, name string, r long")
    t2 = merge_into(spark, t, src, on=["k"])
    assert len(t2.metadata.snapshots) == n_snaps


def test_merge_validates_clauses(sqlite_catalog, spark):
    t = _seed(sqlite_catalog, spark, "m.vd")
    src = spark.createDataFrame([(1, "x", 0)], "k long, name string, r long")
    with pytest.raises(ValueError, match="not in"):
        merge_into(spark, t, src, on=["k"], when_matched=[{"action": "insert"}])
    with pytest.raises(ValueError, match="requires a `set`"):
        merge_into(spark, t, src, on=["k"], when_matched=[{"action": "update"}])
    with pytest.raises(ValueError, match="key columns in `on`"):
        merge_into(spark, t, src, on=[])


def test_merge_mor_matches_cow_and_rewrites_nothing(sqlite_catalog, spark):
    """The MOR row-delta merge produces the SAME final table as the CoW
    merge for the same clauses — but in one rowdelta commit that carries
    every base file byte-identical and appends only the changed rows."""
    clauses = dict(
        when_matched=[
            {"action": "delete", "condition": "t.r = 0"},
            {"action": "update", "set": {"name": "s.name"}},
        ],
        when_not_matched=[{"action": "insert"}],
        when_not_matched_by_source=[
            {"action": "update", "condition": "t.r = 1",
             "set": {"name": "upper(t.name)"}},
            {"action": "delete", "condition": "t.r = 2"},
        ],
    )
    src = spark.createDataFrame(
        [(0, "x0", 9), (1, "x1", 9), (2, "x2", 9), (20, "new20", 7)],
        "k long, name string, r long",
    )
    t_cow = _seed(sqlite_catalog, spark, "m.cw")
    t_mor = _seed(sqlite_catalog, spark, "m.mr")
    base_files = set(t_mor.metadata.current_data_files())

    t_cow = merge_into(spark, t_cow, src, on=["k"], **clauses)
    t_mor = merge_into(spark, t_mor, src, on=["k"], strategy="mor", **clauses)

    rows = lambda t: sorted(  # noqa: E731
        (r.k, r.name, r.r) for r in t.to_df(spark).collect()
    )
    assert rows(t_mor) == rows(t_cow)
    snap = t_mor.metadata.current_snapshot()
    assert snap.operation == "rowdelta"
    assert base_files <= set(snap.data_files), "MOR merge rewrote base files"
    assert snap.deletion_vectors, "MOR merge produced no deletion vectors"
    # appended files hold ONLY the changed rows: updates (2 matched + 2
    # NMBS) + 1 insert = 5 rows
    new_files = [f for f in snap.data_files if f not in base_files]
    added = sum(
        snap.file_stats[f]["record_count"] for f in new_files
    )
    assert added == 5, f"row delta appended {added} rows, want 5"


def test_merge_mor_lineage_and_changelog_pairs(sqlite_catalog, spark):
    """preserve_lineage MOR merge: updated rows keep their _row_id through
    the row delta, and both the batch changelog AND the CDC stream readers
    reconstruct the same update pairs across the rowdelta snapshot."""
    import os

    db = os.path.join(
        os.path.dirname(sqlite_catalog.object_store().resolve("")), "mor_cdc.db"
    )
    from iceberg_catalog_postgres_spark.catalog.catalog import PostgresCatalog

    wh = sqlite_catalog.object_store().resolve("") + "_morcdc"
    cat = PostgresCatalog.connect("morcdc", f"sqlite://{db}", wh)
    cat.initialize()
    rows = [(i, f"n{i}", i % 3) for i in range(9)]
    src0 = spark.createDataFrame(
        rows, "n_nationkey long, n_name string, n_regionkey long"
    )
    t = cat.create_table(TableIdentifier.parse("morcdc.nation"), src0.schema)
    t = t.new_transaction().append_dataframe(src0.coalesce(2)).commit()
    base_snap = t.metadata.current_snapshot_id
    ids_before = {
        r.n_nationkey: r._row_id
        for r in t.to_df(spark, with_row_lineage=True).collect()
    }
    msrc = spark.createDataFrame(
        [(1, "u1", 9), (2, "any", 9), (40, "ins", 4)],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    t = merge_into(
        spark, t, msrc, on=["n_nationkey"],
        when_matched=[
            {"action": "delete", "condition": "t.n_nationkey = 2"},
            {"action": "update", "set": {"n_name": "s.n_name"}},
        ],
        when_not_matched=[{"action": "insert"}],
        preserve_lineage=True,
        strategy="mor",
    )
    after = {
        r.n_nationkey: r._row_id
        for r in t.to_df(spark, with_row_lineage=True).collect()
    }
    assert after[1] == ids_before[1], "updated row lost identity through MOR"
    for k in (0, 3, 4, 5, 6, 7, 8):
        assert after[k] == ids_before[k]
    assert after[40] not in set(ids_before.values())

    expect = {
        ("update_before", 1, "n1"), ("update_after", 1, "u1"),
        ("delete", 2, "n2"), ("insert", 40, "ins"),
    }
    batch = {
        (r._change_type, r.n_nationkey, r.n_name)
        for r in t.changelog_df(spark, base_snap).collect()
    }
    assert batch == expect

    from iceberg_catalog_postgres_spark.sources.catalog_datasource import (
        CatalogChangelogParallelStreamReader,
        CatalogChangelogStreamReader,
    )

    opts = {"db": db, "warehouse": wh, "ident": "morcdc.nation", "catalog": "morcdc"}
    reader = CatalogChangelogStreamReader(dict(opts))
    srows, end = reader.read(reader.initialOffset())
    assert end["n_snapshots"] == 2
    assert {(r[3], r[0], r[1]) for r in srows if r[4] == 2} == expect

    preader = CatalogChangelogParallelStreamReader(dict(opts))
    parts = preader.partitions({"n_snapshots": 1}, {"n_snapshots": 2})
    prows = [r for p in parts for r in preader.read(p)]
    assert {(r[3], r[0], r[1]) for r in prows} == expect
    cat.backend.close()


def test_merge_mor_insert_only_and_delete_only(sqlite_catalog, spark):
    t = _seed(sqlite_catalog, spark, "m.io")
    ins = spark.createDataFrame([(50, "i", 5)], "k long, name string, r long")
    t = merge_into(
        spark, t, ins, on=["k"], when_not_matched=[{"action": "insert"}],
        strategy="mor",
    )
    assert t.metadata.current_snapshot().operation == "rowdelta"
    assert t.to_df(spark).count() == 10
    dels = spark.createDataFrame([(0, "x", 0)], "k long, name string, r long")
    t = merge_into(
        spark, t, dels, on=["k"], when_matched=[{"action": "delete"}],
        strategy="mor",
    )
    assert sorted(r.k for r in t.to_df(spark).collect()) == [*range(1, 9), 50]


def test_row_delta_conflicts_with_concurrent_commit(sqlite_catalog, spark):
    """A row delta staged against a base file set that a concurrent commit
    changed must CONFLICT on retry (its delete positions reference the old
    files), like an overwrite — never silently re-apply."""
    from iceberg_catalog_postgres_spark.catalog.catalog import CommitConflictError
    from pyspark.sql import functions as F

    t = _seed(sqlite_catalog, spark, "m.cc")
    positions = (
        t.to_df(spark)
        .withColumn("file_path", F.col("_metadata.file_path"))
        .withColumn("row_index", F.col("_metadata.row_index"))
        .where(F.col("k") == 0)
        .select("file_path", "row_index")
    )
    added = spark.createDataFrame([(0, "v2", 0)], "k long, name string, r long")
    tx = t.new_transaction().row_delta(added, positions)
    # concurrent writer lands an append between staging and commit
    t2 = sqlite_catalog.load_table(t.identifier)
    t2.new_transaction().append_dataframe(
        spark.createDataFrame([(99, "other", 9)], "k long, name string, r long")
    ).commit()
    with pytest.raises(CommitConflictError):
        tx.commit()


def test_row_delta_rejects_mixing(sqlite_catalog, spark):
    t = _seed(sqlite_catalog, spark, "m.mx")
    df = spark.createDataFrame([(1, "a", 0)], "k long, name string, r long")
    pos = spark.createDataFrame([], "file_path string, row_index long")
    tx = t.new_transaction().append_dataframe(df)
    with pytest.raises(ValueError, match="cannot mix"):
        tx.row_delta(df, pos)


@soak_only
def test_chained_mor_merges_batch_changelog(sqlite_catalog, spark):
    """Two consecutive MOR merges: the SECOND rowdelta's parent carries
    pending deletion vectors — the batch changelog reconstructs both
    merges' pairs exactly (to_df applies each snapshot's vectors), and
    the stream diff handles the compound case too (r11: each side read
    as its snapshot's live MOR state)."""
    from iceberg_catalog_postgres_spark.sources.catalog_datasource import (
        _merge_diff_changes,
    )

    t = _seed(sqlite_catalog, spark, "m.ch")
    base = t.metadata.current_snapshot_id
    src1 = spark.createDataFrame([(1, "u1", 9)], "k long, name string, r long")
    t = merge_into(
        spark, t, src1, on=["k"],
        when_matched=[{"action": "update", "set": {"name": "s.name"}}],
        preserve_lineage=True, strategy="mor",
    )
    src2 = spark.createDataFrame(
        [(1, "u1b", 9), (2, "x", 9)], "k long, name string, r long"
    )
    t = merge_into(
        spark, t, src2, on=["k"],
        when_matched=[
            {"action": "delete", "condition": "t.k = 2"},
            {"action": "update", "set": {"name": "s.name"}},
        ],
        preserve_lineage=True, strategy="mor",
    )
    ch = [
        (r._change_type, r.k, r.name, r._change_ordinal)
        for r in t.changelog_df(spark, base).collect()
    ]
    assert sorted(ch) == sorted(
        [
            ("update_before", 1, "n1", 2), ("update_after", 1, "u1", 2),
            ("update_before", 1, "u1", 3), ("update_after", 1, "u1b", 3),
            ("delete", 2, "n2", 3),
        ]
    )
    # final state correct through both vector generations
    got = {r.k: r.name for r in t.to_df(spark).collect()}
    assert got[1] == "u1b" and 2 not in got and len(got) == 8

    # r11: the stream handles the compound case too — the second
    # rowdelta's parent carries pending vectors, and the diff reads each
    # side as its snapshot's live MOR state; stream == batch for it
    snaps = sorted(t.metadata.snapshots, key=lambda s: s.sequence_number)
    store = sqlite_catalog.object_store()
    stream2 = {
        (ct, row[0], row[1])
        for ct, _rel, _pos, row in _merge_diff_changes(
            store, snaps[1], snaps[2], ["k", "name", "r"]
        )
    }
    assert stream2 == {
        ("update_before", 1, "u1"), ("update_after", 1, "u1b"),
        ("delete", 2, "n2"),
    }


def test_merge_conditional_insert_filters_source(sqlite_catalog, spark):
    """A conditioned NOT MATCHED insert drops non-qualifying source rows
    (the CDC 'delete of a nonexistent key is a no-op' semantics)."""
    t = _seed(sqlite_catalog, spark, "m.ci")
    src = spark.createDataFrame(
        [("I", 50, "in", 1), ("D", 60, "skip", 1)],
        "op string, k long, name string, r long",
    )
    t = merge_into(
        spark, t, src, on=["k"],
        when_not_matched=[{"action": "insert", "condition": "s.op = 'I'"}],
    )
    keys = {r.k for r in t.to_df(spark).collect()}
    assert 50 in keys and 60 not in keys


def test_merge_evaluates_source_once_single_pass(sqlite_catalog, spark):
    """r12 (VERDICT r11 #3): the merge runs its full-outer join ONCE — the
    cardinality guard, the MOR delete positions, and the appended rows all
    read the cached join output instead of re-running the join (which
    previously re-shuffled it up to three times). Pinned by an accumulator
    on a source-side UDF: one bump per source row, exactly."""
    from pyspark.sql.functions import udf

    t = _seed(sqlite_catalog, spark, "m.single")
    acc = spark.sparkContext.accumulator(0)

    @udf("long")
    def bump(x):
        acc.add(1)
        return x

    src = spark.createDataFrame(
        [(1, "u1", 9), (2, "u2", 9), (30, "ins", 0)],
        "k long, name string, r long",
    ).withColumn("r", bump(F.col("r")))
    t = merge_into(
        spark, t, src, on=["k"],
        when_matched=[{"action": "update", "set": "all"}],
        when_not_matched=[{"action": "insert"}],
        preserve_lineage=True, strategy="mor",
    )
    assert acc.value == 3, f"source evaluated {acc.value / 3:.1f}x, expected 1x"
    got = {r.k: (r.name, r.r) for r in t.to_df(spark).collect()}
    assert got[1] == ("u1", 9) and got[2] == ("u2", 9) and got[30] == ("ins", 0)
    assert len(got) == 10


def test_merge_cardinality_guard_still_null_safe_after_fold(sqlite_catalog, spark):
    """The guard folded into the join keeps the NULL-safe semantics: two
    NULL-key source rows matching a NULL-key target row still raise."""
    t = _seed(
        sqlite_catalog, spark, "m.nullg",
        rows=[(None, "t0", 0), (1, "t1", 1)],
    )
    src = spark.createDataFrame(
        [(None, "a", 0), (None, "b", 0)], "k long, name string, r long"
    )
    with pytest.raises(ValueError, match="cardinality"):
        merge_into(
            spark, t, src, on=["k"],
            when_matched=[{"action": "update", "set": "all"}],
        )
    # and duplicate keys that match NO target row stay allowed
    src_ok = spark.createDataFrame(
        [(50, "a", 0), (50, "b", 0)], "k long, name string, r long"
    )
    t = merge_into(
        spark, t, src_ok, on=["k"],
        when_matched=[{"action": "update", "set": "all"}],
    )
    assert t.to_df(spark).count() == 2
