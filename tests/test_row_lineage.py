"""Iceberg v3 ROW LINEAGE (r10): stable per-row ids via the spec's
inheritance model — ``TableMetadata.next_row_id`` high-water mark,
per-file ``first_row_id`` assigned at commit (zero per-row write cost),
``_row_id = first_row_id + row position`` on read, MATERIALIZED physical
ids across lineage-preserving compaction, and the changelog/incremental
readers crossing such rewrites with zero emitted changes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.catalog.catalog import (
    PostgresCatalog,
    TableIdentifier,
)


@pytest.fixture
def catalog(tmp_path):
    cat = PostgresCatalog.connect("rl_cat", None, str(tmp_path / "wh"))
    cat.initialize()
    yield cat
    cat.backend.close()


def _seed(catalog, spark, name, n=30):
    df = spark.createDataFrame(
        [(i, f"u{i % 5}") for i in range(n)], "k long, u string"
    ).orderBy("k")
    t = catalog.create_table(TableIdentifier.parse(f"s.{name}"), df.schema)
    return t.new_transaction().append_dataframe(df.coalesce(1)).commit()


def _ids(t, spark):
    return {
        r["k"]: r["_row_id"]
        for r in t.to_df(spark, with_row_lineage=True).collect()
    }


def _positions(t, spark, predicate):
    return (
        t.to_df(spark)
        .withColumn("file_path", F.col("_metadata.file_path"))
        .withColumn("row_index", F.col("_metadata.row_index"))
        .where(predicate)
        .select("file_path", "row_index")
    )


def test_append_assigns_monotone_ids_and_roundtrips(catalog, spark):
    t = _seed(catalog, spark, "a", n=20)
    assert t.metadata.next_row_id == 20
    ids = _ids(t, spark)
    assert ids == {k: k for k in range(20)}  # sorted single-file write
    df2 = spark.createDataFrame(
        [(100 + i, "x") for i in range(5)], "k long, u string"
    ).orderBy("k")
    t = t.new_transaction().append_dataframe(df2.coalesce(1)).commit()
    assert t.metadata.next_row_id == 25
    ids = _ids(t, spark)
    assert [ids[100 + i] for i in range(5)] == [20, 21, 22, 23, 24]
    # cold reload: document round-trip keeps the mark and the map
    t2 = t.catalog.load_table(t.identifier)
    assert t2.metadata.next_row_id == 25
    assert _ids(t2, spark) == ids
    # plain reads never see the column
    assert "_row_id" not in t.to_df(spark).columns


def test_ids_stable_across_all_three_mor_delete_kinds(catalog, spark):
    t = _seed(catalog, spark, "b", n=40)
    before = _ids(t, spark)
    keys = spark.createDataFrame([("u2",)], "u string").coalesce(1)
    t = t.new_transaction().delete_keys_dataframe(keys).commit()
    t = t.new_transaction().delete_positions_dataframe(
        _positions(t, spark, F.col("k") < 3)
    ).commit()
    t = t.new_transaction().delete_positions_dv(
        _positions(t, spark, F.col("k") >= 38)
    ).commit()
    after = _ids(t, spark)
    assert all(after[k] == before[k] for k in after)
    assert set(after) == {
        k for k in range(3, 38) if k % 5 != 2
    }


def test_lineage_preserving_compaction_and_cdc_crossing(catalog, spark):
    from iceberg_catalog_postgres_spark.catalog.maintenance import compact_table

    t = _seed(catalog, spark, "c", n=30)
    before = _ids(t, spark)
    t = t.new_transaction().delete_positions_dv(
        _positions(t, spark, F.col("k") < 5)
    ).commit()
    pre = t.metadata.current_snapshot_id
    df2 = spark.createDataFrame(
        [(100 + i, "x") for i in range(4)], "k long, u string"
    ).orderBy("k")
    t = t.new_transaction().append_dataframe(df2.coalesce(1)).commit()

    t = compact_table(spark, t, preserve_lineage=True)
    assert t.metadata.current_snapshot().summary["lineage-preserving"] == "true"
    after = _ids(t, spark)
    assert all(after[k] == before[k] for k in after if k < 100)
    assert len(after) == 29  # 25 survivors + 4 appended

    # the changelog crosses the compaction emitting ONLY the appends
    cl = t.changelog_df(spark, pre).collect()
    assert sorted(r["k"] for r in cl) == [100, 101, 102, 103]
    assert {r["_change_type"] for r in cl} == {"insert"}
    inc = t.incremental_df(spark, pre).collect()
    assert sorted(r["k"] for r in inc) == [100, 101, 102, 103]

    # materialized -> materialized: a second compaction keeps the ids
    t = compact_table(spark, t, preserve_lineage=True)
    assert _ids(t, spark) == after
    # and appends after compaction continue from the preserved mark
    df3 = spark.createDataFrame([(200, "y")], "k long, u string")
    t = t.new_transaction().append_dataframe(df3.coalesce(1)).commit()
    ids3 = _ids(t, spark)
    assert ids3[200] == max(after.values()) + 1 or ids3[200] >= 34


def test_plain_compaction_mints_fresh_ids(catalog, spark):
    """A NON-lineage-preserving rewrite goes through the normal overwrite
    assignment: the rewritten files get FRESH first_row_ids above the old
    high-water mark (ids are never reused — the spec-faithful degradation
    when a writer does not materialize lineage). preserve_lineage=True is
    the identity-keeping path."""
    from iceberg_catalog_postgres_spark.catalog.maintenance import compact_table

    t = _seed(catalog, spark, "d", n=10)
    assert t.metadata.next_row_id == 10
    t = compact_table(spark, t)  # preserve_lineage=False
    out = t.to_df(spark, with_row_lineage=True).collect()
    ids = [r["_row_id"] for r in out]
    assert len(ids) == 10 and all(v is not None and v >= 10 for v in ids)
    assert len(set(ids)) == 10
    assert t.metadata.next_row_id == 20


def test_subset_rewrite_keeps_kept_file_lineage(catalog, spark):
    from iceberg_catalog_postgres_spark.catalog.maintenance import (
        rewrite_files_before_seq,
    )

    t = _seed(catalog, spark, "e", n=20)
    df2 = spark.createDataFrame(
        [(100 + i, "x") for i in range(10)], "k long, u string"
    ).orderBy("k")
    t = t.new_transaction().append_dataframe(df2.coalesce(1)).commit()
    before = _ids(t, spark)
    boundary = max(
        t.metadata.current_file_seqs()[f] for f in t.metadata.current_data_files()
    )
    t, n_rw, n_kept, _ = rewrite_files_before_seq(spark, t, boundary)
    assert n_rw > 0 and n_kept > 0
    after = _ids(t, spark)
    # kept (second-append) file keeps its ids; rewritten rows read NULL
    assert all(after[100 + i] == before[100 + i] for i in range(10))
    assert all(after[k] is None for k in range(20))


def test_concurrent_appends_never_overlap_ids(catalog, spark):
    """A CAS retry re-assigns from the WINNER's next-row-id: two
    transactions staged from the same stale handle commit disjoint id
    ranges."""
    t = _seed(catalog, spark, "f", n=10)
    d1 = spark.createDataFrame([(100, "a"), (101, "a")], "k long, u string")
    d2 = spark.createDataFrame([(200, "b"), (201, "b"), (202, "b")], "k long, u string")
    tx1 = t.new_transaction().append_dataframe(d1.coalesce(1))
    tx2 = t.new_transaction().append_dataframe(d2.coalesce(1))
    t1 = tx1.commit()
    t2 = tx2.commit()  # CAS conflict -> retry chains on tx1's result
    ids = _ids(t2.catalog.load_table(t2.identifier), spark)
    vals = [v for v in ids.values() if v is not None]
    assert len(vals) == len(set(vals)) == 15
    assert t2.metadata.next_row_id == 15
    del t1


def test_lineage_read_refuses_row_id_column_clash(catalog, spark):
    df = spark.createDataFrame([(1, 2)], "k long, _row_id long")
    t = catalog.create_table(TableIdentifier.parse("s.g"), df.schema)
    t = t.new_transaction().append_dataframe(df.coalesce(1)).commit()
    with pytest.raises(ValueError, match="lineage column"):
        t.to_df(spark, with_row_lineage=True)


def test_lineage_survives_rename_after_materialization(catalog, spark):
    """Rename-aware cohorts compose with the materialized _row_id column:
    rename a column AFTER a lineage-preserving compaction, then read with
    lineage — values resolve through the rename, ids through the physical
    column."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from iceberg_catalog_postgres_spark.catalog.metadata import FIELD_ID_KEY
    from iceberg_catalog_postgres_spark.catalog.maintenance import compact_table

    t = _seed(catalog, spark, "h", n=12)
    before = _ids(t, spark)
    t = compact_table(spark, t, preserve_lineage=True)
    # rename u -> label (same field id)
    fid_k = t.schema["k"].metadata[FIELD_ID_KEY]
    fid_u = t.schema["u"].metadata[FIELD_ID_KEY]
    new_schema = StructType(
        [
            StructField("k", LongType(), True, {FIELD_ID_KEY: fid_k}),
            StructField("label", StringType(), True, {FIELD_ID_KEY: fid_u}),
        ]
    )
    t = t.commit_schema(new_schema)
    out = t.to_df(spark, with_row_lineage=True).collect()
    assert {r["k"]: r["_row_id"] for r in out} == before
    assert all(r["label"] == f"u{r['k'] % 5}" for r in out)


def test_cdc_streams_cross_lineage_preserving_compaction(spark, tmp_path):
    """Both CDC stream readers cross a lineage-preserving compaction
    emitting nothing (it is provably zero row-level changes), and keep
    emitting correct deltas for commits after it."""
    from iceberg_catalog_postgres_spark.catalog.maintenance import compact_table
    from iceberg_catalog_postgres_spark.sources.catalog_datasource import (
        CatalogChangelogParallelStreamReader,
        CatalogChangelogStreamReader,
    )

    db = str(tmp_path / "c.db")
    wh = str(tmp_path / "wh")
    cat = PostgresCatalog.connect("rlcdc", f"sqlite://{db}", wh)
    cat.initialize()
    rows = [(i, f"n{i}", i % 5) for i in range(10)]
    src = spark.createDataFrame(
        rows, "n_nationkey long, n_name string, n_regionkey long"
    ).orderBy("n_nationkey")
    t = cat.create_table(TableIdentifier.parse("c.nation"), src.schema)
    t = t.new_transaction().append_dataframe(src.coalesce(1)).commit()
    t = t.new_transaction().delete_positions_dv(
        _positions(t, spark, F.col("n_nationkey") < 2)
    ).commit()
    t = compact_table(spark, t, preserve_lineage=True)
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame(
            [(100, "x", 0)], "n_nationkey long, n_name string, n_regionkey long"
        ).coalesce(1)
    ).commit()

    opts = {"db": db, "warehouse": wh, "ident": "c.nation", "catalog": "rlcdc"}
    reader = CatalogChangelogStreamReader(dict(opts))
    all_rows, end = reader.read(reader.initialOffset())
    assert end["n_snapshots"] == 4
    keys = sorted((r[0], r[3]) for r in all_rows)
    assert keys == sorted(
        [(i, "insert") for i in range(10)]
        + [(0, "delete"), (1, "delete"), (100, "insert")]
    )

    preader = CatalogChangelogParallelStreamReader(dict(opts))
    parts = preader.partitions({"n_snapshots": 0}, {"n_snapshots": 4})
    prows = [r for p in parts for r in preader.read(p)]
    assert sorted((r[0], r[3]) for r in prows) == keys
    cat.backend.close()


def test_lineage_merge_emits_update_pairs_in_changelog(catalog, spark):
    """merge_upsert(preserve_lineage=True): matched rows keep their
    _row_id, true inserts get fresh ids via the v3 null-inheritance rule,
    and changelog_df reconstructs the merge as UPDATE before/after pairs
    plus inserts — the change kind a file-set diff cannot express."""
    from iceberg_catalog_postgres_spark.catalog.maintenance import merge_upsert

    t = _seed(catalog, spark, "m", n=10)
    before = _ids(t, spark)
    pre = t.metadata.current_snapshot_id
    updates = spark.createDataFrame(
        [(3, "CHANGED"), (7, "CHANGED"), (50, "NEW")], "k long, u string"
    )
    t = merge_upsert(spark, t, updates, ["k"], preserve_lineage=True)

    after = _ids(t, spark)
    # matched + untouched rows keep ids; the insert gets a fresh one
    assert all(after[k] == before[k] for k in range(10))
    assert after[50] is not None and after[50] >= 10
    vals = {r["k"]: r["u"] for r in t.to_df(spark).collect()}
    assert vals[3] == "CHANGED" and vals[7] == "CHANGED" and vals[50] == "NEW"
    assert vals[4] == "u4"

    cl = t.changelog_df(spark, pre).collect()
    by_type = {}
    for r in cl:
        by_type.setdefault(r["_change_type"], []).append((r["k"], r["u"]))
    assert sorted(by_type["insert"]) == [(50, "NEW")]
    assert sorted(by_type["update_before"]) == [(3, "u3"), (7, "u2")]
    assert sorted(by_type["update_after"]) == [(3, "CHANGED"), (7, "CHANGED")]
    assert "delete" not in by_type

    # a second lineage merge composes (materialized -> materialized)
    t = merge_upsert(
        spark, t,
        spark.createDataFrame([(3, "AGAIN")], "k long, u string"),
        ["k"], preserve_lineage=True,
    )
    assert _ids(t, spark)[3] == before[3]
    cl2 = t.changelog_df(spark, pre).collect()
    pairs = sorted(
        (r["k"], r["u"], r["_change_type"]) for r in cl2 if r["k"] == 3
    )
    assert ("3", "AGAIN", "update_after") not in pairs  # type sanity only
    assert any(c == "update_after" and u == "AGAIN" for _k, u, c in pairs)


def test_last_updated_sequence_number_semantics(catalog, spark):
    """The second v3 lineage field: inherited rows read their file's
    commit seq; a lineage merge stamps updated/inserted rows with the
    MERGE's seq while untouched rows keep their original value — and a
    preserving compaction carries all values verbatim."""
    from iceberg_catalog_postgres_spark.catalog.maintenance import (
        compact_table,
        merge_upsert,
    )

    t = _seed(catalog, spark, "lus", n=8)  # append at seq 1
    df2 = spark.createDataFrame(
        [(100, "x"), (101, "x")], "k long, u string"
    ).orderBy("k")
    t = t.new_transaction().append_dataframe(df2.coalesce(1)).commit()  # seq 2

    def lus(t):
        return {
            r["k"]: r["_last_updated_sequence_number"]
            for r in t.to_df(spark, with_row_lineage=True).collect()
        }

    base = lus(t)
    assert all(base[k] == 1 for k in range(8))
    assert base[100] == base[101] == 2

    updates = spark.createDataFrame(
        [(3, "CHANGED"), (500, "NEW")], "k long, u string"
    )
    t = merge_upsert(spark, t, updates, ["k"], preserve_lineage=True)  # seq 3
    merge_seq = t.metadata.current_snapshot().sequence_number
    after = lus(t)
    assert after[3] == merge_seq and after[500] == merge_seq
    assert after[0] == 1 and after[100] == 2  # untouched rows keep theirs

    t = compact_table(spark, t, preserve_lineage=True)  # seq 4
    assert lus(t) == after  # carried verbatim through the rewrite
    # and ids stay stable too
    ids = _ids(t, spark)
    assert ids[3] is not None and len(set(ids.values())) == len(ids)


def test_lineage_across_wap_branch_and_publish(catalog, spark):
    """WAP: a branch append assigns ids from the SHARED document
    high-water mark (branch and main commits serialize through the same
    CAS), so ids never overlap across branches, and publishing the branch
    surfaces the staged rows with their already-assigned ids."""
    t = _seed(catalog, spark, "wap", n=6)
    stage = spark.createDataFrame(
        [(100, "w"), (101, "w")], "k long, u string"
    ).orderBy("k")
    t = t.new_transaction(branch="audit").append_dataframe(
        stage.coalesce(1)
    ).commit()
    # main readers see nothing yet, but the mark already advanced
    assert sorted(r["k"] for r in t.to_df(spark).collect()) == list(range(6))
    assert t.metadata.next_row_id == 8
    # publish fast-forwards; the staged rows surface with their ids
    t = t.catalog.load_table(t.identifier).publish_branch("audit")
    # a MAIN append after publish takes the NEXT range — no overlap
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(200, "m")], "k long, u string").coalesce(1)
    ).commit()
    assert t.metadata.next_row_id == 9
    ids = _ids(t, spark)
    vals = list(ids.values())
    assert len(vals) == len(set(vals)) == 9
    assert {ids[100], ids[101]} == {6, 7} and ids[200] == 8


def test_lineage_never_reused_after_rollback(catalog, spark):
    """Rollback re-points the head but the high-water mark NEVER
    decreases: rows appended after a rollback get ids disjoint from the
    abandoned snapshot's rows — time travel into the abandoned history
    keeps ITS ids, with no collision."""
    t = _seed(catalog, spark, "rb", n=5)
    base_id = t.metadata.current_snapshot_id
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(100, "a"), (101, "a")], "k long, u string")
        .orderBy("k").coalesce(1)
    ).commit()
    abandoned_id = t.metadata.current_snapshot_id
    t = t.rollback_to(base_id)
    assert t.metadata.next_row_id == 7  # mark survives the rollback
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(200, "b")], "k long, u string").coalesce(1)
    ).commit()
    ids_now = _ids(t, spark)
    assert ids_now[200] == 7
    ids_abandoned = {
        r["k"]: r["_row_id"]
        for r in t.to_df(spark, snapshot_id=abandoned_id, with_row_lineage=True).collect()
    }
    assert ids_abandoned[100] == 5 and ids_abandoned[101] == 6
    assert set(ids_abandoned.values()) & {ids_now[200]} == set()


def test_lineage_read_uses_broadcast_join(catalog, spark):
    """Plan shape: the lineage map join must be a BroadcastHashJoin (the
    map is O(files)); a sort-merge join here would shuffle the table."""
    t = _seed(catalog, spark, "plan", n=10)
    plan = t.to_df(spark, with_row_lineage=True)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
    assert "SortMergeJoin" not in plan
