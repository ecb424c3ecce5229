"""Column renames over unrewritten data files (r5): commit_schema records a
seq-scoped rename log; reads resolve each file's PHYSICAL names through it,
so id-based evolution (mod.rs:431-453 — columns tracked by id, not name)
stays correct without rewriting a byte. Before r5 a renamed column silently
read NULL from pre-rename files."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from iceberg_catalog_postgres_spark.catalog.catalog import PostgresCatalog, TableIdentifier
from iceberg_catalog_postgres_spark.catalog.metadata import FIELD_ID_KEY


@pytest.fixture
def catalog(tmp_path):
    cat = PostgresCatalog.connect("rename_cat", None, str(tmp_path / "warehouse"))
    cat.initialize()
    yield cat
    cat.backend.close()


def _schema(names: list[str]) -> StructType:
    return StructType(
        [
            StructField(n, LongType(), True, {FIELD_ID_KEY: i + 1})
            for i, n in enumerate(names)
        ]
    )


def test_rename_preserves_old_file_values(catalog, spark):
    df = spark.createDataFrame([(1, 10), (2, 20)], _schema(["id", "amount"]))
    t = catalog.create_table(TableIdentifier.parse("rn.t1"), df.schema)
    t = t.new_transaction().append_dataframe(df).commit()
    t = t.commit_schema(_schema(["id", "amount_usd"]))
    t = catalog.load_table(TableIdentifier.parse("rn.t1"))
    got = {r.id: r.amount_usd for r in t.to_df(spark).collect()}
    assert got == {1: 10, 2: 20}, "pre-rename file values lost"


def test_mixed_cohorts_old_and_new_names(catalog, spark):
    """Files written before AND after the rename read as one logical table."""
    old = spark.createDataFrame([(1, 10)], _schema(["id", "amount"]))
    t = catalog.create_table(TableIdentifier.parse("rn.t2"), old.schema)
    t = t.new_transaction().append_dataframe(old).commit()
    t = t.commit_schema(_schema(["id", "amount_usd"]))
    new = spark.createDataFrame([(2, 20)], _schema(["id", "amount_usd"]))
    t = t.new_transaction().append_dataframe(new).commit()
    got = {r.id: r.amount_usd for r in t.to_df(spark).collect()}
    assert got == {1: 10, 2: 20}
    # incremental read across the rename boundary resolves names too
    snaps = t.metadata.snapshots
    inc = t.incremental_df(
        spark, from_snapshot_id=snaps[0].snapshot_id, to_snapshot_id=snaps[1].snapshot_id
    )
    assert [(r.id, r.amount_usd) for r in inc.collect()] == [(2, 20)]


def test_chained_renames_compose(catalog, spark):
    t = catalog.create_table(
        TableIdentifier.parse("rn.t3"),
        _schema(["id", "a"]),
    )
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(1, 100)], _schema(["id", "a"]))
    ).commit()
    t = t.commit_schema(_schema(["id", "b"]))
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(2, 200)], _schema(["id", "b"]))
    ).commit()
    t = t.commit_schema(_schema(["id", "c"]))
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(3, 300)], _schema(["id", "c"]))
    ).commit()
    got = {r.id: r.c for r in t.to_df(spark).collect()}
    assert got == {1: 100, 2: 200, 3: 300}
    # the log records both renames with distinct effective seqs
    log = t.column_renames()
    assert [(r["from"], r["to"]) for r in log] == [("a", "b"), ("b", "c")]


def test_stats_pruning_follows_rename(catalog, spark):
    """Manifest bounds were written under the OLD physical name; planning on
    the new logical name must still prune (and still open zero footers)."""
    import iceberg_catalog_postgres_spark.catalog.table as _tm

    t = catalog.create_table(TableIdentifier.parse("rn.t4"), _schema(["id", "k"]))
    for lo in (0, 100):
        df = spark.createDataFrame(
            [(i, lo + i) for i in range(50)], _schema(["id", "k"])
        ).coalesce(1)
        t = t.new_transaction().append_dataframe(df).commit()
    t = t.commit_schema(_schema(["id", "key"]))
    before = _tm.PLANNING_FOOTER_READS
    planned = t.planned_files("key", 120, 130, require_stats=True)
    assert _tm.PLANNING_FOOTER_READS == before
    assert len(planned) == 1
    rows = (
        t.to_df(spark, prune=("key", 120, 130))
        .filter(F.col("key").between(120, 130))
        .count()
    )
    assert rows == 11


def test_eq_delete_staged_before_rename_still_applies(catalog, spark):
    """An equality delete written under the old key name must keep masking
    rows after the rename (its key columns map forward through the log)."""
    t = catalog.create_table(TableIdentifier.parse("rn.t5"), _schema(["id", "amount"]))
    df = spark.createDataFrame([(i, i * 10) for i in range(5)], _schema(["id", "amount"]))
    t = t.new_transaction().append_dataframe(df).commit()
    keys = spark.createDataFrame([(30,)], "amount long").coalesce(1)
    t = t.new_transaction().delete_keys_dataframe(keys).commit()
    assert t.to_df(spark).count() == 4
    t = t.commit_schema(_schema(["id", "amount_usd"]))
    t = catalog.load_table(TableIdentifier.parse("rn.t5"))
    got = sorted(r.amount_usd for r in t.to_df(spark).collect())
    assert got == [0, 10, 20, 40], "pre-rename delete key stopped applying"


def test_cow_delete_after_rename(catalog, spark):
    """delete_where_cow on the renamed column: pruning maps the name per
    file, the rewrite reads through to_df (rename-aware), and the result
    carries only current-name files."""
    from iceberg_catalog_postgres_spark.catalog.maintenance import delete_where_cow

    t = catalog.create_table(TableIdentifier.parse("rn.t6"), _schema(["id", "k"]))
    for lo in (0, 100):
        df = spark.createDataFrame(
            [(i, lo + i) for i in range(50)], _schema(["id", "k"])
        ).coalesce(1)
        t = t.new_transaction().append_dataframe(df).commit()
    t = t.commit_schema(_schema(["id", "key"]))
    t = catalog.load_table(TableIdentifier.parse("rn.t6"))
    t, n_rewritten, n_kept = delete_where_cow(spark, t, "key", 120, 130)
    assert (n_rewritten, n_kept) == (1, 1)
    assert t.to_df(spark).count() == 89
    assert t.to_df(spark).filter(F.col("key").between(120, 130)).count() == 0


def test_type_widening_int_to_long_float_to_double(catalog, spark):
    """Iceberg promotion rules: widen int->long and float->double with zero
    data movement; old narrow files up-cast at scan time; mixed cohorts
    read as one table. Narrowing is rejected at commit."""
    from pyspark.sql.types import (
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    import pytest as _pytest

    s_narrow = StructType(
        [StructField("k", IntegerType(), True), StructField("x", FloatType(), True)]
    )
    t = catalog.create_table(TableIdentifier.parse("rn.widen"), s_narrow)
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(1, 1.5), (2, 2.5)], s_narrow)
    ).commit()

    s_wide = StructType(
        [
            StructField("k", LongType(), True, t.schema["k"].metadata),
            StructField("x", DoubleType(), True, t.schema["x"].metadata),
        ]
    )
    t = t.commit_schema(s_wide)
    # post-widen append writes long/double natively
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(3_000_000_000, 3.25)], s_wide)
    ).commit()

    df = t.to_df(spark)
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["bigint", "double"]
    got = sorted((r["k"], r["x"]) for r in df.collect())
    assert got == [(1, 1.5), (2, 2.5), (3_000_000_000, 3.25)]
    # reload from catalog: same
    t2 = catalog.load_table(TableIdentifier.parse("rn.widen"))
    assert sorted((r["k"], r["x"]) for r in t2.to_df(spark).collect()) == got

    # narrowing / incompatible changes are rejected
    s_bad = StructType(
        [
            StructField("k", IntegerType(), True, t2.schema["k"].metadata),
            StructField("x", DoubleType(), True, t2.schema["x"].metadata),
        ]
    )
    with _pytest.raises(ValueError, match="widen"):
        t2.commit_schema(s_bad)


def test_add_column_with_initial_default(catalog, spark):
    """Iceberg v3 initial-default: pre-add files read the default; post-add
    files keep their written values INCLUDING explicit NULLs; composes
    with a later rename of the defaulted column."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    s0 = StructType([StructField("id", LongType(), True)])
    t = catalog.create_table(TableIdentifier.parse("rn.defaults"), s0)
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(1,), (2,)], s0)
    ).commit()

    s1 = StructType(
        [
            StructField("id", LongType(), True, t.schema["id"].metadata),
            StructField("quality", DoubleType(), True),
        ]
    )
    t = t.commit_schema(s1, defaults={"quality": 0.5})
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(3, 0.9), (4, None)], t.schema)
    ).commit()

    got = {r["id"]: r["quality"] for r in t.to_df(spark).collect()}
    assert got == {1: 0.5, 2: 0.5, 3: 0.9, 4: None}

    # rename the defaulted column: the default follows the field id
    s2 = StructType(
        [
            StructField("id", LongType(), True, t.schema["id"].metadata),
            StructField("q_score", DoubleType(), True, t.schema["quality"].metadata),
        ]
    )
    t = t.commit_schema(s2)
    got2 = {r["id"]: r["q_score"] for r in t.to_df(spark).collect()}
    assert got2 == {1: 0.5, 2: 0.5, 3: 0.9, 4: None}
    # reload parity
    t2 = catalog.load_table(TableIdentifier.parse("rn.defaults"))
    assert {r["id"]: r["q_score"] for r in t2.to_df(spark).collect()} == got2


def test_default_rejected_for_existing_column(catalog, spark):
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    import pytest as _pytest

    s0 = StructType([StructField("id", LongType(), True)])
    t = catalog.create_table(TableIdentifier.parse("rn.defbad"), s0)
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(1,)], s0)
    ).commit()
    with _pytest.raises(ValueError, match="newly added"):
        t.commit_schema(
            StructType([StructField("id", LongType(), True, t.schema["id"].metadata)]),
            defaults={"id": 0},
        )


# ---- r7: rename follow-through (spec entries, NDV keys, recycled names) ----


def test_rename_partition_source_rewrites_spec_and_keeps_pruning(catalog, spark):
    """Renaming a partition SOURCE column must rewrite the spec entry (the
    old spelling crashed the next partitioned write with an unresolved
    column) and keep pruning working across BOTH cohorts: old files' tuples
    are keyed by the old spelling and match via the entry-rename log."""
    S = _schema(["k", "v"])
    t = catalog.create_table(
        TableIdentifier.parse("rn.part1"), S, partition_by=["bucket(4,k)"]
    )
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(i, i) for i in range(32)], S).coalesce(1)
    ).commit()
    t = t.commit_schema(_schema(["key_id", "v"]))
    assert t.metadata.partition_spec == ["bucket(4,key_id)"]
    # the write path works again, partitioned by the new name
    sch = t.metadata.spark_schema
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(i, i) for i in range(32, 64)], sch).coalesce(1)
    ).commit()
    n_files = len(t.metadata.current_data_files())
    assert n_files == 8  # 4 buckets per cohort
    # point lookup under the NEW name prunes old AND new cohorts (1 bucket
    # each): exactly the files whose recorded tuple — under EITHER spelling —
    # carries the query value's bucket
    from iceberg_catalog_postgres_spark.catalog.table import transform_value

    planned = t.planned_files_transformed({"key_id": 13})
    assert len(planned) == 2
    tv = transform_value("bucket(4,key_id)", 13, src_type="bigint")
    store = t.catalog.object_store()
    expected = {
        store.resolve(f)
        for f, tup in t.metadata.current_file_partitions().items()
        if tv in (tup.get("bucket(4,k)"), tup.get("bucket(4,key_id)"))
    }
    assert set(planned) == expected
    # full read parity across cohorts through the engine's rename-aware path
    assert sorted(r["key_id"] for r in t.to_df(spark).collect()) == list(range(64))
    assert t.to_df(spark).filter(F.col("key_id") == 13).count() == 1


def test_rename_moves_ndv_properties(catalog, spark):
    """ANALYZE state follows the rename: the sketch/estimate/coverage keys
    move to the new name in the same commit; the old name serves nothing."""
    from iceberg_catalog_postgres_spark.catalog.maintenance import (
        column_ndv,
        update_column_ndv,
    )

    S = _schema(["a", "x"])
    t = catalog.create_table(TableIdentifier.parse("rn.ndv1"), S)
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(i % 5, i) for i in range(100)], S).coalesce(1)
    ).commit()
    t = update_column_ndv(spark, t, ["a"])
    assert column_ndv(t, "a") == 5
    t = t.commit_schema(_schema(["b", "x"]))
    assert column_ndv(t, "b") == 5          # estimate survives the rename
    assert column_ndv(t, "a") is None       # old name serves nothing
    assert "ndv.sketch.a" not in t.metadata.properties
    # and incremental maintenance continues under the new name (delta-only)
    sch = t.metadata.spark_schema
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(i, i) for i in range(100, 150)], sch).coalesce(1)
    ).commit()
    t = update_column_ndv(spark, t, ["b"])
    est = column_ndv(t, "b")
    assert abs(est - 55) / 55 <= 0.05       # 5 old + 50 new distinct values


def test_recycled_column_name_reads_null_and_gets_fresh_ndv(catalog, spark):
    """Re-adding a column under a renamed-away name: old files carry the OLD
    column's bytes under that name — the new column must read as NULL there
    (pre-r7: duplicate physical schema crashed the read), range predicates
    must not consult the old column's stats, and ANALYZE must not inherit
    the old column's sketch."""
    from iceberg_catalog_postgres_spark.catalog.maintenance import (
        column_ndv,
        update_column_ndv,
    )

    S = _schema(["a", "x"])
    t = catalog.create_table(TableIdentifier.parse("rn.recycle1"), S)
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(i % 5, i) for i in range(100)], S).coalesce(1)
    ).commit()
    t = update_column_ndv(spark, t, ["a"])
    t = t.commit_schema(_schema(["b", "x"]))                  # a -> b
    fields3 = _schema(["b", "x"]).fields + [StructField("a", LongType(), True)]
    t = t.commit_schema(StructType(fields3))                  # NEW column "a"
    sch = t.metadata.spark_schema
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame(
            [(i, i, i * 10) for i in range(100, 150)], sch
        ).coalesce(1)
    ).commit()

    df = t.to_df(spark)
    assert df.count() == 150
    # old cohort: b carries the old values, the recycled "a" is NULL
    old = df.filter(F.col("x") < 100)
    assert old.filter(F.col("a").isNotNull()).count() == 0
    assert old.filter(F.col("b").isNull()).count() == 0
    new = df.filter(F.col("x") >= 100)
    assert new.filter(F.col("a").isNull()).count() == 0
    # planning: a range over the NEW "a" prunes the old cohort exactly
    # (all-NULL there), keeps the new cohort
    planned = t.planned_files("a", 1000, 1490)
    rows = spark.read.schema(sch).parquet(*planned)
    assert rows.filter("a >= 1000 and a <= 1490").count() == 50
    # IS NOT NULL planning skips the old cohort entirely
    nn = t.planned_files_nullness("a", want_null=False)
    assert len(nn) == 1
    # ANALYZE of the new "a" starts fresh — 50 distinct, not the old 5
    t = update_column_ndv(spark, t, ["a"])
    est = column_ndv(t, "a")
    assert abs(est - 50) / 50 <= 0.05
    # the renamed column's NDV still serves under its new name
    assert column_ndv(t, "b") == 5


def test_drop_guards_and_ndv_hygiene(catalog, spark):
    """Dropping a column that other state references by name is rejected at
    commit time: a partition-spec source (the next write would crash) and a
    pending equality-delete key (the next read would crash / mis-apply).
    A clean drop removes the column's orphaned NDV properties so a later
    column re-using the name cannot inherit them."""
    from iceberg_catalog_postgres_spark.catalog.maintenance import (
        column_ndv,
        update_column_ndv,
    )

    # (a) partition-source drop rejected
    S = _schema(["k", "v"])
    t = catalog.create_table(
        TableIdentifier.parse("rn.drop1"), S, partition_by=["bucket(4,k)"]
    )
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(1, 1)], S).coalesce(1)
    ).commit()
    keep_v = StructType([_schema(["k", "v"]).fields[1]])  # only v (id 2)
    with pytest.raises(ValueError, match="partition-spec entry"):
        t.commit_schema(keep_v)

    # (b) pending eq-delete key drop rejected; allowed after materialization
    S2 = _schema(["a", "x"])
    t2 = catalog.create_table(TableIdentifier.parse("rn.drop2"), S2)
    t2 = t2.new_transaction().append_dataframe(
        spark.createDataFrame([(i, i) for i in range(10)], S2).coalesce(1)
    ).commit()
    t2 = t2.new_transaction().delete_keys_dataframe(
        spark.createDataFrame([(3,)], "a long").coalesce(1)
    ).commit()
    keep_x = StructType([_schema(["a", "x"]).fields[1]])  # only x (id 2)
    with pytest.raises(ValueError, match="equality-delete"):
        t2.commit_schema(keep_x)
    # materialize the delete (overwrite clears MOR debt), then drop works
    t2 = t2.new_transaction().overwrite_dataframe(t2.to_df(spark)).commit()
    t2 = t2.commit_schema(keep_x)
    assert [f.name for f in t2.metadata.spark_schema.fields] == ["x"]
    assert sorted(r["x"] for r in t2.to_df(spark).collect()) == [
        i for i in range(10) if i != 3
    ]

    # (c) NDV properties of a dropped column are removed
    S3 = _schema(["c", "y"])
    t3 = catalog.create_table(TableIdentifier.parse("rn.drop3"), S3)
    t3 = t3.new_transaction().append_dataframe(
        spark.createDataFrame([(i % 4, i) for i in range(40)], S3).coalesce(1)
    ).commit()
    t3 = update_column_ndv(spark, t3, ["c"])
    assert column_ndv(t3, "c") == 4
    keep_y = StructType([_schema(["c", "y"]).fields[1]])
    t3 = t3.commit_schema(keep_y)
    assert column_ndv(t3, "c") is None
    assert not any(
        k.startswith(("ndv.sketch.c", "ndv.estimate.c", "ndv.covered-files.c"))
        for k in t3.metadata.properties
    )


def test_commit_schema_retries_past_concurrent_data_commit(catalog, spark):
    """r7: a schema edit racing a DATA commit must retry-recompute (they
    commute); racing another SCHEMA change must still raise."""
    from iceberg_catalog_postgres_spark.catalog.catalog import CommitConflictError

    S = _schema(["a", "x"])
    t = catalog.create_table(TableIdentifier.parse("rn.race1"), S)
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(1, 1)], S).coalesce(1)
    ).commit()
    stale = catalog.load_table(TableIdentifier.parse("rn.race1"))
    # data commit lands after `stale` was loaded
    catalog.load_table(TableIdentifier.parse("rn.race1")).new_transaction(
    ).append_dataframe(
        spark.createDataFrame([(2, 2)], S).coalesce(1)
    ).commit()
    t2 = stale.commit_schema(_schema(["b", "x"]))  # stale CAS -> retry
    assert [f.name for f in t2.metadata.spark_schema.fields] == ["b", "x"]
    # BOTH rows visible (the concurrent append was not lost) under new name
    assert sorted(r["b"] for r in t2.to_df(spark).collect()) == [1, 2]

    # concurrent SCHEMA change: no silent last-writer-wins
    stale2 = catalog.load_table(TableIdentifier.parse("rn.race1"))
    catalog.load_table(TableIdentifier.parse("rn.race1")).commit_schema(
        _schema(["c", "x"])
    )
    with pytest.raises(CommitConflictError):
        stale2.commit_schema(_schema(["d", "x"]))


def test_renamed_spec_pruning_through_manifest_chunks(catalog, spark, monkeypatch):
    """r7: the TWO-LEVEL (manifest-chunk) partition-prune path must also
    match old tuples via the entry-rename spellings — chunk summaries and
    entries from pre-rename commits are keyed by the old spelling."""
    import iceberg_catalog_postgres_spark.catalog.metadata as md_mod

    monkeypatch.setattr(md_mod, "MANIFEST_THRESHOLD", 2)
    S = _schema(["k", "v"])
    t = catalog.create_table(
        TableIdentifier.parse("rn.chunks"), S, partition_by=["bucket(4,k)"]
    )
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(i, i) for i in range(32)], S).coalesce(1)
    ).commit()
    assert t.metadata.current_snapshot().manifests, "expected manifest spill"
    t = t.commit_schema(_schema(["key_id", "v"]))
    sch = t.metadata.spark_schema
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(i, i) for i in range(32, 64)], sch).coalesce(1)
    ).commit()
    t = catalog.load_table(TableIdentifier.parse("rn.chunks"))
    assert t.metadata.current_snapshot().manifests  # still chunked
    planned = t.planned_files_transformed({"key_id": 13})
    assert len(planned) == 2  # one bucket per cohort, through the chunk path
    assert t.to_df(spark).filter(F.col("key_id") == 13).count() == 1
    # range-planner chunk path with spellings (monotone transform needed —
    # use a day spec for the range form)
    assert sorted(r["key_id"] for r in t.to_df(spark).collect()) == list(range(64))


def test_renamed_day_spec_range_pruning_through_chunks(catalog, spark, monkeypatch):
    """r7: planned_files_transformed_range's chunk-summary skip and per-file
    tuple checks must match pre-rename tuples via spellings too (day(ts)
    renamed to day(event_ts))."""
    import datetime as dt

    import iceberg_catalog_postgres_spark.catalog.metadata as md_mod
    from pyspark.sql.types import TimestampType

    monkeypatch.setattr(md_mod, "MANIFEST_THRESHOLD", 2)
    S = StructType(
        [
            StructField("ts", TimestampType(), True, {FIELD_ID_KEY: 1}),
            StructField("n", LongType(), True, {FIELD_ID_KEY: 2}),
        ]
    )
    rows = [
        (dt.datetime(2024, 1, 1 + d, 12, 0, 0), d * 100 + i)
        for d in range(6)
        for i in range(4)
    ]
    t = catalog.create_table(
        TableIdentifier.parse("rn.dayrange"), S, partition_by=["day(ts)"]
    )
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame(rows, S).coalesce(1)
    ).commit()
    assert t.metadata.current_snapshot().manifests
    S2 = StructType(
        [
            StructField("event_ts", TimestampType(), True, {FIELD_ID_KEY: 1}),
            StructField("n", LongType(), True, {FIELD_ID_KEY: 2}),
        ]
    )
    t = t.commit_schema(S2)
    assert t.metadata.partition_spec == ["day(event_ts)"]
    # 2-day range over the renamed column plans exactly the 2 pre-rename
    # daily files (tuples keyed day(ts)) — through the chunk path
    planned = t.planned_files_transformed_range(
        "event_ts", dt.datetime(2024, 1, 2), dt.datetime(2024, 1, 3, 23, 59)
    )
    assert len(planned) == 2
    n = (
        t.to_df(
            spark,
            transformed_range=(
                "event_ts",
                dt.datetime(2024, 1, 2),
                dt.datetime(2024, 1, 3, 23, 59),
            ),
        )
        .filter(
            (F.col("event_ts") >= F.lit(dt.datetime(2024, 1, 2)))
            & (F.col("event_ts") < F.lit(dt.datetime(2024, 1, 4)))
        )
        .count()
    )
    assert n == 8


# ---- r8: re-renamed recycled names (two renamed columns collide on one
# historical physical name — ADVICE r7 medium) ----


def test_rerenamed_recycled_name_resolves_owner_per_epoch(catalog, spark):
    """rename y->a, add NEW column as y, rename it y->b: for pre-rename
    cohorts BOTH current columns a and b chain back to physical 'y'.
    Pre-r8, neither claimant was detected (the guard only fired when
    phys == column), so the read schema carried 'y' twice — duplicate
    fields crashed the read or served the OLD column's bytes as b.
    Ownership must resolve per epoch: epoch-0 files give 'y' to a
    (departed earliest), epoch-1 files to b, epoch-2 files are literal."""
    S = _schema(["id", "y"])
    t = catalog.create_table(TableIdentifier.parse("rn.rerecycle"), S)
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(1, 10), (2, 20)], S).coalesce(1)
    ).commit()
    t = t.commit_schema(_schema(["id", "a"]))                 # y -> a
    fields3 = _schema(["id", "a"]).fields + [StructField("y", LongType(), True)]
    t = t.commit_schema(StructType(fields3))                  # NEW column "y"
    sch3 = t.metadata.spark_schema
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(3, 30, 300)], sch3).coalesce(1)
    ).commit()
    fields4 = _schema(["id", "a"]).fields + [
        StructField("b", LongType(), True, fields3[2].metadata or {})
    ]
    t = t.commit_schema(
        StructType(
            [
                StructField(f.name, f.dataType, f.nullable, f.metadata)
                for f in t.metadata.spark_schema.fields[:2]
            ]
            + [
                StructField(
                    "b",
                    t.metadata.spark_schema.fields[2].dataType,
                    True,
                    t.metadata.spark_schema.fields[2].metadata,
                )
            ]
        )
    )                                                         # y -> b (same id)
    sch4 = t.metadata.spark_schema
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(4, 40, 400)], sch4).coalesce(1)
    ).commit()

    got = {r.id: (r.a, r.b) for r in t.to_df(spark).collect()}
    assert got == {1: (10, None), 2: (20, None), 3: (30, 300), 4: (40, 400)}, (
        "per-epoch ownership of the shared physical name 'y' broken"
    )

    # planning: b's range predicates must not consult the old column's
    # stats for epoch-0 files (b is absent there -> pruned exactly)
    planned = t.planned_files("b", 0, 1000)
    rows = spark.read.schema(sch4).parquet(*planned)
    # epoch-0 files pruned: only epochs 1/2 carry b's physical bytes
    assert sorted(r.id for r in rows.collect()) == [3, 4]
    # and a's planning still reaches epoch-0 files under physical 'y'
    planned_a = t.planned_files("a", 10, 10)
    assert len(planned_a) == 1

    # direct resolver checks per epoch
    seqs = t.metadata.current_file_seqs()
    by_seq = sorted(set(seqs.values()))
    e0, e1, e2 = by_seq
    assert t.physical_name_or_absent("a", e0) == "y"
    assert t.physical_name_or_absent("b", e0) is None
    assert t.physical_name_or_absent("a", e1) == "a"
    assert t.physical_name_or_absent("b", e1) == "y"
    assert t.physical_name_or_absent("a", e2) == "a"
    assert t.physical_name_or_absent("b", e2) == "b"


def test_triple_recycle_three_owners(catalog, spark):
    """Three successive owners of one name: y->a, add y, y->b, add y again.
    Each cohort's 'y' bytes belong to exactly one current column; the other
    two claimants read NULL there."""
    S = _schema(["id", "y"])
    t = catalog.create_table(TableIdentifier.parse("rn.triple"), S)
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(1, 100)], S).coalesce(1)
    ).commit()
    t = t.commit_schema(_schema(["id", "a"]))                 # y -> a
    t = t.commit_schema(
        StructType(_schema(["id", "a"]).fields + [StructField("y", LongType(), True)])
    )                                                         # add y (2nd owner)
    sch3 = t.metadata.spark_schema
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(2, 200, 2000)], sch3).coalesce(1)
    ).commit()
    f3 = t.metadata.spark_schema.fields
    t = t.commit_schema(
        StructType(
            list(f3[:2]) + [StructField("b", f3[2].dataType, True, f3[2].metadata)]
        )
    )                                                         # y -> b
    t = t.commit_schema(
        StructType(
            list(t.metadata.spark_schema.fields) + [StructField("y", LongType(), True)]
        )
    )                                                         # add y (3rd owner)
    sch5 = t.metadata.spark_schema
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(3, 300, 3000, 30000)], sch5).coalesce(1)
    ).commit()

    got = {r.id: (r.a, r.b, r.y) for r in t.to_df(spark).collect()}
    assert got == {
        1: (100, None, None),
        2: (200, 2000, None),
        3: (300, 3000, 30000),
    }, "three-owner name recycling misattributed a cohort's bytes"


def test_recycled_entry_label_tuple_matching(catalog, spark):
    """r8: recycled PARTITION-ENTRY labels. rename d->e rewrites the spec
    entry day(d)->day(e); a NEW column d later becomes a spec source with
    the same entry string day(d); the spec then flips back to day(e).
    The unscoped multi-spelling match read the NEW column's day(d) tuples
    as historical values of day(e) and wrongly EXCLUDED files from
    e-filtered reads (lost rows). Seq-scoped labels must: keep the new
    cohort superset-safe for e-queries, keep old-cohort pruning exact,
    and keep new-entry pruning exact on the new cohort."""
    import datetime as dt

    from pyspark.sql.types import DateType

    S1 = StructType(
        [
            StructField("id", LongType(), True, {FIELD_ID_KEY: 1}),
            StructField("d", DateType(), True, {FIELD_ID_KEY: 2}),
        ]
    )
    t = catalog.create_table(
        TableIdentifier.parse("rn.recycle_entry"), S1, partition_by=["day(d)"]
    )
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(1, dt.date(2024, 1, 1))], S1).coalesce(1)
    ).commit()
    S2 = StructType(
        [
            StructField("id", LongType(), True, {FIELD_ID_KEY: 1}),
            StructField("e", DateType(), True, {FIELD_ID_KEY: 2}),
        ]
    )
    t = t.commit_schema(S2)                                  # d -> e
    t = t.commit_schema(StructType(list(S2.fields) + [StructField("d", DateType(), True)]))
    t = t.commit_partition_spec(["day(d)"])                  # NEW d is the source
    sch = t.metadata.spark_schema
    # new-cohort file: e matches the query day, new d is months away
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame(
            [(2, dt.date(2024, 1, 1), dt.date(2024, 6, 1))], sch
        ).coalesce(1)
    ).commit()
    t_mid = t  # spec still day(new d): d-queries prune here
    t = t.commit_partition_spec(["day(e)"])                  # flip back to e

    # every rename record is seq-scoped from r8 on
    assert all(
        "as-of-seq" in r
        for r in t.metadata.properties["partition-entry-renames"]
    )

    # e-query: BOTH files contain e=2024-01-01 — pre-fix the new file was
    # wrongly excluded (its day(d) tuple misread as an e value)
    q = dt.date(2024, 1, 1)
    planned = t.planned_files_transformed({"e": q})
    assert len(planned) == 2, "recycled-label tuple misread excluded a file"
    n = (
        t.to_df(spark, transformed_filter={"e": q})
        .filter(F.col("e") == F.lit(q))
        .count()
    )
    assert n == 2

    # non-matching e-day: old cohort excluded exactly, new cohort kept
    # superset-safe (its tuples carry no e label)
    assert len(t.planned_files_transformed({"e": dt.date(2023, 12, 25)})) == 1

    # range planner, same hazard: e BETWEEN spanning only the query day
    rng = t.planned_files_transformed_range(
        "e", dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 1, 23, 59)
    )
    assert len(rng) == 2

    # d-queries under the day(new-d) spec (before the flip-back): the new
    # cohort prunes exactly by its tuple; the old cohort's day(d) label is
    # foreign-owned at its seq -> treated as ABSENT -> kept superset-safe
    # (never compared against the new column's transform value)
    assert len(t_mid.planned_files_transformed({"d": dt.date(2024, 6, 1)})) == 2
    assert len(t_mid.planned_files_transformed({"d": dt.date(2024, 1, 1)})) == 1
    # ... and reading that plan finds no rows (d is NULL in the old cohort)
    assert (
        t_mid.to_df(spark, transformed_filter={"d": dt.date(2024, 1, 1)})
        .filter(F.col("d") == F.lit(dt.date(2024, 1, 1)))
        .count()
        == 0
    )
    # after the flip-back, d has no spec coverage: every file plans
    assert len(t.planned_files_transformed({"d": dt.date(2024, 6, 1)})) == 2
