"""Regression tests for the r5 ADVICE defects (maintenance/table edge cases):
empty-table vacuum, changelog duplicate-delete emission, z-order NULL range.
(The NDV delta-only fix is covered in test_ndv.py; the bucket-hash
canonicalization fix in test_partition_transforms.py.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from iceberg_catalog_postgres_spark.catalog.catalog import (
    PostgresCatalog,
    TableIdentifier,
)
from iceberg_catalog_postgres_spark.catalog.maintenance import vacuum


@pytest.fixture(params=["sqlite", "postgres"])
def catalog(request, tmp_path):
    """Both backends, like test_catalog.py — the torn-writer fault semantics
    must hold against the real CAS implementation too."""
    if request.param == "postgres":
        import uuid as _uuid

        url = request.getfixturevalue("pg_url")
        cat = PostgresCatalog.connect(
            f"adv_{_uuid.uuid4().hex[:10]}", url, str(tmp_path / "warehouse")
        )
    else:
        cat = PostgresCatalog.connect("advice_cat", None, str(tmp_path / "warehouse"))
    cat.initialize()
    yield cat
    cat.backend.close()


S = StructType(
    [StructField("k", LongType(), True), StructField("v", LongType(), True)]
)


def test_vacuum_empty_table_is_noop(catalog, spark):
    """A scheduler vacuuming every table must not crash on one that was
    created but never written (no snapshots -> no current_snapshot)."""
    t = catalog.create_table(TableIdentifier.parse("adv.empty"), S)
    t2, report = vacuum(t)
    assert t2.metadata.current_snapshot() is None
    assert report["manifest_chunks_consolidated"] == 0
    assert report["snapshots_expired"] == 0


def test_changelog_delete_emitted_once_for_keys_split_across_files(
    catalog, spark
):
    """A key whose rows land in MORE THAN ONE delete part file of the same
    snapshot (duplicate keys in the staged frame, split by repartition)
    must produce its 'delete' change exactly once — matching the read
    path's unioned anti-join."""
    t = catalog.create_table(TableIdentifier.parse("adv.cdc"), S)
    src = spark.createDataFrame([(i, i * 10) for i in range(20)], S)
    t = t.new_transaction().append_dataframe(src.coalesce(1)).commit()
    from_id = t.metadata.current_snapshot_id

    # Key 7 staged in TWO separate delete frames of the SAME transaction:
    # each frame becomes its own non-empty delete part file, so 7's copies
    # genuinely land in different files (the r8 empty-part-file drop made
    # the old repartition(3) construction vacuous — round-robin put all
    # rows in one file and the >1 precondition was met only by the
    # schema-only empties that are now, correctly, dropped pre-commit).
    k1 = spark.createDataFrame([(7,), (3,)], "k long").coalesce(1)
    k2 = spark.createDataFrame([(7,), (5,)], "k long").coalesce(1)
    t = (
        t.new_transaction()
        .delete_keys_dataframe(k1)
        .delete_keys_dataframe(k2)
        .commit()
    )
    snap = t.metadata.current_snapshot()
    assert len(snap.delete_files) >= 2
    # every committed delete file is non-empty, and key 7 appears in >=2
    store = catalog.object_store()
    files_with_7 = 0
    for f in snap.delete_files:
        rows = [r["k"] for r in spark.read.parquet(store.resolve(f)).collect()]
        assert len(rows) > 0  # the drop rule keeps only real files
        if 7 in rows:
            files_with_7 += 1
    assert files_with_7 >= 2

    changes = t.changelog_df(spark, from_id).filter(
        F.col("_change_type") == "delete"
    )
    got = sorted(r["k"] for r in changes.collect())
    assert got == [3, 5, 7]  # each removed row exactly once

    # and the read path agrees on the final state
    remaining = sorted(r["k"] for r in t.to_df(spark).collect())
    assert remaining == [i for i in range(20) if i not in (3, 5, 7)]


def test_zorder_write_with_all_null_column_falls_back(catalog, spark):
    """zorder_by with an all-NULL column (min/max None) must degrade to a
    working write, not raise TypeError on float(None)."""
    t = catalog.create_table(TableIdentifier.parse("adv.znull"), S)
    df = spark.createDataFrame([(i, None) for i in range(10)], S)
    t = t.new_transaction().append_dataframe(df, zorder_by=["k", "v"]).commit()
    assert sorted(r["k"] for r in t.to_df(spark).collect()) == list(range(10))


def test_zorder_three_columns_write_and_prune(catalog, spark):
    """r9: zorder_by generalized past 2 columns — a 3-column Morton write
    (bits shrink to 63//3 per dim) keeps every row and yields bounds
    tight enough that a range query on EACH dimension prunes files."""
    from pyspark.sql.types import LongType, StructField, StructType

    Z3 = StructType(
        [
            StructField("a", LongType(), True),
            StructField("b", LongType(), True),
            StructField("c", LongType(), True),
        ]
    )
    t = catalog.create_table(TableIdentifier.parse("adv.z3"), Z3)
    rows = [(i, (i * 37) % 256, (i * 101) % 256) for i in range(2048)]
    t = (
        t.new_transaction()
        .append_dataframe(
            spark.createDataFrame(rows, Z3), zorder_by=["a", "b", "c"], n_files=8
        )
        .commit()
    )
    assert sorted(r["a"] for r in t.to_df(spark).collect()) == list(range(2048))
    n_all = len(t.metadata.current_data_files())
    assert n_all > 1
    for col in ("a", "b", "c"):
        planned = t.planned_files(col, 0, 31, require_stats=True)
        assert 0 < len(planned) < n_all, (
            f"z-order bounds on {col} did not prune ({len(planned)}/{n_all})"
        )


def test_zorder_write_empty_frame(catalog, spark):
    t = catalog.create_table(TableIdentifier.parse("adv.zempty"), S)
    df = spark.createDataFrame([], S)
    t = t.new_transaction().append_dataframe(df, zorder_by=["k", "v"]).commit()
    assert t.to_df(spark).count() == 0


def test_torn_writer_orphan_invisible_and_reclaimed(catalog, spark):
    """CAS fault injection — the orphan the reference's TODO (mod.rs:164)
    leaves behind: a writer killed BETWEEN the metadata-JSON put and the
    CAS UPDATE leaves staged data files + a dangling metadata document.
    Contract: (1) readers never see the torn state (the pointer never
    moved); (2) the staged data files are reclaimed by
    remove_orphan_files; (3) the dangling metadata JSON ages out of
    remove_old_metadata_files' retention window. VACUUM = both janitors."""
    import glob
    import os

    from iceberg_catalog_postgres_spark.catalog.maintenance import (
        remove_old_metadata_files,
        remove_orphan_files,
    )

    t = catalog.create_table(TableIdentifier.parse("adv.torn"), S)
    src = spark.createDataFrame([(i, i) for i in range(10)], S)
    t = t.new_transaction().append_dataframe(src.coalesce(1)).commit()
    store = catalog.object_store()
    data_root = store.resolve(t.metadata.location + "/data")
    meta_root = store.resolve(t.metadata.location + "/metadata")
    files_before = set(glob.glob(os.path.join(data_root, "**", "*.parquet"), recursive=True))
    metas_before = set(glob.glob(os.path.join(meta_root, "*.metadata.json")))

    # writer killed between store.put(metadata) and the CAS UPDATE
    killed = {"n": 0}
    real_update = catalog.update_table

    def dying_update(*a, **k):
        killed["n"] += 1
        raise RuntimeError("writer killed mid-commit")

    catalog.update_table = dying_update
    try:
        with pytest.raises(RuntimeError, match="killed mid-commit"):
            t.new_transaction().append_dataframe(
                spark.createDataFrame([(100, 100)], S).coalesce(1)
            ).commit()
    finally:
        catalog.update_table = real_update
    assert killed["n"] == 1

    torn_data = set(glob.glob(os.path.join(data_root, "**", "*.parquet"), recursive=True)) - files_before
    torn_meta = set(glob.glob(os.path.join(meta_root, "*.metadata.json"))) - metas_before
    assert torn_data and torn_meta  # the fault really left both behind

    # (1) invisible to readers: fresh load sees only the committed snapshot
    t2 = catalog.load_table(TableIdentifier.parse("adv.torn"))
    assert len(t2.metadata.snapshots) == 1
    assert t2.to_df(spark).count() == 10

    # (2) staged data files reclaimed by orphan GC (age gate opted out)
    rep = remove_orphan_files(t2, older_than_s=0.0)
    assert rep["n_orphans_deleted"] >= len(torn_data)
    left = set(glob.glob(os.path.join(data_root, "**", "*.parquet"), recursive=True))
    assert not (left & torn_data)
    assert t2.to_df(spark).count() == 10  # committed data untouched

    # (3) the dangling metadata doc ages out of the retention window
    for i in range(3):
        t2 = t2.new_transaction().append_dataframe(
            spark.createDataFrame([(200 + i, 0)], S).coalesce(1)
        ).commit()
    remove_old_metadata_files(t2, keep_last=2)
    metas_left = set(glob.glob(os.path.join(meta_root, "*.metadata.json")))
    assert not (metas_left & torn_meta)
    # and the table still loads and reads after both janitors
    t3 = catalog.load_table(TableIdentifier.parse("adv.torn"))
    assert t3.to_df(spark).count() == 13
