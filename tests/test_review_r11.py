"""Regression tests for the r11 self-review findings: NULL-key MERGE
cardinality, offset anchors under consumed-prefix expiry, per-ref
retention validation, NMBS set-all rejection, row_delta pre-write
validation, and the v3 partitioned-DV export refusal."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.catalog.catalog import (
    PostgresCatalog,
    TableIdentifier,
)
from iceberg_catalog_postgres_spark.catalog.maintenance import merge_into


@pytest.fixture
def catalog(tmp_path):
    cat = PostgresCatalog.connect("rev11", None, str(tmp_path / "wh"))
    cat.initialize()
    yield cat
    cat.backend.close()


def test_merge_cardinality_guard_null_keys(catalog, spark):
    """Two NULL-key source rows matching one NULL-key target row must hit
    the cardinality guard — the merge join is eqNullSafe, so a null-unsafe
    guard would let them silently duplicate the target row."""
    df = spark.createDataFrame([(None, "t0"), (1, "t1")], "k long, v string")
    t = catalog.create_table(TableIdentifier.parse("r.nk"), df.schema)
    t = t.new_transaction().append_dataframe(df).commit()
    dup = spark.createDataFrame(
        [(None, "a"), (None, "b")], "k long, v string"
    )
    with pytest.raises(ValueError, match="cardinality"):
        merge_into(
            spark, t, dup, on=["k"],
            when_matched=[{"action": "update", "set": "all"}],
        )


def test_merge_rejects_set_all_on_not_matched_by_source(catalog, spark):
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    t = catalog.create_table(TableIdentifier.parse("r.sa"), df.schema)
    t = t.new_transaction().append_dataframe(df).commit()
    src = spark.createDataFrame([(2, "b")], "k long, v string")
    with pytest.raises(ValueError, match="cannot use set: 'all'"):
        merge_into(
            spark, t, src, on=["k"],
            when_not_matched_by_source=[{"action": "update", "set": "all"}],
        )


def test_set_ref_rejects_nonpositive_retention(catalog, spark):
    df = spark.createDataFrame([(1,)], "k long")
    t = catalog.create_table(TableIdentifier.parse("r.rt"), df.schema)
    t = t.new_transaction().append_dataframe(df).commit()
    with pytest.raises(ValueError, match=">= 1"):
        t.set_ref("b", ref_type="branch", min_snapshots_to_keep=0)
    with pytest.raises(ValueError, match=">= 1"):
        t.set_ref("b", ref_type="branch", max_snapshot_age_ms=-5)
    with pytest.raises(ValueError, match=">= 1"):
        t.set_ref("x", ref_type="tag", max_ref_age_ms=0)


def test_row_delta_validates_positions_before_writing(catalog, spark):
    """A malformed positions frame raises BEFORE any parquet is written —
    no orphan data files from a failed call."""
    import glob
    import os

    df = spark.createDataFrame([(1, "a")], "k long, v string")
    t = catalog.create_table(TableIdentifier.parse("r.rd"), df.schema)
    t = t.new_transaction().append_dataframe(df).commit()
    root = catalog.object_store().resolve(t.metadata.location)
    files_before = set(glob.glob(os.path.join(root, "data", "**", "*.parquet"), recursive=True))
    bad = spark.createDataFrame([("x", 0)], "path string, idx long")
    with pytest.raises(ValueError, match="file_path, row_index"):
        t.new_transaction().row_delta(df, bad)
    files_after = set(glob.glob(os.path.join(root, "data", "**", "*.parquet"), recursive=True))
    assert files_after == files_before, "failed row_delta left orphan files"


def test_avro_v3_refuses_partitioned_dv_tables(catalog, spark):
    """DVs are position deletes: exporting them under the unpartitioned
    delete spec of a PARTITIONED table would let a spec-compliant planner
    prune them away (phantom rows) — refuse, like v2 pos-deletes."""
    from iceberg_catalog_postgres_spark.catalog.avro_export import (
        export_iceberg_avro,
    )

    df = spark.createDataFrame([(i, i % 2) for i in range(10)], "k long, r long")
    t = catalog.create_table(
        TableIdentifier.parse("r.pdv"), df.schema, partition_by=["r"]
    )
    t = t.new_transaction().append_dataframe(df.coalesce(1)).commit()
    pos = (
        t.to_df(spark)
        .withColumn("file_path", F.col("_metadata.file_path"))
        .withColumn("row_index", F.col("_metadata.row_index"))
        .where(F.col("k") < 2)
        .select("file_path", "row_index")
    )
    t = t.new_transaction().delete_positions_dv(pos).commit()
    with pytest.raises(ValueError, match="partition"):
        export_iceberg_avro(spark, t, format_version=3)


def test_stream_offset_anchor_detects_prefix_expiry(spark, tmp_path):
    """expire_snapshots removing CONSUMED snapshots shifts count-based
    offsets; the anchor (last_seq) makes the reader fail loudly instead of
    silently skipping unconsumed commits."""
    from iceberg_catalog_postgres_spark.catalog.maintenance import (
        expire_snapshots,
    )
    from iceberg_catalog_postgres_spark.sources.catalog_datasource import (
        CatalogCommitsParallelStreamReader,
        CatalogCommitsStreamReader,
    )

    db = str(tmp_path / "oa.db")
    wh = str(tmp_path / "oa_wh")
    cat = PostgresCatalog.connect("oanch", f"sqlite://{db}", wh)
    cat.initialize()
    src = spark.createDataFrame(
        [(i, f"n{i}", i % 3) for i in range(6)],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    t = cat.create_table(TableIdentifier.parse("oanch.nation"), src.schema)
    for lo in (0, 2, 4):
        t = t.new_transaction().append_dataframe(
            src.where(F.col("n_nationkey").between(lo, lo + 1)).coalesce(1)
        ).commit()
        t = cat.load_table(t.identifier)

    opts = {"db": db, "warehouse": wh, "ident": "oanch.nation", "catalog": "oanch"}
    reader = CatalogCommitsStreamReader(dict(opts))
    rows, off = reader.read(reader.initialOffset())
    assert off["n_snapshots"] == 3 and off["last_seq"] == 3
    # two more commits, then expiry drops the consumed prefix: the chain
    # is still >= 3 long, but position 3 now anchors a DIFFERENT snapshot
    for lo in (0, 2):
        t = t.new_transaction().append_dataframe(
            src.where(F.col("n_nationkey").between(lo, lo + 1)).coalesce(1)
        ).commit()
    t = expire_snapshots(t, keep_last=3)
    assert len(t.metadata.snapshots) == 3
    with pytest.raises(ValueError, match="no longer anchors"):
        reader.read(off)
    with pytest.raises(ValueError, match="no longer anchors"):
        reader.readBetweenOffsets(off, {"n_snapshots": 3, "last_seq": 5})
    preader = CatalogCommitsParallelStreamReader(dict(opts))
    with pytest.raises(ValueError, match="no longer anchors"):
        preader.partitions(off, {"n_snapshots": 3})
    # an offset anchored at the CURRENT chain's position still works
    snaps = sorted(t.metadata.snapshots, key=lambda s: s.sequence_number)
    good = {"n_snapshots": 1, "last_seq": snaps[0].sequence_number}
    rows2, off2 = reader.read(good)
    assert off2["n_snapshots"] == 3
    cat.backend.close()
