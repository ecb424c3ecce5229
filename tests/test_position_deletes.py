"""$position_deletes metadata table (r15, VERDICT r14 missing #5): the
per-row content behind $delete_files — positional parquet and v3 DV
sources fold uniformly; positions join back to the exact deleted rows;
time travel pins the artifact form of the snapshot."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.catalog.catalog import (
    PostgresCatalog,
    TableIdentifier,
)
from iceberg_catalog_postgres_spark.catalog.merge_sql import execute_dml


@pytest.fixture
def catalog(tmp_path):
    cat = PostgresCatalog.connect("posdel", None, str(tmp_path / "wh"))
    cat.initialize()
    yield cat
    cat.backend.close()


def _seed(catalog, spark, name="pd.t"):
    df = spark.createDataFrame(
        [(i, f"n{i}", i % 3) for i in range(30)], "k long, name string, r long"
    )
    t = catalog.create_table(
        TableIdentifier.parse(name), df.schema, partition_by=["r"]
    )
    return t.new_transaction().append_dataframe(df.coalesce(1)).commit()


def test_position_deletes_parquet_dv_and_joinback(catalog, spark):
    t = _seed(catalog, spark)
    sid0 = t.metadata.current_snapshot().snapshot_id
    pos = (
        t.to_df(spark, with_scan_identity=True)
        .filter(F.col("k").isin(7, 8, 20))
        .select(F.col("__mfile").alias("file_path"),
                F.col("__mpos").alias("row_index"))
        .coalesce(1)
    )
    t = t.new_transaction().delete_positions_dataframe(pos).commit()
    sid1 = t.metadata.current_snapshot().snapshot_id

    rows = execute_dml(
        spark, catalog, "SELECT * FROM pd.t$position_deletes"
    ).collect()
    assert len(rows) == 3
    assert {r.source_type for r in rows} == {"position-deletes"}
    parquet_set = {(r.file_path, r.pos) for r in rows}

    # join back: positions identify EXACTLY the deleted keys (read the
    # pre-delete snapshot with scan identity and match file+pos)
    base = t.to_df(spark, snapshot_id=sid0, with_scan_identity=True)
    store = catalog.object_store()
    root = store.resolve("").rstrip("/")
    norm = F.regexp_replace(F.col("__mfile"), "^file:", "")
    base = base.withColumn(
        "__rel",
        F.when(norm.startswith(root + "/"),
               norm.substr(F.lit(len(root) + 2), F.length(norm))).otherwise(norm),
    )
    pd_df = execute_dml(spark, catalog, "SELECT * FROM pd.t$position_deletes")
    joined = base.join(
        pd_df,
        (base["__rel"] == pd_df["file_path"]) & (base["__mpos"] == pd_df["pos"]),
    )
    assert sorted(r.k for r in joined.collect()) == [7, 8, 20]

    # convert to DVs: same positions, source flips, travel pins the past
    execute_dml(
        spark, catalog,
        "CALL system.rewrite_position_deletes_to_dvs('pd.t')",
    )
    rows = execute_dml(
        spark, catalog, "SELECT * FROM pd.t$position_deletes"
    ).collect()
    assert len(rows) == 3
    assert {r.source_type for r in rows} == {"deletion-vector"}
    assert {(r.file_path, r.pos) for r in rows} == parquet_set
    assert all(r.delete_file.endswith(".puffin") or "puffin" in r.delete_file
               for r in rows)
    # travel to the parquet-form snapshot
    rows = execute_dml(
        spark, catalog,
        f"SELECT source_type, count(*) AS n FROM pd.t$position_deletes "
        f"FOR VERSION AS OF {sid1} GROUP BY source_type",
    ).collect()
    assert [(r.source_type, r.n) for r in rows] == [("position-deletes", 3)]
    # pre-delete snapshot: empty
    assert execute_dml(
        spark, catalog,
        f"SELECT * FROM pd.t$position_deletes FOR VERSION AS OF {sid0}",
    ).count() == 0
    # and the read is exact through both forms
    got = sorted(r.k for r in t.to_df(spark).collect())
    assert got == [i for i in range(30) if i not in (7, 8, 20)]


def test_all_delete_files_and_all_entries(catalog, spark):
    """r15: the remaining `all_*` family — delete artifacts and file
    entries across EVERY retained snapshot, with first-snapshot
    attribution and liveness."""
    t = _seed(catalog, spark)  # 30 rows / 3 files (r partition)
    s1 = t.metadata.current_snapshot().snapshot_id
    # eq-delete then convert to DVs: two artifact generations
    t = (
        t.new_transaction()
        .delete_keys_dataframe(
            spark.createDataFrame([(7,), (8,)], "k long").coalesce(1)
        )
        .commit()
    )
    s2 = t.metadata.current_snapshot().snapshot_id
    execute_dml(
        spark, catalog,
        "CALL system.rewrite_equality_deletes('pd.t', to_dv => true)",
    )
    t = catalog.load_table(TableIdentifier.parse("pd.t"))
    rows = execute_dml(
        spark, catalog, "SELECT * FROM pd.t$all_delete_files"
    ).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.type, []).append(r)
    # the eq parquet is retained history (not live); the DVs are live
    assert len(by_type["equality-deletes"]) == 1
    assert by_type["equality-deletes"][0].is_live is False
    assert by_type["equality-deletes"][0].first_snapshot_id == s2
    dvs = by_type["deletion-vector"]
    assert dvs and all(r.is_live for r in dvs)
    assert sum(r.cardinality for r in dvs) == 2
    assert all(r.referenced_data_file for r in dvs)
    # all_entries: ADDED rows at s1 = the 3 original files; every later
    # snapshot carries them as EXISTING (status 0)
    ent = execute_dml(
        spark, catalog, "SELECT * FROM pd.t$all_entries"
    ).collect()
    added_s1 = [
        e for e in ent if e.snapshot_id == s1 and e.status == 1
        and e.kind == "data"
    ]
    assert len(added_s1) == 3
    carried = [
        e for e in ent if e.snapshot_id != s1 and e.kind == "data"
        and e.status == 0
    ]
    assert len(carried) >= 6  # 3 files x (>=2 later snapshots)
    assert {e.kind for e in ent} >= {"data", "eq-delete"}
    # unknown-suffix refusal still lists the grown family
    with pytest.raises(ValueError, match="all_entries"):
        execute_dml(spark, catalog, "SELECT * FROM pd.t$bogus")


def test_all_files_unifies_data_and_deletes(catalog, spark):
    """r16: $all_files = the all_* family as ONE relation with Iceberg's
    content ids (0 data, 1 positional/DV, 2 equality) — exactly the
    union of $all_data_files and $all_delete_files, consistent with
    both on count, liveness, and per-content attribution."""
    t = _seed(catalog, spark, name="pd.af")
    t = (
        t.new_transaction()
        .delete_keys_dataframe(
            spark.createDataFrame([(3,), (4,)], "k long").coalesce(1)
        )
        .commit()
    )
    execute_dml(
        spark, catalog,
        "CALL system.rewrite_equality_deletes('pd.af', to_dv => true)",
    )
    rows = execute_dml(
        spark, catalog, "SELECT * FROM pd.af$all_files"
    ).collect()
    n_data = execute_dml(
        spark, catalog, "SELECT count(*) AS n FROM pd.af$all_data_files"
    ).first().n
    n_del = execute_dml(
        spark, catalog, "SELECT count(*) AS n FROM pd.af$all_delete_files"
    ).first().n
    assert len(rows) == n_data + n_del > 0
    by_content = {}
    for r in rows:
        by_content.setdefault(r.content, 0)
        by_content[r.content] += 1
    assert by_content.get(0) == n_data
    assert sum(v for c, v in by_content.items() if c != 0) == n_del
    assert {0, 2} <= set(by_content)  # data + the eq-delete generation
    assert any(r.type == "deletion-vector" for r in rows)  # converted
    # joins against the data side work in one statement
    joined = execute_dml(
        spark, catalog,
        "SELECT count(*) AS n FROM pd.af$all_files WHERE is_live",
    ).first().n
    assert 0 < joined <= len(rows)
