"""Regression tests for the r10 ADVICE findings (fixed in r11):

1. CDC streams double-emitting deletes when an eq->DV conversion (or any DV
   commit overlapping rows already equality-deleted) follows an
   equality-delete commit — the batch changelog_df's semi-join against the
   parent state never double-emits; the streams now subtract eq-covered
   positions too (and short-circuit on the conversion tag).
2. incremental_df reading delta files with the END snapshot's file_seqs: a
   later in-range lineage-preserving compaction removes those files from
   the final set, the seq fallback hits 0, and a renamed column resolves
   pre-rename physical names -> silent NULLs.
3. The overwrite commit minting fresh first_row_ids (and dropping deletion
   vectors) for files CARRIED byte-identical through overwrite_files —
   breaking v3 id stability and resurrecting deleted rows.
4. _DV_EXECUTOR_CACHE growing without bound per executor process.
5. _bounded_hi silently mis-reading when the snapshot chain shrank below a
   consumed stream offset (expire_snapshots under a live stream).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from iceberg_catalog_postgres_spark.catalog.catalog import (
    PostgresCatalog,
    TableIdentifier,
)
from iceberg_catalog_postgres_spark.catalog.metadata import FIELD_ID_KEY


@pytest.fixture
def catalog(tmp_path):
    cat = PostgresCatalog.connect("advr10", None, str(tmp_path / "wh"))
    cat.initialize()
    yield cat
    cat.backend.close()


def _positions(t, spark, predicate):
    return (
        t.to_df(spark)
        .withColumn("file_path", F.col("_metadata.file_path"))
        .withColumn("row_index", F.col("_metadata.row_index"))
        .where(predicate)
        .select("file_path", "row_index")
    )


# ---------------------------------------------------------------------------
# 1. CDC streams: eq-delete -> DV interactions emit each delete exactly once
# ---------------------------------------------------------------------------


def _nation_table(spark, tmp_path, name):
    db = str(tmp_path / f"{name}.db")
    wh = str(tmp_path / f"{name}_wh")
    cat = PostgresCatalog.connect(name, f"sqlite://{db}", wh)
    cat.initialize()
    src = spark.createDataFrame(
        [(i, f"n{i}", i % 5) for i in range(12)],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    t = cat.create_table(TableIdentifier.parse(f"{name}.nation"), src.schema)
    t = t.new_transaction().append_dataframe(src.coalesce(1)).commit()
    return cat, t, {"db": db, "warehouse": wh, "ident": f"{name}.nation", "catalog": name}


def test_cdc_stream_eq_to_dv_conversion_emits_once(spark, tmp_path):
    """eq-delete commit emits the key-only deletes; the eq->DV conversion
    commit (rewrite_equality_deletes to_dv=True) emits NOTHING — before the
    fix both stream readers re-emitted the same rows as DV deltas."""
    from iceberg_catalog_postgres_spark.catalog.maintenance import (
        rewrite_equality_deletes,
    )
    from iceberg_catalog_postgres_spark.sources.catalog_datasource import (
        CatalogChangelogParallelStreamReader,
        CatalogChangelogStreamReader,
    )

    cat, t, opts = _nation_table(spark, tmp_path, "eqdv")
    keys = spark.createDataFrame([(0,), (1,)], "n_nationkey long").coalesce(1)
    t = t.new_transaction().delete_keys_dataframe(keys).commit()
    t = rewrite_equality_deletes(spark, t, to_dv=True)
    assert t.metadata.current_deletion_vectors(), "conversion produced no DV"

    reader = CatalogChangelogStreamReader(dict(opts))
    rows, end = reader.read(reader.initialOffset())
    assert end["n_snapshots"] == 3
    dels = [r for r in rows if r[3] == "delete"]
    # exactly once per key (the eq commit's key-only rows), nothing from
    # the conversion commit
    assert sorted(r[0] for r in dels) == [0, 1]
    assert all(r[4] == 2 for r in dels), "delete emitted outside the eq commit"

    preader = CatalogChangelogParallelStreamReader(dict(opts))
    parts = preader.partitions({"n_snapshots": 0}, {"n_snapshots": 3})
    prows = [r for p in parts for r in preader.read(p)]
    pdels = [r for r in prows if r[3] == "delete"]
    assert sorted(r[0] for r in pdels) == [0, 1]
    assert all(r[4] == 2 for r in pdels)
    cat.backend.close()


def test_cdc_stream_dv_overlapping_prior_eq_delete(spark, tmp_path):
    """General form (no conversion tag): a DV commit whose positions include
    a row an EARLIER eq-delete already removed emits only the genuinely-new
    rows — matching the batch changelog's parent-state semi-join."""
    from iceberg_catalog_postgres_spark.sources.catalog_datasource import (
        CatalogChangelogParallelStreamReader,
        CatalogChangelogStreamReader,
    )

    cat, t, opts = _nation_table(spark, tmp_path, "eqdvg")
    # capture positions of keys 0..2 BEFORE the eq delete hides key 0
    pos = _positions(t, spark, F.col("n_nationkey") < 3).collect()
    keys = spark.createDataFrame([(0,)], "n_nationkey long").coalesce(1)
    t = t.new_transaction().delete_keys_dataframe(keys).commit()
    pos_df = spark.createDataFrame(pos, "file_path string, row_index long")
    t = t.new_transaction().delete_positions_dv(pos_df).commit()

    reader = CatalogChangelogStreamReader(dict(opts))
    rows, _ = reader.read(reader.initialOffset())
    dels = [(r[0], r[4]) for r in rows if r[3] == "delete"]
    # key 0 once (eq commit, seq 2); keys 1,2 once (DV commit, seq 3)
    assert sorted(dels) == [(0, 2), (1, 3), (2, 3)]

    preader = CatalogChangelogParallelStreamReader(dict(opts))
    parts = preader.partitions({"n_snapshots": 0}, {"n_snapshots": 3})
    prows = [r for p in parts for r in preader.read(p)]
    assert sorted((r[0], r[4]) for r in prows if r[3] == "delete") == [
        (0, 2),
        (1, 3),
        (2, 3),
    ]
    cat.backend.close()


# ---------------------------------------------------------------------------
# 2. incremental_df: delta-file seqs from the ADDING snapshot
# ---------------------------------------------------------------------------


def _ids(names):
    return StructType(
        [
            StructField(n, LongType(), True, {FIELD_ID_KEY: i + 1})
            for i, n in enumerate(names)
        ]
    )


def test_incremental_df_rename_then_compaction(catalog, spark):
    """Append -> rename -> append -> lineage-preserving compaction: the
    incremental range's delta file is gone from the final file set, so
    before the fix its seq fell back to 0 and the rename-aware reader
    resolved the PRE-rename physical name -> silent NULL column."""
    from iceberg_catalog_postgres_spark.catalog.maintenance import compact_table

    df1 = spark.createDataFrame([(1, 10), (2, 20)], _ids(["id", "amount"]))
    t = catalog.create_table(TableIdentifier.parse("inc.t"), df1.schema)
    t = t.new_transaction().append_dataframe(df1.coalesce(1)).commit()
    from_id = t.metadata.current_snapshot_id
    t = t.commit_schema(_ids(["id", "amount_usd"]))
    df2 = spark.createDataFrame([(3, 30), (4, 40)], _ids(["id", "amount_usd"]))
    t = t.new_transaction().append_dataframe(df2.coalesce(1)).commit()
    t = compact_table(spark, t, preserve_lineage=True)

    got = {
        r.id: r.amount_usd
        for r in t.incremental_df(spark, from_id).collect()
    }
    assert got == {3: 30, 4: 40}, f"renamed column lost values: {got}"


# ---------------------------------------------------------------------------
# 3. overwrite_files carrying byte-identical files keeps lineage + DVs
# ---------------------------------------------------------------------------


def test_overwrite_files_carries_lineage_and_dvs(catalog, spark):
    df = spark.createDataFrame(
        [(i, f"u{i}") for i in range(40)], "k long, u string"
    )
    t = catalog.create_table(TableIdentifier.parse("ow.t"), df.schema)
    t = t.new_transaction().append_dataframe(df.repartition(2)).commit()
    t = t.new_transaction().delete_positions_dv(
        _positions(t, spark, F.col("k") < 5)
    ).commit()
    before_ids = {
        r.k: r._row_id
        for r in t.to_df(spark, with_row_lineage=True).collect()
    }
    dvs_before = t.metadata.current_deletion_vectors()
    assert dvs_before and sorted(before_ids) == list(range(5, 40))

    # carry every current file byte-identical through an overwrite commit
    t = (
        t.new_transaction()
        .overwrite_files(list(t.metadata.current_data_files()))
        .commit()
    )
    after_ids = {
        r.k: r._row_id
        for r in t.to_df(spark, with_row_lineage=True).collect()
    }
    assert after_ids == before_ids, "carried files' _row_id changed"
    assert t.metadata.current_deletion_vectors() == dvs_before, (
        "carried files' deletion vectors dropped — deleted rows resurrected"
    )
    assert sorted(r.k for r in t.to_df(spark).collect()) == list(range(5, 40))


# ---------------------------------------------------------------------------
# 4. executor DV cache is LRU-bounded
# ---------------------------------------------------------------------------


def test_dv_executor_cache_lru_bounded():
    from iceberg_catalog_postgres_spark.catalog import table as table_mod

    table_mod._DV_EXECUTOR_CACHE.clear()
    cap = table_mod._DV_EXECUTOR_CACHE_MAX
    for i in range(cap + 30):
        table_mod._dv_cache_put((f"sidecar-{i}", 0), i)
    assert len(table_mod._DV_EXECUTOR_CACHE) == cap
    # oldest evicted, newest retained
    assert table_mod._dv_cache_get(("sidecar-0", 0)) is None
    assert table_mod._dv_cache_get((f"sidecar-{cap + 29}", 0)) == cap + 29
    # a get() refreshes recency: touch the current LRU head, insert one
    # more, and the touched key survives while the next-oldest is evicted
    head = next(iter(table_mod._DV_EXECUTOR_CACHE))
    table_mod._dv_cache_get(head)
    table_mod._dv_cache_put(("fresh", 0), -1)
    assert head in table_mod._DV_EXECUTOR_CACHE
    table_mod._DV_EXECUTOR_CACHE.clear()


# ---------------------------------------------------------------------------
# 5. _bounded_hi refuses a shrunken snapshot chain
# ---------------------------------------------------------------------------


def test_bounded_hi_raises_on_shrunk_chain():
    from iceberg_catalog_postgres_spark.sources.catalog_datasource import (
        _bounded_hi,
    )

    with pytest.raises(ValueError, match="shrank"):
        _bounded_hi([object()] * 3, 5, None, None)
    with pytest.raises(ValueError, match="shrank"):
        _bounded_hi([object()] * 3, 5, 10, None)
