"""Iceberg v3 deletion vectors (r10): roaring-bitmap positional deletes in
Puffin sidecars (catalog/dv.py), DV-vs-parquet read equivalence, the
conversion rewrites, supersede-union semantics under multiple commits,
changelog exactly-once, GC of unreferenced sidecars, and the v2 Avro
export's loud refusal."""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.catalog.catalog import (
    PostgresCatalog,
    TableIdentifier,
)
from iceberg_catalog_postgres_spark.catalog.dv import (
    deserialize_roaring64,
    dv_payload,
    parse_dv_payload,
    serialize_roaring64,
)


@pytest.fixture
def catalog(tmp_path):
    cat = PostgresCatalog.connect("dv_cat", None, str(tmp_path / "wh"))
    cat.initialize()
    yield cat
    cat.backend.close()


# ---------------------------------------------------------------------------
# codec
# ---------------------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**63 - 1), min_size=0, max_size=400
    )
)
def test_roaring64_roundtrip_random(vals):
    exp = np.unique(np.asarray(vals, dtype=np.uint64))
    assert np.array_equal(deserialize_roaring64(serialize_roaring64(vals)), exp)


@settings(max_examples=20, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**40),
    st.integers(min_value=1, max_value=70_000),
)
def test_roaring64_roundtrip_dense_run(start, length):
    """Dense ranges cross the array->bitmap container boundary (card 4096)
    and span multiple 16-bit keys."""
    pos = np.arange(start, start + length, dtype=np.uint64)
    assert np.array_equal(deserialize_roaring64(serialize_roaring64(pos)), pos)


def test_dv_payload_crc_rejects_corruption():
    pos = np.arange(1000, 9000, 3, dtype=np.uint64)
    payload = bytearray(dv_payload(pos))
    assert np.array_equal(parse_dv_payload(bytes(payload)), pos)
    payload[12] ^= 0x40
    with pytest.raises(ValueError, match="CRC|magic"):
        parse_dv_payload(bytes(payload))


def test_dv_payload_truncation_rejected():
    payload = dv_payload(np.arange(100, dtype=np.uint64))
    with pytest.raises(ValueError):
        parse_dv_payload(payload[: len(payload) // 2])


def test_run_container_reader():
    """We never WRITE run containers; a foreign bitmap may carry them."""
    import struct

    from iceberg_catalog_postgres_spark.catalog.dv import _deserialize_roaring32

    buf = (
        struct.pack("<I", 12347)  # run cookie, 1 container
        + b"\x01"  # run bitset: container 0 is runs
        + struct.pack("<HH", 5, 49)  # key=5, card=50
        + struct.pack("<H", 1)
        + struct.pack("<HH", 100, 49)  # one run: 100..149
    )
    vals, off = _deserialize_roaring32(buf, 0)
    exp = (np.uint32(5) << np.uint32(16)) + np.arange(100, 150, dtype=np.uint32)
    assert np.array_equal(vals, exp)
    assert off == len(buf)


# ---------------------------------------------------------------------------
# table integration
# ---------------------------------------------------------------------------


def _table(catalog, spark, name, n=200, parts=4):
    df = spark.createDataFrame(
        [(i, f"u{i % 7}") for i in range(n)], "k long, u string"
    )
    t = catalog.create_table(TableIdentifier.parse(f"s.{name}"), df.schema)
    return t.new_transaction().append_dataframe(df.repartition(parts)).commit()


def _positions(t, spark, predicate):
    return (
        t.to_df(spark)
        .withColumn("file_path", F.col("_metadata.file_path"))
        .withColumn("row_index", F.col("_metadata.row_index"))
        .where(predicate)
        .select("file_path", "row_index")
    )


def test_dv_delete_matches_parquet_positional_delete(catalog, spark):
    """The headline equivalence: the SAME predicate deleted via parquet
    positional files and via a deletion vector yields identical reads."""
    ta = _table(catalog, spark, "dva")
    tb = _table(catalog, spark, "dvb")
    pred = (F.col("k") % 3 == 0) | (F.col("k") < 20)
    ta = ta.new_transaction().delete_positions_dataframe(
        _positions(ta, spark, pred)
    ).commit()
    tb = tb.new_transaction().delete_positions_dv(_positions(tb, spark, pred)).commit()
    a = sorted(r["k"] for r in ta.to_df(spark).collect())
    b = sorted(r["k"] for r in tb.to_df(spark).collect())
    assert a == b and len(b) < 200
    assert tb.metadata.current_position_delete_files() == []
    assert len(tb.metadata.current_deletion_vectors()) >= 1


def test_dv_supersede_union_across_commits(catalog, spark):
    """Two DV commits touching the same files: the second vector is the
    UNION (supersedes), and reads reflect both deletes."""
    t = _table(catalog, spark, "dvu", n=100, parts=2)
    t = t.new_transaction().delete_positions_dv(
        _positions(t, spark, F.col("k") < 10)
    ).commit()
    t = t.new_transaction().delete_positions_dv(
        _positions(t, spark, F.col("k") >= 90)
    ).commit()
    got = sorted(r["k"] for r in t.to_df(spark).collect())
    assert got == list(range(10, 90))
    # at most ONE vector per file, and cardinalities cover both deletes
    dvs = t.metadata.current_deletion_vectors()
    assert sum(e["cardinality"] for e in dvs.values()) == 20


def test_rewrite_position_deletes_to_dvs_parity_and_time_travel(catalog, spark):
    from iceberg_catalog_postgres_spark.catalog.maintenance import (
        rewrite_position_deletes_to_dvs,
    )

    t = _table(catalog, spark, "dvc")
    t = t.new_transaction().delete_positions_dataframe(
        _positions(t, spark, F.col("k") < 40)
    ).commit()
    pre_id = t.metadata.current_snapshot_id
    expect = sorted(r["k"] for r in t.to_df(spark).collect())
    t = rewrite_position_deletes_to_dvs(spark, t)
    assert t.metadata.current_position_delete_files() == []
    assert sorted(r["k"] for r in t.to_df(spark).collect()) == expect
    # the pre-conversion snapshot still reads through its parquet deletes
    assert (
        sorted(r["k"] for r in t.to_df(spark, snapshot_id=pre_id).collect()) == expect
    )
    # converting again is a no-op
    assert rewrite_position_deletes_to_dvs(spark, t) is t


def test_rewrite_equality_deletes_to_dv_target(catalog, spark):
    from iceberg_catalog_postgres_spark.catalog.maintenance import (
        rewrite_equality_deletes,
    )

    t = _table(catalog, spark, "dvd")
    keys = spark.createDataFrame([("u2",), ("u5",)], "u string").coalesce(1)
    t = t.new_transaction().delete_keys_dataframe(keys).commit()
    expect = sorted(r["k"] for r in t.to_df(spark).collect())
    t = rewrite_equality_deletes(spark, t, to_dv=True)
    assert t.metadata.current_delete_files() == []
    assert len(t.metadata.current_deletion_vectors()) >= 1
    assert sorted(r["k"] for r in t.to_df(spark).collect()) == expect


def test_changelog_dv_delete_exactly_once_and_conversion_silent(catalog, spark):
    from iceberg_catalog_postgres_spark.catalog.maintenance import (
        rewrite_position_deletes_to_dvs,
    )

    t = _table(catalog, spark, "dve")
    t = t.new_transaction().delete_positions_dataframe(
        _positions(t, spark, F.col("k") < 30)
    ).commit()
    conv_from = t.metadata.current_snapshot_id
    t = rewrite_position_deletes_to_dvs(spark, t)
    assert t.changelog_df(spark, conv_from).count() == 0  # conversion: no rows changed
    before = t.metadata.current_snapshot_id
    t = t.new_transaction().delete_positions_dv(
        _positions(t, spark, F.col("k").between(30, 39))
    ).commit()
    cl = t.changelog_df(spark, before).collect()
    assert sorted(r["k"] for r in cl) == list(range(30, 40))
    assert {r["_change_type"] for r in cl} == {"delete"}


def test_compaction_materializes_and_clears_dvs(catalog, spark):
    from iceberg_catalog_postgres_spark.catalog.maintenance import compact_table

    t = _table(catalog, spark, "dvf")
    t = t.new_transaction().delete_positions_dv(
        _positions(t, spark, F.col("k") % 2 == 0)
    ).commit()
    expect = sorted(r["k"] for r in t.to_df(spark).collect())
    t = compact_table(spark, t)
    assert t.metadata.current_deletion_vectors() == {}
    assert sorted(r["k"] for r in t.to_df(spark).collect()) == expect


def test_subset_rewrite_keeps_kept_file_vectors(catalog, spark):
    """_commit_subset_replace carry rule: rewriting a COHORT materializes
    its vectors into the new files, while untouched files keep theirs."""
    from iceberg_catalog_postgres_spark.catalog.maintenance import (
        rewrite_files_before_seq,
    )

    t = _table(catalog, spark, "dvg", n=100, parts=2)
    df2 = spark.createDataFrame(
        [(i, f"u{i % 7}") for i in range(100, 200)], "k long, u string"
    )
    t = t.new_transaction().append_dataframe(df2.repartition(2)).commit()
    t = t.new_transaction().delete_positions_dv(
        _positions(t, spark, (F.col("k") < 10) | (F.col("k") >= 190))
    ).commit()
    expect = sorted(r["k"] for r in t.to_df(spark).collect())
    boundary = max(
        t.metadata.current_file_seqs()[f]
        for f in t.metadata.current_data_files()
    )
    t, n_rw, n_kept, _ = rewrite_files_before_seq(spark, t, boundary)
    assert n_rw > 0 and n_kept > 0
    dvs = t.metadata.current_deletion_vectors()
    kept_files = set(t.metadata.current_data_files())
    assert all(rel in kept_files for rel in dvs)  # no dangling entries
    assert len(dvs) >= 1  # the untouched (second-append) cohort kept its DV
    assert sorted(r["k"] for r in t.to_df(spark).collect()) == expect


def test_expire_snapshots_gcs_unreferenced_sidecars(catalog, spark, tmp_path):
    from iceberg_catalog_postgres_spark.catalog.maintenance import (
        compact_table,
        expire_snapshots,
    )

    t = _table(catalog, spark, "dvh", n=100, parts=2)
    t = t.new_transaction().delete_positions_dv(
        _positions(t, spark, F.col("k") < 10)
    ).commit()
    wh = str(tmp_path / "wh")
    assert len(glob.glob(os.path.join(wh, "**", "dv-*.puffin"), recursive=True)) == 1
    # expiry that KEEPS the DV snapshot keeps its sidecar
    t = t.new_transaction().delete_positions_dv(
        _positions(t, spark, F.col("k") >= 95)
    ).commit()
    t = expire_snapshots(t, keep_last=1)
    live = glob.glob(os.path.join(wh, "**", "dv-*.puffin"), recursive=True)
    assert len(live) >= 1  # current snapshot's vectors survive
    expect = sorted(r["k"] for r in t.to_df(spark).collect())
    assert expect == list(range(10, 95))
    # after compaction (vectors cleared) + expiry, every sidecar is GC'd
    t = compact_table(spark, t)
    t = expire_snapshots(t, keep_last=1)
    assert glob.glob(os.path.join(wh, "**", "dv-*.puffin"), recursive=True) == []
    assert sorted(r["k"] for r in t.to_df(spark).collect()) == expect


def test_remove_orphan_files_spares_referenced_sidecars(catalog, spark, tmp_path):
    from iceberg_catalog_postgres_spark.catalog.maintenance import (
        remove_orphan_files,
    )

    t = _table(catalog, spark, "dvi", n=60, parts=2)
    t = t.new_transaction().delete_positions_dv(
        _positions(t, spark, F.col("k") < 5)
    ).commit()
    expect = sorted(r["k"] for r in t.to_df(spark).collect())
    wh = t.catalog.object_store().resolve("")
    before = set(glob.glob(os.path.join(wh, "**", "dv-*.puffin"), recursive=True))
    assert before
    # orphan GC may sweep writer markers (_SUCCESS/.crc) — the REFERENCED
    # sidecar must survive and the read must stay intact
    remove_orphan_files(t, older_than_s=0.0)
    after = set(glob.glob(os.path.join(wh, "**", "dv-*.puffin"), recursive=True))
    assert after == before
    assert sorted(r["k"] for r in t.to_df(spark).collect()) == expect


def test_avro_export_refuses_deletion_vectors(catalog, spark):
    from iceberg_catalog_postgres_spark.catalog.avro_export import (
        export_iceberg_avro,
    )

    t = _table(catalog, spark, "dvj", n=50, parts=1)
    t = t.new_transaction().delete_positions_dv(
        _positions(t, spark, F.col("k") < 5)
    ).commit()
    with pytest.raises(ValueError, match="deletion vector"):
        export_iceberg_avro(spark, t)


def test_dv_survives_metadata_json_roundtrip(catalog, spark):
    """deletion-vectors serialize in the metadata document and reload —
    including through a cold catalog load."""
    t = _table(catalog, spark, "dvk", n=50, parts=1)
    t = t.new_transaction().delete_positions_dv(
        _positions(t, spark, F.col("k") < 7)
    ).commit()
    reloaded = t.catalog.load_table(t.identifier)
    assert reloaded.metadata.current_deletion_vectors() == (
        t.metadata.current_deletion_vectors()
    )
    assert sorted(r["k"] for r in reloaded.to_df(spark).collect()) == list(
        range(7, 50)
    )


def test_cdc_stream_readers_emit_dv_deletes_exactly_once(spark, tmp_path):
    """Both row-level CDC stream readers (simple + executor-parallel)
    reconstruct the exact rows a deletion-vector commit removed — and a
    representation CONVERSION (pos-parquet -> DV) emits zero changes."""
    from iceberg_catalog_postgres_spark.catalog.maintenance import (
        rewrite_position_deletes_to_dvs,
    )
    from iceberg_catalog_postgres_spark.sources.catalog_datasource import (
        CatalogChangelogParallelStreamReader,
        CatalogChangelogStreamReader,
    )

    db = str(tmp_path / "c.db")
    wh = str(tmp_path / "wh")
    cat = PostgresCatalog.connect("dvcdc", f"sqlite://{db}", wh)
    cat.initialize()
    rows = [(i, f"n{i}", i % 5) for i in range(12)]
    src = spark.createDataFrame(
        rows, "n_nationkey long, n_name string, n_regionkey long"
    )
    t = cat.create_table(TableIdentifier.parse("c.nation"), src.schema)
    t = t.new_transaction().append_dataframe(src.coalesce(1)).commit()

    # commit 2: parquet positional delete; commit 3: convert to DV;
    # commit 4: fresh DV delete
    t = t.new_transaction().delete_positions_dataframe(
        _positions(t, spark, F.col("n_nationkey") < 3)
    ).commit()
    t = rewrite_position_deletes_to_dvs(spark, t)
    t = t.new_transaction().delete_positions_dv(
        _positions(t, spark, F.col("n_nationkey").between(3, 4))
    ).commit()

    opts = {"db": db, "warehouse": wh, "ident": "c.nation", "catalog": "dvcdc"}
    reader = CatalogChangelogStreamReader(dict(opts))
    all_rows, end = reader.read(reader.initialOffset())
    assert end["n_snapshots"] == 4
    ins = [r for r in all_rows if r[3] == "insert"]
    dels = [r for r in all_rows if r[3] == "delete"]
    assert len(ins) == 12
    # conversion emitted nothing: deletes are exactly 0,1,2 (pos commit)
    # and 3,4 (DV commit), once each
    assert sorted(r[0] for r in dels) == [0, 1, 2, 3, 4]
    # DV deletes carry full row payloads (exact-row reconstruction)
    assert all(r[1] is not None for r in dels)

    preader = CatalogChangelogParallelStreamReader(dict(opts))
    parts = preader.partitions({"n_snapshots": 0}, {"n_snapshots": 4})
    kinds = sorted(p.kind for p in parts)
    assert "dvdel" in kinds and "posdel" in kinds
    prows = [r for p in parts for r in preader.read(p)]
    assert sorted(r[0] for r in prows if r[3] == "delete") == [0, 1, 2, 3, 4]
    assert sorted(r[0] for r in prows) == sorted(r[0] for r in all_rows)
    cat.backend.close()


def test_dv_with_manifest_spill(catalog, spark, monkeypatch):
    """DVs stay INLINE in the metadata JSON when file lists spill to
    manifest chunks; reads through the deferred snapshot still apply them
    (and the chunk fast path is correctly bypassed)."""
    import iceberg_catalog_postgres_spark.catalog.metadata as md_mod

    monkeypatch.setattr(md_mod, "MANIFEST_THRESHOLD", 2)
    t = _table(catalog, spark, "dvl", n=80, parts=4)
    t = t.new_transaction().delete_positions_dv(
        _positions(t, spark, F.col("k") < 15)
    ).commit()
    reloaded = t.catalog.load_table(t.identifier)
    snap = reloaded.metadata.current_snapshot()
    assert snap.manifests  # genuinely spilled
    assert len(snap.deletion_vectors) >= 1
    assert sorted(r["k"] for r in reloaded.to_df(spark).collect()) == list(
        range(15, 80)
    )


def test_health_and_counts_cover_deletion_vectors(catalog, spark):
    """table_health / record_count / total_bytes account for DVs from the
    snapshot map alone — zero I/O (the counters are what an
    auto-maintenance scheduler reads before deciding to compact)."""
    from iceberg_catalog_postgres_spark.catalog.maintenance import table_health

    t = _table(catalog, spark, "dvm", n=80, parts=2)
    t = t.new_transaction().delete_positions_dv(
        _positions(t, spark, F.col("k") < 13)
    ).commit()
    assert t.record_count(kind="dv") == 13
    assert t.total_bytes(kind="dv") > 0
    h = table_health(t)
    assert h["n_deletion_vectors"] >= 1
    assert h["delete_debt_records"] == 13


def test_rewrite_dvs_to_position_deletes_unblocks_v2_export(catalog, spark):
    """The INVERSE conversion: vectors -> parquet positional deletes at
    O(positions), clearing the v3 surface so the v2 Avro export (which
    refuses vectors) succeeds — the cheap export on-ramp vs compaction.
    Read parity holds across both representations and the export/import
    round-trip."""
    from iceberg_catalog_postgres_spark.catalog.avro_export import (
        export_iceberg_avro,
        import_iceberg_avro,
    )
    from iceberg_catalog_postgres_spark.catalog.maintenance import (
        delete_where_mor,
        rewrite_dvs_to_position_deletes,
    )

    t = _table(catalog, spark, "dvn", n=90, parts=3)
    t = delete_where_mor(spark, t, F.col("k") % 9 == 0, as_dv=True)
    assert len(t.metadata.current_deletion_vectors()) >= 1
    expect = sorted(r["k"] for r in t.to_df(spark).collect())
    assert expect == [i for i in range(90) if i % 9 != 0]

    with pytest.raises(ValueError, match="rewrite_dvs_to_position_deletes"):
        export_iceberg_avro(spark, t)

    t = rewrite_dvs_to_position_deletes(spark, t)
    assert t.metadata.current_deletion_vectors() == {}
    assert len(t.metadata.current_position_delete_files()) >= 1
    assert sorted(r["k"] for r in t.to_df(spark).collect()) == expect
    # converting a vector-free table is a no-op
    assert rewrite_dvs_to_position_deletes(spark, t) is t

    res = export_iceberg_avro(spark, t)
    imp = import_iceberg_avro(
        spark, catalog, TableIdentifier.parse("s.dvn_imp"), res["metadata_json"]
    )
    assert sorted(r["k"] for r in imp.to_df(spark).collect()) == expect


def test_dv_executor_side_membership_path_parity(catalog, spark):
    """The large-cardinality DV strategy (executor-side mapInPandas
    membership filter, each task ranged-reading only its file's blob)
    returns exactly the broadcast anti-join's rows. Forced via the
    threshold conf; also pins the executor blob cache round-trip."""
    t = _table(catalog, spark, "dvo", n=300, parts=3)
    t = t.new_transaction().delete_positions_dv(
        _positions(t, spark, (F.col("k") % 4 == 1) | (F.col("k") < 25))
    ).commit()
    expect = sorted(r["k"] for r in t.to_df(spark).collect())  # broadcast path
    prev = spark.conf.get("spark.icebergps.dv.maxBroadcastPositions", "2000000")
    spark.conf.set("spark.icebergps.dv.maxBroadcastPositions", "0")
    try:
        got = sorted(r["k"] for r in t.to_df(spark).collect())  # distributed path
    finally:
        spark.conf.set("spark.icebergps.dv.maxBroadcastPositions", prev)
    assert got == expect
    assert got == sorted(i for i in range(300) if not (i % 4 == 1 or i < 25))


def test_vacuum_dv_conversion_policy(catalog, spark, tmp_path):
    """vacuum(dv_convert_min_files=N): when the pending pos-delete FILE
    count reaches the threshold, the sweep folds them into deletion
    vectors first and the superseded parquet delete files become
    GC-eligible in the same pass; below threshold it leaves them alone."""
    from iceberg_catalog_postgres_spark.catalog.maintenance import vacuum

    t = _table(catalog, spark, "dvv", n=100, parts=2)
    for lo in (0, 10, 20):
        t = t.new_transaction().delete_positions_dataframe(
            _positions(t, spark, F.col("k").between(lo, lo + 4))
        ).commit()
    n_pos = len(t.metadata.current_position_delete_files())
    assert n_pos >= 3  # one or more part files per delete commit
    expect = sorted(r["k"] for r in t.to_df(spark).collect())

    # below threshold: untouched
    t, rep = vacuum(
        t, keep_last_snapshots=10, spark=spark, dv_convert_min_files=n_pos + 1
    )
    assert rep["pos_delete_files_folded_to_dvs"] == 0
    assert len(t.metadata.current_position_delete_files()) == n_pos

    # at threshold: folded, read parity holds, expiry GCs the old files
    t, rep = vacuum(
        t, keep_last_snapshots=1, orphan_older_than_s=0.0,
        spark=spark, dv_convert_min_files=n_pos,
    )
    assert rep["pos_delete_files_folded_to_dvs"] == n_pos
    assert t.metadata.current_position_delete_files() == []
    assert len(t.metadata.current_deletion_vectors()) >= 1
    assert sorted(r["k"] for r in t.to_df(spark).collect()) == expect


def test_avro_v3_dv_export_import_roundtrip(catalog, spark):
    """r11: format_version=3 lifts the v2 DV refusal — the export writes
    PUFFIN delete-manifest entries with referenced_data_file +
    content_offset/content_size_in_bytes, the import rebuilds the native
    vector map bit-identically (no sidecar opened by either side), and
    the imported table's reads apply the deletes."""
    from iceberg_catalog_postgres_spark.catalog.avro_export import (
        export_iceberg_avro,
        import_iceberg_avro,
        read_avro_records,
    )
    from iceberg_catalog_postgres_spark.catalog.catalog import TableIdentifier

    t = _table(catalog, spark, "dvv3", n=60, parts=2)
    t = t.new_transaction().delete_positions_dv(
        _positions(t, spark, (F.col("k") % 4 == 0) | (F.col("k") >= 50))
    ).commit()
    native = t.metadata.current_deletion_vectors()
    expect = sorted(r["k"] for r in t.to_df(spark).collect())

    res = export_iceberg_avro(spark, t, format_version=3)
    # the delete manifest's DV entries carry the spec v3 fields
    import json as _json

    with open(res["metadata_json"]) as fh:
        doc = _json.load(fh)
    assert doc["format-version"] == 3
    assert doc["next-row-id"] == t.metadata.next_row_id
    ml_rows, _m, _s = read_avro_records(
        spark, res["manifest_list"].replace("file://", "")
    )
    del_manifests = [m for m in ml_rows if m["content"] == 1]
    assert del_manifests, "no delete manifest exported"
    d_rows, _m2, _s2 = read_avro_records(
        spark, del_manifests[0]["manifest_path"].replace("file://", "")
    )
    dv_rows = [e for e in d_rows if e["data_file"]["file_format"] == "PUFFIN"]
    assert len(dv_rows) == len(native)
    for e in dv_rows:
        df = e["data_file"]
        assert df["content"] == 1
        assert df["referenced_data_file"].startswith("file://")
        assert df["content_offset"] is not None
        assert df["content_size_in_bytes"] is not None

    t2 = import_iceberg_avro(
        spark, catalog, TableIdentifier.parse("s.dvv3_imp"), res["metadata_json"]
    )
    assert t2.metadata.format_version == 3
    store = catalog.object_store()
    addr = lambda m: {  # noqa: E731
        store.resolve(k): (v["offset"], v["length"], v["cardinality"])
        for k, v in m.items()
    }
    assert addr(t2.metadata.current_deletion_vectors()) == addr(native)
    assert sorted(r["k"] for r in t2.to_df(spark).collect()) == expect


def test_avro_v2_still_refuses_dvs_and_v3_validates(catalog, spark):
    from iceberg_catalog_postgres_spark.catalog.avro_export import (
        export_iceberg_avro,
    )

    t = _table(catalog, spark, "dvv2", n=20, parts=1)
    t = t.new_transaction().delete_positions_dv(
        _positions(t, spark, F.col("k") < 3)
    ).commit()
    with pytest.raises(ValueError, match="format_version=3"):
        export_iceberg_avro(spark, t)  # default v2: pointed refusal
    with pytest.raises(ValueError, match="must be 2 or 3"):
        export_iceberg_avro(spark, t, format_version=4)


def test_avro_v3_export_without_dvs_roundtrips(catalog, spark):
    """A v3 export of a plain table (no DVs) stays walkable: the extra
    optional fields are null everywhere and the import sees no vectors."""
    from iceberg_catalog_postgres_spark.catalog.avro_export import (
        export_iceberg_avro,
        import_iceberg_avro,
    )
    from iceberg_catalog_postgres_spark.catalog.catalog import TableIdentifier

    t = _table(catalog, spark, "dvv3p", n=30, parts=2)
    res = export_iceberg_avro(spark, t, format_version=3)
    t2 = import_iceberg_avro(
        spark, catalog, TableIdentifier.parse("s.dvv3p_imp"), res["metadata_json"]
    )
    assert t2.metadata.current_deletion_vectors() == {}
    assert t2.to_df(spark).count() == 30


def test_dv_staging_never_materializes_positions_on_driver(
    catalog, spark, monkeypatch
):
    """r12 scale pin (VERDICT r11 #2): ``_stage_dv_positions`` folds each
    file's positions into a roaring vector ON EXECUTORS (applyInPandas) —
    the driver collects only (rel, vector bytes, cardinality). A
    ``toPandas()`` of the positions frame would pull O(changed rows)
    through the driver; forbid it outright while staging, and check the
    resulting read + vector cardinalities are exact."""
    from pyspark.sql import DataFrame

    t = _table(catalog, spark, "dvexec", n=300, parts=3)

    def _boom(self, *a, **kw):
        raise AssertionError("positions frame must never toPandas() on the driver")

    monkeypatch.setattr(DataFrame, "toPandas", _boom)
    t = t.new_transaction().delete_positions_dv(
        _positions(t, spark, (F.col("k") % 5 == 0) | (F.col("k") >= 280))
    ).commit()
    monkeypatch.undo()
    got = sorted(r["k"] for r in t.to_df(spark).collect())
    assert got == [k for k in range(300) if k % 5 != 0 and k < 280]
    dvs = t.metadata.current_deletion_vectors()
    assert sum(e["cardinality"] for e in dvs.values()) == 300 - len(got)


def test_dv_conversions_never_materialize_positions_on_driver(
    catalog, spark, monkeypatch
):
    """r14 scale pin (VERDICT r13 #2): BOTH delete-conversion rewrites —
    ``rewrite_position_deletes_to_dvs`` and
    ``rewrite_equality_deletes(to_dv=True)`` — fold positions into
    roaring vectors ON EXECUTORS like every other DV writer; the r13
    versions ``toPandas()``-ed the full pending-position set through the
    driver (~10⁹ (path, pos) rows at 100 TB with 1% delete debt). Forbid
    ``toPandas`` outright during each conversion; also exercise the
    existing-vector union branch (a file already carrying a DV) and
    verify read parity + cardinalities after."""
    from pyspark.sql import DataFrame

    from iceberg_catalog_postgres_spark.catalog.maintenance import (
        rewrite_equality_deletes,
        rewrite_position_deletes_to_dvs,
    )

    def _boom(self, *a, **kw):
        raise AssertionError("conversion must never toPandas() on the driver")

    # path 1: parquet positional deletes -> DVs, on a table that ALREADY
    # has a vector on one file (union-with-existing on the driver is
    # bounded by touched files, not rows)
    t = _table(catalog, spark, "dvnp1", n=200, parts=2)
    t = t.new_transaction().delete_positions_dv(
        _positions(t, spark, F.col("k") < 5)
    ).commit()
    t = t.new_transaction().delete_positions_dataframe(
        _positions(t, spark, (F.col("k") >= 3) & (F.col("k") < 40))
    ).commit()
    expect = sorted(r["k"] for r in t.to_df(spark).collect())
    monkeypatch.setattr(DataFrame, "toPandas", _boom)
    t = rewrite_position_deletes_to_dvs(spark, t)
    monkeypatch.undo()
    assert t.metadata.current_position_delete_files() == []
    assert sorted(r["k"] for r in t.to_df(spark).collect()) == expect
    dvs = t.metadata.current_deletion_vectors()
    assert sum(e["cardinality"] for e in dvs.values()) == 40

    # path 2: equality deletes -> DVs
    t2 = _table(catalog, spark, "dvnp2")
    keys = spark.createDataFrame([("u2",), ("u5",)], "u string").coalesce(1)
    t2 = t2.new_transaction().delete_keys_dataframe(keys).commit()
    expect2 = sorted(r["k"] for r in t2.to_df(spark).collect())
    monkeypatch.setattr(DataFrame, "toPandas", _boom)
    t2 = rewrite_equality_deletes(spark, t2, to_dv=True)
    monkeypatch.undo()
    assert t2.metadata.current_delete_files() == []
    assert sorted(r["k"] for r in t2.to_df(spark).collect()) == expect2


def test_dv_staging_merges_repeated_stages_and_parent_vectors(catalog, spark):
    """Two staged frames in ONE transaction union per file (executor-encoded
    vectors merged driver-side at blob granularity), and a SECOND commit
    unions against the parent's existing vector — same semantics the old
    array staging had."""
    t = _table(catalog, spark, "dvexec2", n=100, parts=2)
    tx = t.new_transaction()
    tx.delete_positions_dv(_positions(t, spark, F.col("k") < 10))
    tx.delete_positions_dv(_positions(t, spark, (F.col("k") >= 5) & (F.col("k") < 15)))
    t = tx.commit()
    assert sorted(r["k"] for r in t.to_df(spark).collect()) == list(range(15, 100))
    t = t.new_transaction().delete_positions_dv(
        _positions(t, spark, F.col("k") >= 95)
    ).commit()
    got = sorted(r["k"] for r in t.to_df(spark).collect())
    assert got == list(range(15, 95))
    dvs = t.metadata.current_deletion_vectors()
    assert sum(e["cardinality"] for e in dvs.values()) == 20
