"""Manifest file statistics (r5, VERDICT items 1-3): record_count + column
bounds are written into the snapshot at commit time, so scan planning and row
counts answer from METADATA ALONE — zero footer opens on the read path.

This is the Iceberg manifest model (per-file record_count and
lower_bounds/upper_bounds in the manifest the reference's TableMetadata
carries via iceberg-rs, mod.rs:217-220)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

import iceberg_catalog_postgres_spark.catalog.table as table_mod
from iceberg_catalog_postgres_spark.catalog.catalog import PostgresCatalog, TableIdentifier
from iceberg_catalog_postgres_spark.catalog.metadata import decode_bound, encode_bound
from iceberg_catalog_postgres_spark.catalog.table import (
    _truncate_string_bounds,
    collect_file_stats,
)


@pytest.fixture
def catalog(tmp_path):
    cat = PostgresCatalog.connect("stats_cat", None, str(tmp_path / "warehouse"))
    cat.initialize()
    yield cat
    cat.backend.close()


def _footer_reads():
    return table_mod.PLANNING_FOOTER_READS


def test_commit_records_stats(catalog, spark):
    df = spark.createDataFrame(
        [(i, f"name-{i}", float(i) * 1.5) for i in range(100)], "k long, name string, v double"
    ).coalesce(1)
    t = catalog.create_table(TableIdentifier.parse("s.t1"), df.schema)
    t = t.new_transaction().append_dataframe(df).commit()
    snap = t.metadata.current_snapshot()
    assert len(snap.data_files) == 1
    st = snap.file_stats[snap.data_files[0]]
    assert st["record_count"] == 100
    assert decode_bound(st["bounds"]["k"][0]) == 0
    assert decode_bound(st["bounds"]["k"][1]) == 99
    assert decode_bound(st["bounds"]["v"][0]) == 0.0
    assert snap.summary["added-records"] == "100"


def test_planned_files_zero_footer_opens(catalog, spark):
    """Range-partitioned appends -> a range query plans the matching file
    from the metadata JSON with ZERO parquet opens (require_stats certifies
    no fallback fired; the module counter certifies no footer I/O)."""
    t = catalog.create_table(
        TableIdentifier.parse("s.t2"),
        spark.createDataFrame([(0,)], "k long").schema,
    )
    for lo in (0, 100, 200):
        chunk = spark.createDataFrame([(lo + i,) for i in range(50)], "k long").coalesce(1)
        t = t.new_transaction().append_dataframe(chunk).commit()
    before = _footer_reads()
    planned = t.planned_files("k", 110, 140, require_stats=True)
    assert _footer_reads() == before, "planning opened a footer"
    assert len(planned) == 1
    assert len(t.metadata.current_data_files()) == 3
    # superset-safety unchanged: straddling range plans both files
    assert len(t.planned_files("k", 40, 110, require_stats=True)) == 2


def test_record_count_is_metadata_only(catalog, spark):
    df = spark.createDataFrame([(i,) for i in range(75)], "k long").coalesce(2)
    t = catalog.create_table(TableIdentifier.parse("s.t3"), df.schema)
    t = t.new_transaction().append_dataframe(df).commit()
    before = _footer_reads()
    assert t.record_count() == 75
    assert _footer_reads() == before
    assert t.record_count() == t.to_df(spark).count()


def test_record_count_statless_legacy_fallback(catalog, spark, tmp_path):
    """Files registered via raw append_files (no staging writer) have no
    stats; record_count still answers via one footer read each — never a
    data scan — and planned_files keeps them superset-safely."""
    df = spark.createDataFrame([(i,) for i in range(30)], "k long").coalesce(1)
    legacy = str(tmp_path / "legacy")
    df.write.parquet(legacy)
    import glob

    files = sorted(glob.glob(legacy + "/*.parquet"))
    t = catalog.create_table(TableIdentifier.parse("s.t4"), df.schema)
    t = t.new_transaction().append_files(files).commit()
    before = _footer_reads()
    assert t.record_count() == 30
    assert _footer_reads() == before + 1  # exactly one footer, zero scans
    with pytest.raises(ValueError, match="no manifest bounds"):
        t.planned_files("k", 0, 10, require_stats=True)
    assert len(t.planned_files("k", 1000, 2000)) == 0  # footer fallback prunes


def test_delete_files_carry_record_count(catalog, spark):
    """VERDICT item 3: MOR delete commits record the delete files' row
    counts, so pending-delete volume reads from metadata."""
    df = spark.createDataFrame([(i, f"u{i % 5}") for i in range(50)], "k long, u string")
    t = catalog.create_table(TableIdentifier.parse("s.t5"), df.schema)
    t = t.new_transaction().append_dataframe(df).commit()
    keys = spark.createDataFrame([(f"u{j}",) for j in range(2)], "u string").coalesce(1)
    t = t.new_transaction().delete_keys_dataframe(keys).commit()
    before = _footer_reads()
    assert t.record_count(kind="eq-delete") == 2
    assert t.record_count(kind="data") == 50  # data rows untouched by MOR
    assert _footer_reads() == before
    # positional flavor
    pos = (
        t.to_df(spark)
        .withColumn("file_path", F.col("_metadata.file_path"))
        .withColumn("row_index", F.col("_metadata.row_index"))
        .where(F.col("k") < 3)
        .select("file_path", "row_index")
        .coalesce(1)
    )
    t = t.new_transaction().delete_positions_dataframe(pos).commit()
    assert t.record_count(kind="pos-delete") == pos.count()


def test_stats_survive_manifest_spill_and_reload(catalog, spark, monkeypatch):
    """Above MANIFEST_THRESHOLD the file list spills to manifest chunks;
    stats must ride along in the entries and reload identically."""
    import iceberg_catalog_postgres_spark.catalog.metadata as md_mod

    monkeypatch.setattr(md_mod, "MANIFEST_THRESHOLD", 2)
    df = spark.createDataFrame([(i,) for i in range(40)], "k long").repartition(4)
    t = catalog.create_table(TableIdentifier.parse("s.t6"), df.schema)
    t = t.new_transaction().append_dataframe(df).commit()
    assert t.metadata.current_snapshot().manifests, "expected manifest spill"
    reloaded = catalog.load_table(TableIdentifier.parse("s.t6"))
    snap = reloaded.metadata.current_snapshot()
    assert set(snap.file_stats) == set(snap.data_files)
    before = _footer_reads()
    assert reloaded.record_count() == 40
    assert _footer_reads() == before


def test_partition_tuples_survive_manifest_spill(catalog, spark, monkeypatch):
    """Latent r1-r4 bug fixed in r5 while adding stats to delta chunks:
    an APPEND that spilled to manifests wrote its delta chunk WITHOUT the
    staged partition tuples (only full rewrites carried them), so a reload
    lost pruning metadata for the newly appended files. The staged entries
    now carry partition AND stats; pin both across a spill + reload."""
    import iceberg_catalog_postgres_spark.catalog.metadata as md_mod

    monkeypatch.setattr(md_mod, "MANIFEST_THRESHOLD", 1)
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(20)], "k long, cat string"
    ).coalesce(1)
    t = catalog.create_table(
        TableIdentifier.parse("s.t9"), df.schema, partition_by=["cat"]
    )
    t = t.new_transaction().append_dataframe(df).commit()  # 2 files: cat=a, cat=b
    t = t.new_transaction().append_dataframe(df).commit()  # spilled additive delta
    assert t.metadata.current_snapshot().manifests, "expected manifest spill"
    reloaded = catalog.load_table(TableIdentifier.parse("s.t9"))
    snap = reloaded.metadata.current_snapshot()
    assert set(snap.file_partitions) == set(snap.data_files), "tuples lost in spill"
    assert set(snap.file_stats) == set(snap.data_files), "stats lost in spill"
    a_files = reloaded.planned_files_partition({"cat": "a"})
    assert len(a_files) == 2  # one per append; cat=b files pruned
    before = _footer_reads()
    assert reloaded.record_count() == 40
    assert _footer_reads() == before


def test_stats_inherited_through_lineage(catalog, spark):
    """append -> append -> overwrite: every snapshot's stats cover exactly
    its own file set; earlier snapshots keep theirs (time-travel counts are
    metadata-only for the whole lineage)."""
    mk = lambda n: spark.createDataFrame([(i,) for i in range(n)], "k long").coalesce(1)
    t = catalog.create_table(TableIdentifier.parse("s.t7"), mk(1).schema)
    t = t.new_transaction().append_dataframe(mk(10)).commit()
    s1 = t.metadata.current_snapshot().snapshot_id
    t = t.new_transaction().append_dataframe(mk(5)).commit()
    s2 = t.metadata.current_snapshot().snapshot_id
    t = t.new_transaction().overwrite_dataframe(mk(3)).commit()
    before = _footer_reads()
    assert t.record_count(snapshot_id=s1) == 10
    assert t.record_count(snapshot_id=s2) == 15
    assert t.record_count() == 3
    assert _footer_reads() == before


def test_cow_delete_keeps_stats_for_kept_files(catalog, spark):
    from iceberg_catalog_postgres_spark.catalog.maintenance import delete_where_cow

    t = catalog.create_table(
        TableIdentifier.parse("s.t8"),
        spark.createDataFrame([(0,)], "k long").schema,
    )
    for lo in (0, 100):
        chunk = spark.createDataFrame([(lo + i,) for i in range(50)], "k long").coalesce(1)
        t = t.new_transaction().append_dataframe(chunk).commit()
    t, n_rewritten, n_kept = delete_where_cow(spark, t, "k", 120, 130)
    assert (n_rewritten, n_kept) == (1, 1)
    snap = t.metadata.current_snapshot()
    assert set(snap.file_stats) >= set(snap.data_files)
    before = _footer_reads()
    assert t.record_count() == 89  # 50 kept + (50 - 11) rewritten
    assert _footer_reads() == before


def test_null_counts_and_nullness_planning(catalog, spark):
    """Iceberg null_value_counts: all-NULL / mixed / no-NULL files; IS NOT
    NULL planning prunes the all-NULL file, IS NULL planning prunes the
    no-NULL file, both from metadata alone."""
    rows_all_null = [(i, None) for i in range(10)]
    rows_mixed = [(i, float(i) if i % 2 else None) for i in range(10, 20)]
    rows_no_null = [(i, float(i)) for i in range(20, 30)]
    t = catalog.create_table(
        TableIdentifier.parse("s.t10"),
        spark.createDataFrame(rows_no_null, "k long, v double").schema,
    )
    for rows in (rows_all_null, rows_mixed, rows_no_null):
        df = spark.createDataFrame(rows, "k long, v double").coalesce(1)
        t = t.new_transaction().append_dataframe(df).commit()
    snap = t.metadata.current_snapshot()
    ncs = sorted(
        snap.file_stats[f]["null_counts"]["v"] for f in snap.data_files
    )
    assert ncs == [0, 5, 10]
    # the all-NULL file has a null count but (correctly) no v bounds
    all_null_file = next(
        f for f in snap.data_files if snap.file_stats[f]["null_counts"]["v"] == 10
    )
    assert "v" not in snap.file_stats[all_null_file]["bounds"]
    before = _footer_reads()
    assert len(t.planned_files_nullness("v", want_null=False)) == 2
    assert len(t.planned_files_nullness("v", want_null=True)) == 2
    assert _footer_reads() == before
    # k has no nulls anywhere: IS NULL plans nothing, IS NOT NULL everything
    assert len(t.planned_files_nullness("k", want_null=True)) == 0
    assert len(t.planned_files_nullness("k", want_null=False)) == 3


def test_summary_totals_recorded(catalog, spark):
    mk = lambda n: spark.createDataFrame([(i,) for i in range(n)], "k long").coalesce(1)
    t = catalog.create_table(TableIdentifier.parse("s.t11"), mk(1).schema)
    t = t.new_transaction().append_dataframe(mk(10)).commit()
    t = t.new_transaction().append_dataframe(mk(5)).commit()
    s = t.metadata.current_snapshot().summary
    assert s["total-records"] == "15"
    assert s["total-data-files"] == "2"
    assert s["added-records"] == "5"


def test_rewrite_small_files_packs_and_keeps_big(catalog, spark):
    from iceberg_catalog_postgres_spark.catalog.maintenance import rewrite_small_files

    mk = lambda lo, n: spark.createDataFrame(
        [(lo + i,) for i in range(n)], "k long"
    ).coalesce(1)
    t = catalog.create_table(TableIdentifier.parse("s.t12"), mk(0, 1).schema)
    for j in range(4):  # 4 small files of 10 rows
        t = t.new_transaction().append_dataframe(mk(j * 10, 10)).commit()
    t = t.new_transaction().append_dataframe(mk(1000, 500)).commit()  # big
    big_rel = t.metadata.current_data_files()[-1]
    before = _footer_reads()
    t, n_rewritten, n_kept, n_new = rewrite_small_files(spark, t, target_rows=100)
    assert _footer_reads() == before  # selection is metadata-only
    assert (n_rewritten, n_kept, n_new) == (4, 1, 1)
    assert big_rel in t.metadata.current_data_files()  # byte-identical carry
    assert t.record_count() == 540
    assert t.to_df(spark).count() == 540
    # rewritten file has stats + sane bounds over the packed range
    snap = t.metadata.current_snapshot()
    new_rel = next(f for f in snap.data_files if f != big_rel)
    b = snap.file_stats[new_rel]["bounds"]["k"]
    assert (b[0], b[1]) == (0, 39)


def test_rewrite_small_files_materializes_mor_deletes(catalog, spark):
    """Pending equality deletes: the rewrite materializes them into the
    packed output (new seq > delete seq), while kept files still honor the
    delete at read time — total row counts stay consistent throughout."""
    from iceberg_catalog_postgres_spark.catalog.maintenance import rewrite_small_files

    mk = lambda lo, n: spark.createDataFrame(
        [(lo + i,) for i in range(n)], "k long"
    ).coalesce(1)
    t = catalog.create_table(TableIdentifier.parse("s.t13"), mk(0, 1).schema)
    for j in range(3):
        t = t.new_transaction().append_dataframe(mk(j * 10, 10)).commit()
    t = t.new_transaction().append_dataframe(mk(1000, 400)).commit()  # big
    # delete k=5 (lives in a small file) and k=1005 (lives in the big file)
    keys = spark.createDataFrame([(5,), (1005,)], "k long").coalesce(1)
    t = t.new_transaction().delete_keys_dataframe(keys).commit()
    assert t.to_df(spark).count() == 428
    t, n_rewritten, n_kept, n_new = rewrite_small_files(spark, t, target_rows=100)
    assert (n_rewritten, n_kept) == (3, 1)
    assert t.metadata.current_delete_files(), "delete files must be carried"
    # k=5 is PHYSICALLY gone from the packed file (materialized, and the new
    # seq moves it past the delete); k=1005 still masked at read time
    assert t.to_df(spark).count() == 428
    packed = [f for f in t.metadata.current_snapshot().data_files if "binpack" in f]
    packed_rows = t.to_df(spark, file_subset=packed).count()
    assert packed_rows == 29  # 30 - the materialized k=5
    assert t.record_count() == 429  # physical rows: 29 + 400 (k=1005 masked)


def test_rewrite_small_files_respects_partitions(catalog, spark):
    from iceberg_catalog_postgres_spark.catalog.maintenance import rewrite_small_files

    def mk(lo, n, cat_val):
        return spark.createDataFrame(
            [(lo + i, cat_val) for i in range(n)], "k long, cat string"
        ).coalesce(1)

    t = catalog.create_table(
        TableIdentifier.parse("s.t14"), mk(0, 1, "a").schema, partition_by=["cat"]
    )
    for j in range(2):
        t = t.new_transaction().append_dataframe(mk(j * 10, 10, "a")).commit()
        t = t.new_transaction().append_dataframe(mk(100 + j * 10, 10, "b")).commit()
    t, n_rewritten, n_kept, n_new = rewrite_small_files(spark, t, target_rows=100)
    assert (n_rewritten, n_new) == (4, 2)  # one packed file PER partition
    snap = t.metadata.current_snapshot()
    assert set(snap.file_partitions) == set(snap.data_files)
    a_files = t.planned_files_partition({"cat": "a"})
    assert len(a_files) == 1  # pruning still works post-compaction
    import pandas as pd

    got = t.to_df(spark, partition_filter={"cat": "a"}).toPandas()
    assert sorted(got["k"]) == sorted(range(10)) + sorted(range(10, 20))


def test_sorted_write_disjoint_bounds(catalog, spark):
    """sort_by range-distributes the write: files cover disjoint key slices
    and the manifest bounds reflect it (pruning becomes maximally
    selective)."""
    df = spark.createDataFrame([(i,) for i in range(1000)], "k long")
    t = catalog.create_table(TableIdentifier.parse("s.t15"), df.schema)
    t = t.new_transaction().append_dataframe(df, sort_by=["k"], n_files=4).commit()
    snap = t.metadata.current_snapshot()
    assert len(snap.data_files) == 4
    ranges = sorted(
        (
            decode_bound(snap.file_stats[f]["bounds"]["k"][0]),
            decode_bound(snap.file_stats[f]["bounds"]["k"][1]),
        )
        for f in snap.data_files
    )
    for (lo1, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"file ranges overlap: {ranges}"
    # a narrow range query plans exactly one file, from metadata alone
    mid = (ranges[1][0] + ranges[1][1]) // 2
    assert len(t.planned_files("k", mid, mid + 1, require_stats=True)) == 1


def test_pruning_superset_safety_property(catalog, spark):
    """Property (hypothesis): for arbitrary per-file integer contents and an
    arbitrary query range, stats-planned files always include every file
    holding a matching row, and the pruned scan equals the full filter."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    counter = iter(range(1000))

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        files=st.lists(
            st.lists(st.integers(-100, 100), min_size=1, max_size=5),
            min_size=1,
            max_size=4,
        ),
        bounds=st.tuples(st.integers(-120, 120), st.integers(-120, 120)),
    )
    def prop(files, bounds):
        lo, hi = min(bounds), max(bounds)
        ident = TableIdentifier.parse(f"prop.t{next(counter)}")
        t = catalog.create_table(
            ident, spark.createDataFrame([(0,)], "k long").schema
        )
        for vals in files:
            df = spark.createDataFrame([(v,) for v in vals], "k long").coalesce(1)
            t = t.new_transaction().append_dataframe(df).commit()
        planned = set(t.planned_files("k", lo, hi, require_stats=True))
        snap = t.metadata.current_snapshot()
        store = catalog.object_store()
        # every file with a matching row must be planned
        for rel, vals in zip(snap.data_files, files):
            if any(lo <= v <= hi for v in vals):
                assert store.resolve(rel) in planned, (vals, lo, hi)
        # and the pruned scan equals the brute-force filter
        got = sorted(
            r.k
            for r in t.to_df(spark, prune=("k", lo, hi))
            .filter(F.col("k").between(lo, hi))
            .collect()
        )
        want = sorted(v for vals in files for v in vals if lo <= v <= hi)
        assert got == want

    prop()


def test_stats_survive_cas_retry(catalog, spark):
    """Two transactions staged from the SAME base: the loser's CAS retry
    re-applies its staged files onto the winner's metadata — the final
    snapshot must carry stats for BOTH commits' files (metadata counts stay
    exact under contention)."""
    mk = lambda lo: spark.createDataFrame([(lo + i,) for i in range(10)], "k long").coalesce(1)
    t = catalog.create_table(TableIdentifier.parse("s.t16"), mk(0).schema)
    t = t.new_transaction().append_dataframe(mk(0)).commit()
    base = catalog.load_table(TableIdentifier.parse("s.t16"))
    tx1 = base.new_transaction().append_dataframe(mk(100))
    tx2 = base.new_transaction().append_dataframe(mk(200))  # same base -> conflict
    tx1.commit()
    t = tx2.commit()  # retries internally, re-applies staged files
    snap = t.metadata.current_snapshot()
    assert len(snap.data_files) == 3
    assert set(snap.file_stats) == set(snap.data_files)
    before = _footer_reads()
    assert t.record_count() == 30
    assert _footer_reads() == before


def test_streaming_sink_commits_carry_stats(catalog, spark, tmp_path):
    """foreachBatch commits go through append_dataframe -> every
    micro-batch's files land with stats; record_count is metadata-only on a
    stream-built table."""
    src_dir = str(tmp_path / "stream_src")
    df = spark.createDataFrame([(i, float(i)) for i in range(40)], "k long, v double")
    df.coalesce(2).write.json(src_dir)
    t = catalog.create_table(TableIdentifier.parse("s.t17"), df.schema)

    stream = spark.readStream.schema(df.schema).json(src_dir)

    def commit_batch(batch_df, batch_id):
        tbl = catalog.load_table(TableIdentifier.parse("s.t17"))
        tbl.new_transaction().append_dataframe(batch_df).commit()

    q = (
        stream.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    t = catalog.load_table(TableIdentifier.parse("s.t17"))
    snap = t.metadata.current_snapshot()
    assert snap is not None and snap.data_files
    assert set(snap.file_stats) == set(snap.data_files)
    before = _footer_reads()
    assert t.record_count() == 40
    assert _footer_reads() == before


def test_string_bound_truncation():
    lo, hi = _truncate_string_bounds("a" * 40, "b" * 40)
    assert lo == "a" * 16
    assert hi == "b" * 15 + "c"  # last code point incremented
    assert hi > "b" * 40  # still a valid upper bound
    # short strings untouched
    assert _truncate_string_bounds("ab", "cd") == ("ab", "cd")
    # un-incrementable tail (all U+10FFFF): upper bound dropped
    lo2, hi2 = _truncate_string_bounds("a", chr(0x10FFFF) * 20)
    assert lo2 == "a" and hi2 is None


def test_bound_encoding_roundtrip(tmp_path):
    import pandas as pd

    df = pd.DataFrame(
        {
            "i": [3, 1, 2],
            "s": ["bb", "aa", "cc"],
            "d": [dt.date(2020, 1, 2), dt.date(2020, 1, 1), dt.date(2020, 3, 1)],
            "ts": pd.to_datetime(["2021-05-01 10:00", "2021-04-01 09:00", "2021-06-01 08:00"]),
            "b": [b"x", b"y", b"z"],
        }
    )
    p = str(tmp_path / "f.parquet")
    df.to_parquet(p)
    st = collect_file_stats(p)
    assert st["record_count"] == 3
    assert decode_bound(st["bounds"]["i"][0]) == 1
    assert decode_bound(st["bounds"]["s"][1]) == "cc"
    assert decode_bound(st["bounds"]["d"][0]) == dt.date(2020, 1, 1)
    got_ts = decode_bound(st["bounds"]["ts"][1])
    assert got_ts == dt.datetime(2021, 6, 1, 8, 0)
    assert "b" not in st["bounds"]  # binary: no JSON bound, footer fallback
    # JSON-safe end to end
    import json

    json.dumps(st)
    assert decode_bound(encode_bound(dt.date(2020, 1, 1))) == dt.date(2020, 1, 1)


# ---------------------------------------------------------------------------
# Two-level pruning (r5 second pass): manifest-LIST summaries let planning
# skip whole chunks without fetching them, and loading a snapshot no longer
# inflates its chunks at all until something needs the full file list.
# ---------------------------------------------------------------------------


def _chunk_reads():
    import iceberg_catalog_postgres_spark.catalog.metadata as md_mod

    return md_mod.MANIFEST_CHUNK_READS


def _spilled_range_table(catalog, spark, monkeypatch, name="s.twolevel", n_chunks=6):
    """One append per disjoint k-range, threshold 1 so EVERY append spills to
    its own delta chunk -> n_chunks chunks with disjoint summary bounds."""
    import iceberg_catalog_postgres_spark.catalog.metadata as md_mod

    monkeypatch.setattr(md_mod, "MANIFEST_THRESHOLD", 1)
    df0 = spark.createDataFrame([(0, "p0")], "k long, p string")
    t = catalog.create_table(TableIdentifier.parse(name), df0.schema)
    for c in range(n_chunks):
        chunk = spark.createDataFrame(
            [(c * 100 + i, f"p{c}") for i in range(10)], "k long, p string"
        ).coalesce(1)
        t = t.new_transaction().append_dataframe(chunk).commit()
    return t


def test_snapshot_load_is_lazy(catalog, spark, monkeypatch):
    """Loading a manifest-backed table reads ZERO chunks; the first access to
    the file list inflates once."""
    t = _spilled_range_table(catalog, spark, monkeypatch, "s.lazy1")
    before = _chunk_reads()
    reloaded = catalog.load_table(TableIdentifier.parse("s.lazy1"))
    snap = reloaded.metadata.current_snapshot()
    assert _chunk_reads() == before, "catalog load fetched manifest chunks"
    n_chunks = len(snap.manifests)
    assert len(snap.data_files) == 6  # property access inflates
    assert _chunk_reads() == before + n_chunks
    assert len(snap.data_files) == 6  # cached: no second read
    assert _chunk_reads() == before + n_chunks


def test_record_count_zero_chunk_reads(catalog, spark, monkeypatch):
    """Snapshot row counts fold manifest-list summaries: zero chunk fetches,
    zero footer opens — the O(#chunks) metadata answer at any file count."""
    t = _spilled_range_table(catalog, spark, monkeypatch, "s.lazy2")
    reloaded = catalog.load_table(TableIdentifier.parse("s.lazy2"))
    before_c, before_f = _chunk_reads(), _footer_reads()
    assert reloaded.record_count() == 60
    assert reloaded.record_count(kind="eq-delete") == 0
    assert _chunk_reads() == before_c
    assert _footer_reads() == before_f


def test_planned_files_skips_whole_chunks(catalog, spark, monkeypatch):
    """A selective range query fetches ONLY the chunks whose summary bounds
    intersect; disjoint chunks are skipped without a read."""
    t = _spilled_range_table(catalog, spark, monkeypatch, "s.lazy3")
    reloaded = catalog.load_table(TableIdentifier.parse("s.lazy3"))
    before_c, before_f = _chunk_reads(), _footer_reads()
    planned = reloaded.planned_files("k", 200, 209, require_stats=True)
    assert len(planned) == 1
    assert _chunk_reads() == before_c + 1, "should fetch exactly the matching chunk"
    assert _footer_reads() == before_f
    # full-range query touches all chunks but still zero footers
    assert len(reloaded.planned_files("k", 0, 10_000, require_stats=True)) == 6


def test_partition_planning_skips_whole_chunks(catalog, spark, monkeypatch):
    """Identity-partition planning skips chunks whose summary's distinct
    partition values exclude the filter."""
    import iceberg_catalog_postgres_spark.catalog.metadata as md_mod

    monkeypatch.setattr(md_mod, "MANIFEST_THRESHOLD", 1)
    df0 = spark.createDataFrame([(0, "c0")], "k long, cat string")
    t = catalog.create_table(
        TableIdentifier.parse("s.lazy4"), df0.schema, partition_by=["cat"]
    )
    for c in range(4):
        chunk = spark.createDataFrame(
            [(c * 10 + i, f"c{c}") for i in range(5)], "k long, cat string"
        ).coalesce(1)
        t = t.new_transaction().append_dataframe(chunk).commit()
    reloaded = catalog.load_table(TableIdentifier.parse("s.lazy4"))
    before = _chunk_reads()
    files = reloaded.planned_files_partition({"cat": "c2"})
    assert len(files) == 1
    assert _chunk_reads() == before + 1
    rows = spark.read.schema(reloaded.schema).parquet(*files).collect()
    assert sorted(r["k"] for r in rows) == [20, 21, 22, 23, 24]


def test_to_df_pruned_read_never_inflates(catalog, spark, monkeypatch):
    """End to end: a pruned read of an append-only spilled table fetches only
    the matching chunk and never inflates the snapshot (the summaries prove
    no deletes / no renames)."""
    t = _spilled_range_table(catalog, spark, monkeypatch, "s.lazy5")
    reloaded = catalog.load_table(TableIdentifier.parse("s.lazy5"))
    before = _chunk_reads()
    df = reloaded.to_df(spark, prune=("k", 300, 309)).filter("k between 300 and 309")
    assert sorted(r["k"] for r in df.collect()) == list(range(300, 310))
    assert _chunk_reads() == before + 1
    assert not reloaded.metadata.current_snapshot()._inflated


def test_two_level_parity_with_deletes_and_renames(catalog, spark, monkeypatch):
    """Snapshots with MOR deletes or renames fall back to exact per-entry
    planning — results identical to the inflated path."""
    import iceberg_catalog_postgres_spark.catalog.metadata as md_mod

    monkeypatch.setattr(md_mod, "MANIFEST_THRESHOLD", 1)
    df0 = spark.createDataFrame([(0,)], "k long")
    t = catalog.create_table(TableIdentifier.parse("s.lazy6"), df0.schema)
    for c in range(3):
        chunk = spark.createDataFrame([(c * 10 + i,) for i in range(5)], "k long").coalesce(1)
        t = t.new_transaction().append_dataframe(chunk).commit()
    t = t.new_transaction().delete_keys_dataframe(spark.createDataFrame([(11,)], "k long")).commit()
    reloaded = catalog.load_table(TableIdentifier.parse("s.lazy6"))
    got = sorted(r["k"] for r in reloaded.to_df(spark, prune=("k", 10, 14)).filter(
        "k between 10 and 14").collect())
    assert got == [10, 12, 13, 14]  # 11 deleted, fast path must NOT engage
    # rename then read back: rename log disables the summary prune, per-seq
    # physical names stay correct
    from pyspark.sql.types import StructField, StructType

    renamed = StructType(
        [
            StructField("key" if f.name == "k" else f.name, f.dataType, f.nullable, f.metadata)
            for f in reloaded.schema.fields
        ]
    )
    t2 = reloaded.commit_schema(renamed)
    got2 = sorted(r["key"] for r in t2.to_df(spark, prune=("key", 10, 14)).filter(
        "key between 10 and 14").collect())
    assert got2 == [10, 12, 13, 14]


def test_legacy_string_chunk_refs_still_read(catalog, spark, monkeypatch):
    """Pre-summary metadata (manifests as plain path strings) must load,
    count, plan, and read correctly via the inflate fallback."""
    import json as _json

    import iceberg_catalog_postgres_spark.catalog.metadata as md_mod

    t = _spilled_range_table(catalog, spark, monkeypatch, "s.lazy7", n_chunks=3)
    store = catalog.object_store()
    loc = t.metadata_location()
    raw = _json.loads(store.get(loc).decode())
    for s in raw["snapshots"]:
        if "manifests" in s:
            s["manifests"] = [md_mod.chunk_path(c) for c in s["manifests"]]
    store.put(loc, _json.dumps(raw).encode())
    reloaded = catalog.load_table(TableIdentifier.parse("s.lazy7"))
    snap = reloaded.metadata.current_snapshot()
    assert snap.chunk_refs() is None  # no summaries -> no two-level pruning
    assert reloaded.record_count() == 30
    planned = reloaded.planned_files("k", 100, 109, require_stats=True)
    assert len(planned) == 1
    assert sorted(
        r["k"] for r in reloaded.to_df(spark, prune=("k", 100, 109)).filter(
            "k between 100 and 109").collect()
    ) == list(range(100, 110))


def test_nullness_planning_skips_whole_chunks(catalog, spark, monkeypatch):
    """Two-level nullness prune: chunks whose summary proves uniform
    all-null / no-null are skipped without a fetch; mixed chunks are read
    and pruned per entry."""
    import iceberg_catalog_postgres_spark.catalog.metadata as md_mod

    monkeypatch.setattr(md_mod, "MANIFEST_THRESHOLD", 1)
    df0 = spark.createDataFrame([(0, 1.0)], "k long, v double")
    t = catalog.create_table(TableIdentifier.parse("s.null2l"), df0.schema)
    chunks = [
        spark.createDataFrame([(i, None) for i in range(5)], df0.schema),       # all null
        spark.createDataFrame([(10 + i, float(i)) for i in range(5)], df0.schema),  # no nulls
        spark.createDataFrame(
            [(20, None), (21, 2.0), (22, None)], df0.schema
        ),  # mixed
    ]
    for c in chunks:
        t = t.new_transaction().append_dataframe(c.coalesce(1)).commit()
    reloaded = catalog.load_table(TableIdentifier.parse("s.null2l"))
    before = _chunk_reads()
    not_null = reloaded.planned_files_nullness("v", want_null=False)
    # all-null chunk skipped WITHOUT fetch; the other two fetched
    assert len(not_null) == 2
    assert _chunk_reads() == before + 2
    before = _chunk_reads()
    is_null = reloaded.planned_files_nullness("v", want_null=True)
    assert len(is_null) == 2  # no-null chunk pruned
    assert _chunk_reads() == before + 2
    got = sorted(
        r["k"]
        for r in spark.read.schema(reloaded.schema).parquet(*not_null)
        .filter(F.col("v").isNotNull())
        .collect()
    )
    assert got == [10, 11, 12, 13, 14, 21]


def test_file_size_bytes_in_stats_and_summaries(catalog, spark, monkeypatch):
    """file_size_bytes rides commit stats into per-file entries AND chunk
    summaries; Table.total_bytes folds summaries with zero chunk reads and
    matches the on-disk truth."""
    import os as _os

    import iceberg_catalog_postgres_spark.catalog.metadata as md_mod

    monkeypatch.setattr(md_mod, "MANIFEST_THRESHOLD", 1)
    t = catalog.create_table(
        TableIdentifier.parse("s.bytes1"),
        spark.createDataFrame([(0,)], "k long").schema,
    )
    for c in range(3):
        chunk = spark.createDataFrame([(c * 10 + i,) for i in range(20)], "k long").coalesce(1)
        t = t.new_transaction().append_dataframe(chunk).commit()
    reloaded = catalog.load_table(TableIdentifier.parse("s.bytes1"))
    before = _chunk_reads()
    got = reloaded.total_bytes()
    assert _chunk_reads() == before, "byte fold fetched chunks"
    store = catalog.object_store()
    snap = reloaded.metadata.current_snapshot()
    truth = sum(_os.path.getsize(store.resolve(f)) for f in snap.data_files)
    assert got == truth > 0
    assert all("file_size_bytes" in snap.file_stats[f] for f in snap.data_files)


def test_collect_file_stats_nan_counts(tmp_path):
    """r16: float/double columns carry Iceberg ``nan_value_counts`` —
    parquet footers exclude NaN from min/max AND provide no NaN
    statistic, so the counts come from a one-time columnar read-back at
    write time. Non-float columns never appear; NULLs don't count.
    Written via pyarrow directly — pandas' from_pandas coerces NaN to
    NULL, which would test nothing."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "i": pa.array([1, 2, 3, 4], type=pa.int64()),
            "f": pa.array([1.5, float("nan"), None, 4.0], type=pa.float64()),
            "g": pa.array([0.0, 1.0, 2.0, 3.0], type=pa.float64()),
        }
    )
    p = str(tmp_path / "nan.parquet")
    pq.write_table(tbl, p)
    st = collect_file_stats(p)
    assert st["nan_counts"] == {"f": 1, "g": 0}
    assert "i" not in st["nan_counts"]
    # the NaN-free column keeps trustworthy bounds; footer min/max for
    # the NaN-bearing one excludes the NaN (parquet spec) — which is
    # exactly why the planner demands nan_counts == 0 before pruning
    assert decode_bound(st["bounds"]["g"][0]) == 0.0
    assert decode_bound(st["bounds"]["g"][1]) == 3.0
    import json

    json.dumps(st)


def test_float_bounds_prune_only_with_nan_free_proof(tmp_path):
    """Unit check of the r16 trust rule: Table._bounds_prune_ok says a
    float-bounded file may prune only when nan_counts proves it NaN-free;
    a missing count (legacy commit, foreign writer) or any NaN keeps it.
    Integer bounds are always trusted."""
    from iceberg_catalog_postgres_spark.catalog.table import Table

    ok = Table._bounds_prune_ok
    assert ok({"nan_counts": {"x": 0}}, "x", 1.0, 2.0) is True
    assert ok({"nan_counts": {"x": 3}}, "x", 1.0, 2.0) is False
    assert ok({}, "x", 1.0, 2.0) is False              # unknown => keep
    assert ok(None, "x", 1.0, 2.0) is False
    assert ok({"nan_counts": {"y": 0}}, "x", 1.0, 2.0) is False
    assert ok({}, "k", 1, 2) is True                   # int: always
    assert ok(None, "s", "a", "b") is True             # string: always
