"""Real Avro manifest export (r8): spec metadata tree written and re-read
through the official Apache Avro Java library on Spark's classpath."""

from __future__ import annotations

import datetime as dt
import json
import struct

from tests.conftest import soak_only

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DateType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from iceberg_catalog_postgres_spark.catalog.avro_export import (
    export_iceberg_avro,
    read_avro_records,
)
from iceberg_catalog_postgres_spark.catalog.catalog import (
    PostgresCatalog,
    TableIdentifier,
)
from iceberg_catalog_postgres_spark.catalog.metadata import FIELD_ID_KEY


@pytest.fixture
def catalog(tmp_path):
    cat = PostgresCatalog.connect("avro_cat", None, str(tmp_path / "warehouse"))
    cat.initialize()
    yield cat
    cat.backend.close()


S = StructType(
    [
        StructField("k", LongType(), True, {FIELD_ID_KEY: 1}),
        StructField("d", DateType(), True, {FIELD_ID_KEY: 2}),
        StructField("name", StringType(), True, {FIELD_ID_KEY: 3}),
    ]
)


def _table(catalog, spark, name, partition_by=("day(d)", "bucket(4,k)")):
    t = catalog.create_table(
        TableIdentifier.parse(f"av.{name}"), S, partition_by=list(partition_by)
    )
    rows = [(i, dt.date(2024, 3, 1 + i % 3), f"n{i}") for i in range(40)]
    return t.new_transaction().append_dataframe(
        spark.createDataFrame(rows, S)
    ).commit()


def test_export_round_trips_through_official_avro(catalog, spark):
    t = _table(catalog, spark, "t1")
    res = export_iceberg_avro(spark, t)
    store = catalog.object_store()

    m_rows, m_meta, m_schema = read_avro_records(spark, res["manifest"])
    ml_rows, ml_meta, ml_schema = read_avro_records(spark, res["manifest_list"])

    # file set parity
    native = sorted(
        "file://" + store.resolve(f) for f in t.metadata.current_data_files()
    )
    assert sorted(r["data_file"]["file_path"] for r in m_rows) == native
    assert ml_rows[0]["added_files_count"] == len(native)
    assert ml_rows[0]["manifest_path"] == "file://" + res["manifest"]

    # record counts
    assert sum(r["data_file"]["record_count"] for r in m_rows) == 40
    assert ml_rows[0]["added_rows_count"] == 40

    # manifest header metadata per spec
    assert m_meta["format-version"] == "2" and m_meta["content"] == "data"
    spec_fields = json.loads(m_meta["partition-spec"])
    assert [f["transform"] for f in spec_fields] == ["day", "bucket[4]"]
    schema_doc = json.loads(m_meta["schema"])
    assert {f["id"] for f in schema_doc["fields"]} == {1, 2, 3}

    # field-id attributes survive Avro schema round-trip
    for sch in (m_schema, ml_schema):
        assert '"field-id"' in sch
    parsed = json.loads(m_schema)
    top_ids = {f.get("field-id") for f in parsed["fields"]}
    assert top_ids == {0, 1, 2, 3, 4}  # manifest_entry spec ids

    # partition struct: typed day (epoch days) + bucket int
    e0 = m_rows[0]
    p = e0["data_file"]["partition"]
    assert p["d_day"] == (dt.date(2024, 3, 1) - dt.date(1970, 1, 1)).days
    assert 0 <= p["k_bucket"] < 4

    # bounds: single-value binary decodes to native bounds
    from iceberg_catalog_postgres_spark.catalog.metadata import decode_bound

    stats = t.metadata.current_file_stats()
    checked = 0
    for r in m_rows:
        rel = next(f for f in stats if r["data_file"]["file_path"].endswith(f))
        nb = stats[rel].get("bounds") or {}
        for kv in r["data_file"]["lower_bounds"] or []:
            col = {1: "k", 2: "d", 3: "name"}[kv["key"]]
            want = decode_bound(nb[col][0])
            raw = kv["value"]
            if col == "k":
                assert struct.unpack("<q", raw)[0] == want
            elif col == "d":
                assert struct.unpack("<i", raw)[0] == (want - dt.date(1970, 1, 1)).days
            else:
                assert raw.decode("utf-8") == want
            checked += 1
    assert checked > 0

    # manifest-list field summaries: day range covers the three days
    day0 = (dt.date(2024, 3, 1) - dt.date(1970, 1, 1)).days
    s_day = ml_rows[0]["partitions"][0]
    assert struct.unpack("<i", s_day["lower_bound"])[0] == day0
    assert struct.unpack("<i", s_day["upper_bound"])[0] == day0 + 2

    # exported metadata document: pure spec layout, manifest-list pointer
    doc = json.load(open(res["metadata_json"]))
    for key in (
        "format-version", "table-uuid", "schemas", "current-schema-id",
        "partition-specs", "default-spec-id", "sort-orders", "snapshots",
        "snapshot-log", "current-snapshot-id",
    ):
        assert key in doc
    assert "partition-spec" not in doc  # no engine-native keys in the export
    assert doc["snapshots"][0]["manifest-list"] == "file://" + res["manifest_list"]


def test_export_refusals(catalog, spark):
    from iceberg_catalog_postgres_spark.catalog.maintenance import delete_where_mor

    # POSITIONAL deletes export (r8 second pass: content=1 delete manifest)
    t = _table(catalog, spark, "mor", partition_by=())
    t = delete_where_mor(spark, t, F.col("k") < 3)
    assert export_iceberg_avro(spark, t)["n_position_deletes"] == 3

    # column renames
    t2 = _table(catalog, spark, "ren", partition_by=())
    renamed = StructType(
        [
            StructField(
                "key_id" if f.name == "k" else f.name, f.dataType, f.nullable, f.metadata
            )
            for f in S.fields
        ]
    )
    t2 = t2.commit_schema(renamed)
    with pytest.raises(ValueError, match="rename"):
        export_iceberg_avro(spark, t2)
    # ... but the refusal is seq-scoped per FILE: compaction rewrites every
    # current file past the rename boundary (physical names become current)
    # and the same table exports — rename history intact for time travel
    from iceberg_catalog_postgres_spark.catalog.avro_export import (
        import_iceberg_avro,
    )
    from iceberg_catalog_postgres_spark.catalog.maintenance import compact_table

    t2 = compact_table(spark, t2)
    assert t2.column_renames()  # history NOT cleared
    res2 = export_iceberg_avro(spark, t2)
    imp = import_iceberg_avro(
        spark, catalog, TableIdentifier.parse("av.ren_imp"), res2["metadata_json"]
    )
    assert imp.to_df(spark).select("key_id").distinct().count() == 40

    # rename BEFORE any data: every file postdates the boundary, no refusal
    t2b = catalog.create_table(TableIdentifier.parse("av.ren_pre"), S)
    t2b = t2b.commit_schema(renamed)
    rows_b = [(i, dt.date(2024, 5, 1), f"y{i}") for i in range(5)]
    t2b = t2b.new_transaction().append_dataframe(
        spark.createDataFrame(rows_b, t2b.metadata.spark_schema).coalesce(1)
    ).commit()
    assert export_iceberg_avro(spark, t2b)["n_files"] >= 1

    # spec evolution leaving old-spec cohorts without current tuples
    t3 = _table(catalog, spark, "evo", partition_by=("bucket(4,k)",))
    t3 = t3.commit_partition_spec(["day(d)"])
    rows = [(100 + i, dt.date(2024, 4, 1), f"x{i}") for i in range(4)]
    t3 = t3.new_transaction().append_dataframe(
        spark.createDataFrame(rows, S).coalesce(1)
    ).commit()
    with pytest.raises(ValueError, match="partition tuple"):
        export_iceberg_avro(spark, t3)


def test_export_unpartitioned_and_no_stats_files(catalog, spark):
    t = _table(catalog, spark, "plain", partition_by=())
    res = export_iceberg_avro(spark, t)
    m_rows, _m, _s = read_avro_records(spark, res["manifest"])
    assert sum(r["data_file"]["record_count"] for r in m_rows) == 40
    ml_rows, _mm, _ms = read_avro_records(spark, res["manifest_list"])
    assert ml_rows[0]["partitions"] is None  # no partition fields


def test_export_import_round_trip(catalog, spark):
    """The consumer-side proof: import reads ONLY the exported Avro tree
    (never the source table's native metadata) and must reproduce the
    table — rows, metadata-only counts, bucket and day pruning."""
    from iceberg_catalog_postgres_spark.catalog.avro_export import (
        import_iceberg_avro,
    )

    t = _table(catalog, spark, "rt")
    res = export_iceberg_avro(spark, t)

    t2 = import_iceberg_avro(
        spark, catalog, TableIdentifier.parse("av.rt_imported"), res["metadata_json"]
    )
    # full read parity
    a = sorted(map(tuple, t.to_df(spark).collect()))
    b = sorted(map(tuple, t2.to_df(spark).collect()))
    assert a == b and len(a) == 40

    # metadata-only record count from imported stats
    assert t2.record_count() == 40

    # pruning works from the imported tuples/bounds
    pk = t2.planned_files_transformed({"k": 7})
    assert 0 < len(pk) < len(t2.metadata.current_data_files())
    n = (
        t2.to_df(spark, transformed_filter={"k": 7})
        .filter(F.col("k") == 7)
        .count()
    )
    assert n == 1
    rng = t2.planned_files_transformed_range(
        "d", dt.datetime(2024, 3, 2), dt.datetime(2024, 3, 2, 23, 59)
    )
    assert 0 < len(rng) < len(t2.metadata.current_data_files())
    # bounds-based range pruning on a non-partition column (imported bounds)
    pb = t2.planned_files("k", 0, 3, require_stats=True)
    assert 0 < len(pb) < len(t2.metadata.current_data_files())


@soak_only
def test_import_from_a_different_warehouse(catalog, spark, tmp_path):
    """A genuinely foreign consumer: a SECOND catalog with its own
    warehouse imports the exported tree and reads the source's data files
    in place (absolute paths) — the cross-system topology interop is for."""
    from iceberg_catalog_postgres_spark.catalog.avro_export import (
        import_iceberg_avro,
    )

    t = _table(catalog, spark, "xw")
    res = export_iceberg_avro(spark, t)

    other = PostgresCatalog.connect(
        "foreign_cat", None, str(tmp_path / "other_warehouse")
    )
    other.initialize()
    try:
        t2 = import_iceberg_avro(
            spark, other, TableIdentifier.parse("imp.xw"), res["metadata_json"]
        )
        assert sorted(map(tuple, t2.to_df(spark).collect())) == sorted(
            map(tuple, t.to_df(spark).collect())
        )
        assert t2.record_count() == 40
        # reload through the OTHER catalog's pointer round-trips too
        t3 = other.load_table(TableIdentifier.parse("imp.xw"))
        assert t3.record_count() == 40
    finally:
        other.backend.close()


def test_mor_positional_deletes_round_trip(catalog, spark, tmp_path):
    """v2 delete-manifest interop: a table with pending POSITIONAL deletes
    exports a content=1 delete manifest (spec (file_path, pos) schema,
    parquet field-ids, sequence 2 over the data's 1) and a foreign-catalog
    import applies the deletes — row parity with the MOR source."""
    from iceberg_catalog_postgres_spark.catalog.avro_export import (
        import_iceberg_avro,
    )
    from iceberg_catalog_postgres_spark.catalog.maintenance import (
        delete_where_mor,
        rewrite_equality_deletes,
    )

    # unpartitioned: pos-deletes on a PARTITIONED spec are refused (their
    # partition scoping can't be honored — see
    # test_partitioned_pos_deletes_refused)
    t = _table(catalog, spark, "mordel", partition_by=())
    t = delete_where_mor(spark, t, F.col("k") % 7 == 0)  # deletes 6 of 40
    assert t.metadata.current_position_delete_files()
    res = export_iceberg_avro(spark, t)
    assert res["n_position_deletes"] == 6

    # delete manifest is readable and spec-shaped
    from iceberg_catalog_postgres_spark.catalog.avro_export import read_avro_records

    ml_rows, _m, _s = read_avro_records(spark, res["manifest_list"])
    dls = [m for m in ml_rows if m["content"] == 1]
    assert len(dls) == 1 and dls[0]["sequence_number"] == 2
    dmp = dls[0]["manifest_path"].removeprefix("file://")
    d_rows, d_meta, _ds = read_avro_records(spark, dmp)
    assert d_meta["content"] == "deletes"
    assert all(e["data_file"]["content"] == 1 for e in d_rows)
    assert sum(e["data_file"]["record_count"] for e in d_rows) == 6

    other = PostgresCatalog.connect("mor_cat", None, str(tmp_path / "other_wh"))
    other.initialize()
    try:
        t2 = import_iceberg_avro(
            spark, other, TableIdentifier.parse("imp.mordel"), res["metadata_json"]
        )
        a = sorted(map(tuple, t.to_df(spark).collect()))
        b = sorted(map(tuple, t2.to_df(spark).collect()))
        assert a == b and len(a) == 34, "deletes lost or misapplied on import"
    finally:
        other.backend.close()

    # equality deletes export DIRECTLY as content=2 entries (r8 third
    # pass); the rewrite on-ramp still works and yields positional deletes
    t3 = _table(catalog, spark, "eqdel", partition_by=())
    keys = spark.createDataFrame([(1,), (2,)], "k long")
    t3 = t3.new_transaction().delete_keys_dataframe(keys).commit()
    res3 = export_iceberg_avro(spark, t3)
    assert res3["n_equality_deletes"] == 2 and res3["n_position_deletes"] == 0
    t3 = rewrite_equality_deletes(spark, t3)
    res3b = export_iceberg_avro(spark, t3)
    assert res3b["n_position_deletes"] == 2 and res3b["n_equality_deletes"] == 0


def test_rename_export_onramp_rewrites_only_stale_cohort(catalog, spark, tmp_path):
    """r9 targeted on-ramp: a renamed table where only ONE old cohort
    predates the rename exports after rewrite_files_before_seq rewrites
    JUST that cohort — the post-rename files are untouched byte-identical,
    which is the point on a large table where one stale cohort would
    otherwise force a full compact_table."""
    import os

    from iceberg_catalog_postgres_spark.catalog.avro_export import (
        import_iceberg_avro,
    )
    from iceberg_catalog_postgres_spark.catalog.maintenance import (
        rewrite_files_before_seq,
    )

    t = _table(catalog, spark, "cohort", partition_by=())  # seq 1: 40 rows
    renamed = StructType(
        [
            StructField(
                "key_id" if f.name == "k" else f.name, f.dataType, f.nullable, f.metadata
            )
            for f in S.fields
        ]
    )
    t = t.commit_schema(renamed)
    post = [(100 + i, dt.date(2024, 9, 1), f"p{i}") for i in range(5)]
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame(post, t.metadata.spark_schema).coalesce(1)
    ).commit()  # post-rename cohort

    with pytest.raises(ValueError, match="rewrite_files_before_seq"):
        export_iceberg_avro(spark, t)

    store = catalog.object_store()
    boundary = max(int(r["as-of-seq"]) for r in t.column_renames())
    file_seqs = t.metadata.current_snapshot().file_seqs
    fresh = [
        f
        for f in t.metadata.current_data_files()
        if int(file_seqs.get(f, 0)) >= boundary
    ]
    before = {
        f: (os.path.getsize(store.resolve(f)), os.path.getmtime(store.resolve(f)))
        for f in fresh
    }

    t, n_rewritten, n_kept, _n_new = rewrite_files_before_seq(spark, t, boundary)
    assert n_rewritten > 0 and n_kept == len(fresh)
    # post-rename files carried over byte-identical, same paths
    for f, (size, mtime) in before.items():
        assert f in t.metadata.current_data_files()
        assert os.path.getsize(store.resolve(f)) == size
        assert os.path.getmtime(store.resolve(f)) == mtime
    assert t.column_renames()  # rename history intact for time travel

    res = export_iceberg_avro(spark, t)
    other = PostgresCatalog.connect("cohort_cat", None, str(tmp_path / "co_wh"))
    other.initialize()
    try:
        t2 = import_iceberg_avro(
            spark, other, TableIdentifier.parse("imp.cohort"), res["metadata_json"]
        )
        a = sorted(map(tuple, t.to_df(spark).collect()))
        b = sorted(map(tuple, t2.to_df(spark).collect()))
        assert a == b and len(a) == 45
        assert t2.to_df(spark).columns[0] == "key_id"
    finally:
        other.backend.close()


@soak_only
def test_spec_evolution_export_onramp_retuples_only_old_cohort(
    catalog, spark, tmp_path
):
    """r9: the 'incomplete spec tuple' refusal's targeted on-ramp —
    rewrite_files_to_current_spec re-tuples ONLY the old-spec cohorts
    (writing through the append path's shadow partitionBy so new files
    carry full current-spec tuples); current-spec files stay
    byte-identical, pruning works on the re-tupled files, and the export
    round-trips."""
    import os

    from iceberg_catalog_postgres_spark.catalog.avro_export import (
        import_iceberg_avro,
    )
    from iceberg_catalog_postgres_spark.catalog.maintenance import (
        rewrite_files_to_current_spec,
    )

    t = _table(catalog, spark, "respec", partition_by=("bucket(4,k)",))
    t = t.commit_partition_spec(["day(d)"])
    post = [(100 + i, dt.date(2024, 4, 1 + i % 2), f"x{i}") for i in range(6)]
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame(post, S).coalesce(1)
    ).commit()  # new-spec cohort (day(d) tuples)

    with pytest.raises(ValueError, match="rewrite_files_to_current_spec"):
        export_iceberg_avro(spark, t)

    store = catalog.object_store()
    parts = t.metadata.current_file_partitions()
    fresh = [
        f
        for f in t.metadata.current_data_files()
        if "day(d)" in (parts.get(f) or {})
    ]
    assert fresh  # the post-evolution cohort is already tupled
    before = {
        f: (os.path.getsize(store.resolve(f)), os.path.getmtime(store.resolve(f)))
        for f in fresh
    }

    t, n_rewritten, n_kept, n_new = rewrite_files_to_current_spec(spark, t)
    assert n_rewritten > 0 and n_kept == len(fresh) and n_new > 0
    for f, sig in before.items():
        assert f in t.metadata.current_data_files()
        assert (
            os.path.getsize(store.resolve(f)),
            os.path.getmtime(store.resolve(f)),
        ) == sig
    # every current file now carries a complete current-spec tuple...
    parts2 = t.metadata.current_file_partitions()
    assert all(
        "day(d)" in (parts2.get(f) or {}) for f in t.metadata.current_data_files()
    )
    # ...and partition pruning works across BOTH cohorts
    n_apr1 = (
        t.to_df(spark, transformed_filter={"d": dt.datetime(2024, 4, 1)})
        .filter(F.col("d") == dt.date(2024, 4, 1))
        .count()
    )
    assert n_apr1 == 3  # x0, x2, x4
    # idempotent: nothing left to re-tuple
    t2, n2, _k2, _n2 = rewrite_files_to_current_spec(spark, t)
    assert n2 == 0 and t2.metadata_location() == t.metadata_location()

    res = export_iceberg_avro(spark, t)
    other = PostgresCatalog.connect("respec_cat", None, str(tmp_path / "rs_wh"))
    other.initialize()
    try:
        timp = import_iceberg_avro(
            spark, other, TableIdentifier.parse("imp.respec"), res["metadata_json"]
        )
        a = sorted(map(tuple, t.to_df(spark).collect()))
        b = sorted(map(tuple, timp.to_df(spark).collect()))
        assert a == b and len(a) == 46
    finally:
        other.backend.close()


@soak_only
def test_partitioned_eq_deletes_export_global_spec(catalog, spark, tmp_path):
    """ADVICE r8 (medium): on a PARTITIONED table, pending equality deletes
    must NOT export with null partition tuples under the partitioned spec
    (spec-compliant readers apply those only to null-partition data files
    — phantom rows). The delete manifest is written under an UNPARTITIONED
    spec entry so the deletes are global, and a foreign-catalog import
    reproduces the MOR row set."""
    from iceberg_catalog_postgres_spark.catalog.avro_export import (
        import_iceberg_avro,
        read_avro_records,
    )

    t = _table(catalog, spark, "parteq")  # day(d), bucket(4,k) partitioned
    keys = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    t = t.new_transaction().delete_keys_dataframe(keys).commit()
    res = export_iceberg_avro(spark, t)
    assert res["n_equality_deletes"] == 3

    doc = json.load(open(res["metadata_json"]))
    specs = {s["spec-id"]: s for s in doc["partition-specs"]}
    assert len(specs) == 2
    default_spec = specs[doc["default-spec-id"]]
    assert len(default_spec["fields"]) == 2  # table spec stays partitioned
    unpart_id = next(i for i, s in specs.items() if not s["fields"])
    assert unpart_id != doc["default-spec-id"]

    ml_rows, _m, _s = read_avro_records(spark, res["manifest_list"])
    dls = [m for m in ml_rows if m["content"] == 1]
    assert len(dls) == 1 and dls[0]["partition_spec_id"] == unpart_id
    d_rows, d_meta, _ds = read_avro_records(
        spark, dls[0]["manifest_path"].removeprefix("file://")
    )
    assert d_meta["partition-spec-id"] == str(unpart_id)
    assert json.loads(d_meta["partition-spec"]) == []
    assert all(e["data_file"]["partition"] == {} for e in d_rows)

    other = PostgresCatalog.connect("parteq_cat", None, str(tmp_path / "pe_wh"))
    other.initialize()
    try:
        t2 = import_iceberg_avro(
            spark, other, TableIdentifier.parse("imp.parteq"), res["metadata_json"]
        )
        a = sorted(map(tuple, t.to_df(spark).collect()))
        b = sorted(map(tuple, t2.to_df(spark).collect()))
        assert a == b and len(a) == 37, "global eq-deletes lost on import"
    finally:
        other.backend.close()


def test_partitioned_pos_deletes_refused(catalog, spark):
    """Positional deletes are partition-scoped by spec; our native ones are
    path-scoped and partition-agnostic, so a partitioned table with
    pending pos-deletes must refuse loudly (compaction is the on-ramp) —
    previously this mis-exported silently (ADVICE r8)."""
    from iceberg_catalog_postgres_spark.catalog.maintenance import (
        compact_table,
        delete_where_mor,
    )

    t = _table(catalog, spark, "partpos")
    t = delete_where_mor(spark, t, F.col("k") < 3)
    assert t.metadata.current_position_delete_files()
    with pytest.raises(ValueError, match="positional-delete"):
        export_iceberg_avro(spark, t)
    # on-ramp: compaction materializes the deletes, then export succeeds
    t = compact_table(spark, t)
    res = export_iceberg_avro(spark, t)
    assert res["n_position_deletes"] == 0
    m_rows, _m, _s = read_avro_records(spark, res["manifest"])
    assert sum(r["data_file"]["record_count"] for r in m_rows) == 37


def test_identity_timestamp_partition_exports(catalog, spark):
    """ADVICE r8 (low): identity partitioning over a timestamp column
    passed upfront validation but crashed mid-export in _partition_value;
    the tuple's value now encodes as epoch-micros."""
    from pyspark.sql.types import TimestampType

    TS = StructType(
        [
            StructField("k", LongType(), True, {FIELD_ID_KEY: 1}),
            StructField("ts", TimestampType(), True, {FIELD_ID_KEY: 2}),
        ]
    )
    t = catalog.create_table(
        TableIdentifier.parse("av.tspart"), TS, partition_by=["ts"]
    )
    rows = [
        (i, dt.datetime(2024, 3, 1 + i % 2, 12, 0, 0)) for i in range(6)
    ]
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame(rows, TS)
    ).commit()
    res = export_iceberg_avro(spark, t)
    m_rows, _m, _s = read_avro_records(spark, res["manifest"])
    micros = {r["data_file"]["partition"]["ts"] for r in m_rows}
    want = {
        int(
            (dt.datetime(2024, 3, 1 + i, 12) - dt.datetime(1970, 1, 1)).total_seconds()
        )
        * 1_000_000
        for i in range(2)
    }
    assert micros == want
    ml_rows, _mm, _ms = read_avro_records(spark, res["manifest_list"])
    s_ts = ml_rows[0]["partitions"][0]
    assert struct.unpack("<q", s_ts["lower_bound"])[0] == min(want)
    assert struct.unpack("<q", s_ts["upper_bound"])[0] == max(want)


def test_existing_entry_counts_and_snapshot_ids(catalog, spark):
    """ADVICE r8 (low): EXISTING (status 0) delete entries must not count
    as added in the manifest list, and no entry may reference a snapshot
    id absent from the single-snapshot exported doc."""
    from iceberg_catalog_postgres_spark.catalog.avro_export import (
        read_avro_records,
    )

    t = _table(catalog, spark, "exist", partition_by=())
    keys = spark.createDataFrame([(1,), (2,)], "k long").coalesce(1)
    t = t.new_transaction().delete_keys_dataframe(keys).commit()  # seq 2
    extra = [(100, dt.date(2024, 8, 1), "late")]
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame(extra, S).coalesce(1)
    ).commit()  # seq 3 — the eq-delete file becomes EXISTING
    res = export_iceberg_avro(spark, t)

    doc = json.load(open(res["metadata_json"]))
    snap_ids = {s["snapshot-id"] for s in doc["snapshots"]}
    ml_rows, _m, _s = read_avro_records(spark, res["manifest_list"])
    dl = next(m for m in ml_rows if m["content"] == 1)
    assert dl["added_files_count"] == 0 and dl["existing_files_count"] == 1
    assert dl["added_rows_count"] == 0 and dl["existing_rows_count"] == 2
    for m in ml_rows:
        mp = m["manifest_path"].removeprefix("file://")
        for e in read_avro_records(spark, mp)[0]:
            assert e["snapshot_id"] in snap_ids, "dangling snapshot reference"


def test_equality_deletes_round_trip_with_reinsert(catalog, spark, tmp_path):
    """The case that made flattened sequence numbers wrong: eq-delete k,
    then RE-INSERT k. Native strict scoping (delete seq > data seq) keeps
    the re-inserted row; the export carries per-entry real seqs and
    equality_ids, and a foreign-catalog import reproduces the exact rows.
    """
    from iceberg_catalog_postgres_spark.catalog.avro_export import (
        import_iceberg_avro,
        read_avro_records,
    )

    t = catalog.create_table(TableIdentifier.parse("av.eqrt"), S)
    rows = [(i, dt.date(2024, 6, 1 + i % 3), f"n{i}") for i in range(10)]
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame(rows, S).coalesce(1)
    ).commit()                                                  # seq 1
    keys = spark.createDataFrame([(3,), (4,)], "k long")
    t = t.new_transaction().delete_keys_dataframe(keys).commit()  # seq 2
    reinsert = [(3, dt.date(2024, 7, 1), "n3-again")]
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame(reinsert, S).coalesce(1)
    ).commit()                                                  # seq 3
    native = sorted(map(tuple, t.to_df(spark).collect()))
    assert len(native) == 9  # 10 - 2 deleted + 1 re-inserted
    assert ("n3-again" in {r[2] for r in native})

    res = export_iceberg_avro(spark, t)
    assert res["n_equality_deletes"] == 2

    # the delete manifest entry is spec-shaped: content=2, equality_ids of
    # the key column, REAL sequence number 2 (not last-seq)
    ml_rows, _m, _s = read_avro_records(spark, res["manifest_list"])
    dls = [m for m in ml_rows if m["content"] == 1]
    assert len(dls) == 1
    d_rows, d_meta, _ds = read_avro_records(
        spark, dls[0]["manifest_path"].removeprefix("file://")
    )
    eq_entries = [e for e in d_rows if e["data_file"]["content"] == 2]
    assert sum(e["data_file"]["record_count"] for e in eq_entries) == 2
    assert all(e["sequence_number"] == 2 for e in eq_entries)
    assert all(
        list(e["data_file"]["equality_ids"]) == [1] for e in eq_entries
    )  # k's field id
    # data entries carry real seqs too: 1 (first append) and 3 (re-insert)
    m_rows, _mm, _ms = read_avro_records(
        spark,
        next(m for m in ml_rows if m["content"] == 0)[
            "manifest_path"
        ].removeprefix("file://"),
    )
    assert sorted(e["sequence_number"] for e in m_rows) == [1, 3]

    other = PostgresCatalog.connect("eqrt_cat", None, str(tmp_path / "eqrt_wh"))
    other.initialize()
    try:
        t2 = import_iceberg_avro(
            spark, other, TableIdentifier.parse("imp.eqrt"), res["metadata_json"]
        )
        imported = sorted(map(tuple, t2.to_df(spark).collect()))
        assert imported == native, "eq-delete scoping lost across the interop"
    finally:
        other.backend.close()


def test_puffin_statistics_cross_the_interop(catalog, spark, tmp_path):
    """r9: NDV statistics written by ANALYZE (real Puffin sidecar) ride the
    Avro export — absolutized path, only entries for the exported
    snapshot — and the import re-points them so a consumer can read the
    sketches and the ndv blob properties without the source catalog."""
    from iceberg_catalog_postgres_spark.catalog.avro_export import (
        import_iceberg_avro,
    )
    from iceberg_catalog_postgres_spark.catalog.maintenance import (
        column_ndv,
        update_column_ndv,
    )
    from iceberg_catalog_postgres_spark.catalog.puffin import read_puffin

    t = _table(catalog, spark, "stats", partition_by=())
    t = update_column_ndv(spark, t, ["k", "name"])
    res = export_iceberg_avro(spark, t)
    doc = json.load(open(res["metadata_json"]))
    assert len(doc["statistics"]) == 1
    entry = doc["statistics"][0]
    assert entry["snapshot-id"] == doc["current-snapshot-id"]
    assert entry["statistics-path"].startswith("file://")

    other = PostgresCatalog.connect("stats_cat", None, str(tmp_path / "st_wh"))
    other.initialize()
    try:
        t2 = import_iceberg_avro(
            spark, other, TableIdentifier.parse("imp.stats"), res["metadata_json"]
        )
        stats = t2.metadata.statistics
        assert len(stats) == 1
        assert stats[0]["snapshot-id"] == t2.metadata.current_snapshot_id
        blobs, _props, payloads = read_puffin(stats[0]["statistics-path"])
        by_ndv = {int(b["properties"]["ndv"]) for b in blobs}
        assert by_ndv == {column_ndv(t, "k"), column_ndv(t, "name")}
        assert all(len(payloads[i]) > 0 for i in range(len(blobs)))
    finally:
        other.backend.close()

    # a STALE statistics entry (older snapshot) must NOT be exported
    extra = [(100, dt.date(2024, 8, 2), "late")]
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame(extra, S).coalesce(1)
    ).commit()  # stats now refer to the previous snapshot
    res2 = export_iceberg_avro(spark, t)
    doc2 = json.load(open(res2["metadata_json"]))
    assert doc2["statistics"] == []


def test_partition_statistics_cross_the_interop(catalog, spark, tmp_path):
    """r9: partition-statistics entries ride the export (absolutized,
    snapshot-scoped) and the import re-points them; the parquet stays
    readable from the imported table."""
    from iceberg_catalog_postgres_spark.catalog.avro_export import (
        import_iceberg_avro,
    )
    from iceberg_catalog_postgres_spark.catalog.maintenance import (
        update_partition_statistics,
    )

    t = _table(catalog, spark, "pstats", partition_by=("day(d)",))
    t = update_partition_statistics(spark, t)
    res = export_iceberg_avro(spark, t)
    doc = json.load(open(res["metadata_json"]))
    assert len(doc["partition-statistics"]) == 1
    assert doc["partition-statistics"][0]["statistics-path"].startswith("file://")

    other = PostgresCatalog.connect("ps_cat", None, str(tmp_path / "ps_wh"))
    other.initialize()
    try:
        t2 = import_iceberg_avro(
            spark, other, TableIdentifier.parse("imp.pstats"), res["metadata_json"]
        )
        ps = t2.metadata.partition_statistics
        assert len(ps) == 1
        assert ps[0]["snapshot-id"] == t2.metadata.current_snapshot_id
        pdf = spark.read.parquet(ps[0]["statistics-path"])
        assert pdf.select(F.sum("data_record_count")).first()[0] == 40
    finally:
        other.backend.close()


def test_export_empty_snapshot_and_no_snapshot(catalog, spark):
    from iceberg_catalog_postgres_spark.catalog.avro_export import (
        import_iceberg_avro,
    )

    # never-committed table: loud refusal
    t0 = catalog.create_table(TableIdentifier.parse("av.empty0"), S)
    with pytest.raises(ValueError, match="no snapshot"):
        export_iceberg_avro(spark, t0)

    # committed-but-empty snapshot: exports a 0-entry manifest that imports
    t1 = catalog.create_table(TableIdentifier.parse("av.empty1"), S)
    t1 = t1.new_transaction().append_dataframe(
        spark.createDataFrame([], S)
    ).commit()
    res = export_iceberg_avro(spark, t1)
    assert res["n_files"] == 0 and res["total_records"] == 0
    t2 = import_iceberg_avro(
        spark, catalog, TableIdentifier.parse("av.empty1_imp"), res["metadata_json"]
    )
    assert t2.to_df(spark).count() == 0
