"""Partition transforms (Iceberg bucket/truncate): Spark write expression
and driver-side Python planner must agree bit-for-bit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from iceberg_catalog_postgres_spark.catalog.catalog import PostgresCatalog, TableIdentifier
from iceberg_catalog_postgres_spark.catalog.table import (
    parse_partition_field,
    transform_column,
    transform_value,
)


@pytest.fixture
def catalog(tmp_path):
    cat = PostgresCatalog.connect("pt_cat", None, str(tmp_path / "warehouse"))
    cat.initialize()
    yield cat
    cat.backend.close()


def test_parse():
    assert parse_partition_field("c") == ("identity", None, "c")
    assert parse_partition_field("bucket(8,o_custkey)") == ("bucket", 8, "o_custkey")
    assert parse_partition_field("truncate(4, name)") == ("truncate", 4, "name")


def test_spark_python_transform_parity(spark):
    """The Spark shadow-column expression and the Python planner transform
    must produce identical strings for every value — the whole design rests
    on this (CRC-32 is the same polynomial on both runtimes)."""
    vals = [(-17, "alpha"), (0, "b"), (5, ""), (123456789, "delta-x"), (7, "éé")]
    df = spark.createDataFrame(vals, "k long, s string")
    for entry, col, dtype in [
        ("bucket(8,k)", "k", LongType()),
        ("bucket(5,s)", "s", StringType()),
        ("truncate(10,k)", "k", LongType()),
        ("truncate(3,s)", "s", StringType()),
        ("k", "k", LongType()),
    ]:
        got = [
            r["t"]
            for r in df.select(transform_column(entry, dtype).alias("t"))
            .collect()
        ]
        want = [transform_value(entry, v[0] if col == "k" else v[1]) for v in vals]
        assert got == want, (entry, got, want)


def test_truncate_negative_int_floor():
    assert transform_value("truncate(10,k)", -7) == "-10"
    assert transform_value("truncate(10,k)", 7) == "0"
    assert transform_value("truncate(10,k)", 20) == "20"
    assert transform_value("bucket(8,k)", None) is None


def test_bucket_partitioned_roundtrip_and_pruning(catalog, spark):
    s = StructType(
        [StructField("k", LongType(), True), StructField("v", LongType(), True)]
    )
    df = spark.createDataFrame([(i, i * 10) for i in range(64)], s)
    t = catalog.create_table(
        TableIdentifier.parse("pt.t1"), s, partition_by=["bucket(4,k)"]
    )
    t = t.new_transaction().append_dataframe(df.coalesce(1)).commit()
    snap = t.metadata.current_snapshot()
    assert len(snap.data_files) == 4  # one file per bucket
    # every file's recorded tuple key is the spec entry
    assert all(set(tup) == {"bucket(4,k)"} for tup in snap.file_partitions.values())
    # full read parity
    assert sorted(r["k"] for r in t.to_df(spark).collect()) == list(range(64))
    # point-lookup pruning: exactly one file planned, correct rows inside
    planned = t.planned_files_transformed({"k": 13})
    assert len(planned) == 1
    rows = spark.read.schema(s).parquet(*planned).filter("k = 13").collect()
    assert [(r["k"], r["v"]) for r in rows] == [(13, 130)]
    # reload keeps working
    t2 = catalog.load_table(TableIdentifier.parse("pt.t1"))
    assert len(t2.planned_files_transformed({"k": 13})) == 1


def test_truncate_string_partitioned_pruning(catalog, spark):
    s = StructType(
        [StructField("name", StringType(), True), StructField("v", LongType(), True)]
    )
    df = spark.createDataFrame(
        [("apple", 1), ("apric", 2), ("banan", 3), ("blueb", 4), ("cherry", 5)], s
    )
    t = catalog.create_table(
        TableIdentifier.parse("pt.t2"), s, partition_by=["truncate(1,name)"]
    )
    t = t.new_transaction().append_dataframe(df.coalesce(1)).commit()
    snap = t.metadata.current_snapshot()
    assert len(snap.data_files) == 3  # prefixes a, b, c
    planned = t.planned_files_transformed({"name": "banan"})
    assert len(planned) == 1
    got = sorted(
        r["name"]
        for r in spark.read.schema(s).parquet(*planned).collect()
    )
    assert got == ["banan", "blueb"]


# ---------------------------------------------------------------------------
# r6: spec-faithful murmur3 bucketing
# ---------------------------------------------------------------------------

def test_murmur3_iceberg_spec_vectors():
    """The Iceberg spec's own Appendix-B bucket-hash vectors, pinned: an
    external Iceberg reader (Spark runtime jar, Trino) must compute the
    same bucket for these values."""
    from iceberg_catalog_postgres_spark.catalog.table import murmur3_32

    assert murmur3_32((34).to_bytes(8, "little")) == 2017239379        # int/long 34
    assert murmur3_32("iceberg".encode()) == 1210000089                # string
    assert murmur3_32((1510871468000000).to_bytes(8, "little")) == -2047944441  # ts micros
    assert murmur3_32((17486).to_bytes(8, "little")) == -653330422     # date days


def test_murmur3_column_exprs_match_python(spark):
    """JVM expression == pure-Python hash, bit-for-bit, across word-count
    and tail-length classes incl. negative longs and multibyte UTF-8."""
    from pyspark.sql import functions as F

    from iceberg_catalog_postgres_spark.catalog.table import (
        murmur3_32,
        murmur3_32_long_col,
        murmur3_32_utf8_col,
    )

    longs = [34, 0, -1, -34, 2**62, -(2**62), 2**63 - 1, -(2**63)]
    df = spark.createDataFrame([(v,) for v in longs], "v long")
    got = [r[0] for r in df.select(murmur3_32_long_col(F.col("v")).alias("h")).collect()]
    want = [murmur3_32((v & (2**64 - 1)).to_bytes(8, "little")) & 0xFFFFFFFF for v in longs]
    assert got == want

    strs = ["", "a", "ab", "abc", "abcd", "abcde", "iceberg", "éé", "日本語テスト"]
    df2 = spark.createDataFrame([(s,) for s in strs], "s string")
    got2 = [r[0] for r in df2.select(murmur3_32_utf8_col(F.col("s")).alias("h")).collect()]
    want2 = [murmur3_32(s.encode()) & 0xFFFFFFFF for s in strs]
    assert got2 == want2


def test_bucket_source_type_validated(catalog, spark):
    """bucket()/truncate() on a double or boolean column is rejected at
    create AND at spec evolution (the ADVICE r5 mis-pruning trap)."""
    from pyspark.sql.types import BooleanType, DoubleType

    s = StructType(
        [StructField("d", DoubleType(), True), StructField("k", LongType(), True)]
    )
    with pytest.raises(ValueError, match="must be int/long/string"):
        catalog.create_table(
            TableIdentifier.parse("pt.bad1"), s, partition_by=["bucket(4,d)"]
        )
    s2 = StructType(
        [StructField("b", BooleanType(), True), StructField("k", LongType(), True)]
    )
    with pytest.raises(ValueError, match="must be int/long/string"):
        catalog.create_table(
            TableIdentifier.parse("pt.bad2"), s2, partition_by=["truncate(2,b)"]
        )
    t = catalog.create_table(TableIdentifier.parse("pt.ok1"), s, partition_by=["k"])
    with pytest.raises(ValueError, match="must be int/long/string"):
        t.commit_partition_spec(["bucket(4,d)"])


def test_new_tables_record_murmur3_property(catalog, spark):
    from iceberg_catalog_postgres_spark.catalog.table import BUCKET_HASH_PROP

    s = StructType([StructField("k", LongType(), True)])
    t = catalog.create_table(
        TableIdentifier.parse("pt.prop1"), s, partition_by=["bucket(4,k)"]
    )
    assert t.metadata.properties[BUCKET_HASH_PROP] == "murmur3"


def test_legacy_crc32_table_still_plans_consistently(catalog, spark):
    """A table whose metadata predates the property (simulated by deleting
    it) keeps CRC-32 end-to-end: the planner must use the hash the files
    were WRITTEN with, not the new default."""
    from iceberg_catalog_postgres_spark.catalog.table import BUCKET_HASH_PROP

    s = StructType(
        [StructField("k", LongType(), True), StructField("v", LongType(), True)]
    )
    t = catalog.create_table(
        TableIdentifier.parse("pt.legacy"), s, partition_by=["bucket(4,k)"]
    )
    del t.metadata.properties[BUCKET_HASH_PROP]  # pre-r6 table shape
    df = spark.createDataFrame([(i, i * 10) for i in range(64)], s)
    t = t.new_transaction().append_dataframe(df.coalesce(1)).commit()
    t2 = catalog.load_table(TableIdentifier.parse("pt.legacy"))
    assert BUCKET_HASH_PROP not in t2.metadata.properties
    for k in (0, 13, 63):
        planned = t2.planned_files_transformed({"k": k})
        assert len(planned) == 1
        rows = spark.read.schema(s).parquet(*planned).filter(f"k = {k}").collect()
        assert [(r["k"], r["v"]) for r in rows] == [(k, k * 10)]


def test_planner_coerces_string_query_value_for_int_column(catalog, spark):
    """planned_files_transformed({'k': '13'}) on a long column must plan the
    same single file as the typed value (schema-driven coercion)."""
    s = StructType(
        [StructField("k", LongType(), True), StructField("v", LongType(), True)]
    )
    t = catalog.create_table(
        TableIdentifier.parse("pt.coerce"), s, partition_by=["bucket(4,k)"]
    )
    df = spark.createDataFrame([(i, i * 10) for i in range(64)], s)
    t = t.new_transaction().append_dataframe(df.coalesce(1)).commit()
    assert t.planned_files_transformed({"k": "13"}) == t.planned_files_transformed(
        {"k": 13}
    )


def test_bucket_date_timestamp_spec_vectors():
    """Iceberg spec vectors for date/timestamp bucketing through the public
    planner API with schema-driven coercion."""
    import datetime as dt

    # date 2017-11-16 = 17486 days -> hash -653330422
    want_date = str((-653330422 & 0x7FFFFFFF) % 16)
    assert transform_value("bucket(16,c)", dt.date(2017, 11, 16), src_type="date") == want_date
    assert transform_value("bucket(16,c)", "2017-11-16", src_type="date") == want_date
    assert transform_value("bucket(16,c)", 17486, src_type="date") == want_date
    # timestamp 2017-11-16T22:31:08 = 1510871468000000 us -> hash -2047944441
    want_ts = str((-2047944441 & 0x7FFFFFFF) % 16)
    assert transform_value(
        "bucket(16,c)", dt.datetime(2017, 11, 16, 22, 31, 8), src_type="timestamp"
    ) == want_ts
    assert transform_value(
        "bucket(16,c)", 1510871468000000, src_type="timestamp"
    ) == want_ts


def test_bucket_date_partitioned_roundtrip_and_pruning(catalog, spark):
    """A date-bucketed table: writer expression and driver planner agree,
    point lookups prune to one bucket."""
    import datetime as dt

    from pyspark.sql.types import DateType

    s = StructType(
        [StructField("d", DateType(), True), StructField("v", LongType(), True)]
    )
    rows = [(dt.date(2024, 1, 1) + dt.timedelta(days=i), i) for i in range(40)]
    df = spark.createDataFrame(rows, s)
    t = catalog.create_table(
        TableIdentifier.parse("pt.dates"), s, partition_by=["bucket(4,d)"]
    )
    t = t.new_transaction().append_dataframe(df.coalesce(1)).commit()
    assert len(t.metadata.current_snapshot().data_files) == 4
    probe = dt.date(2024, 1, 15)
    planned = t.planned_files_transformed({"d": probe})
    assert len(planned) == 1
    got = [
        (r["d"], r["v"])
        for r in spark.read.schema(s).parquet(*planned)
        .filter(F.col("d") == F.lit(probe)).collect()
    ]
    assert got == [(probe, 14)]
    # string query value coerces through the schema type too
    assert t.planned_files_transformed({"d": "2024-01-15"}) == planned


def test_bucket_timestamp_partitioned_roundtrip(catalog, spark):
    import datetime as dt

    from pyspark.sql.types import TimestampType

    s = StructType(
        [StructField("ts", TimestampType(), True), StructField("v", LongType(), True)]
    )
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    rows = [
        (dt.datetime(2024, 3, 1, 0, 0, 0) + dt.timedelta(hours=i), i)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, s)
    t = catalog.create_table(
        TableIdentifier.parse("pt.tstamps"), s, partition_by=["bucket(4,ts)"]
    )
    t = t.new_transaction().append_dataframe(df.coalesce(1)).commit()
    probe = dt.datetime(2024, 3, 1, 7, 0, 0)
    planned = t.planned_files_transformed({"ts": probe})
    assert len(planned) == 1
    got = [
        r["v"]
        for r in spark.read.schema(s).parquet(*planned)
        .filter(F.col("ts") == F.lit(probe)).collect()
    ]
    assert got == [7]


def test_temporal_transform_values():
    """Iceberg temporal transform semantics: year/month since 1970(-01),
    day/hour from epoch, floor semantics — spec examples for
    2017-11-16(T22:31:08)."""
    import datetime as dt

    d = dt.date(2017, 11, 16)
    ts = dt.datetime(2017, 11, 16, 22, 31, 8)
    assert transform_value("year(c)", d) == "47"
    assert transform_value("month(c)", d) == str(47 * 12 + 10)
    assert transform_value("day(c)", d) == "17486"
    assert transform_value("year(c)", ts) == "47"
    assert transform_value("day(c)", ts) == "17486"
    assert transform_value("hour(c)", ts) == str(1510871468000000 // 3_600_000_000)
    # pre-epoch floors
    assert transform_value("day(c)", dt.date(1969, 12, 31)) == "-1"
    assert transform_value("year(c)", dt.date(1969, 12, 31)) == "-1"
    with pytest.raises(TypeError, match="hour"):
        transform_value("hour(c)", d)
    assert parse_partition_field("day(ts)") == ("day", None, "ts")


def test_tz_aware_values_normalize_to_utc():
    """ADVICE r6 (medium): a tz-aware non-UTC value must transform by its
    UTC *instant*, not its local wall-clock. 2024-01-01T02:00+05:00 IS
    2023-12-31T21:00Z — same instant, so same day / hour / bucket as the
    UTC-spelled equivalent; the old epoch-with-v.tzinfo arithmetic planned
    day 19723 (and a different bucket), silently pruning the right files."""
    import datetime as dt

    aware = dt.datetime.fromisoformat("2024-01-01T02:00:00+05:00")
    utc_naive = dt.datetime(2023, 12, 31, 21, 0, 0)
    for entry in ("day(c)", "hour(c)", "month(c)", "year(c)", "bucket(8, c)"):
        assert transform_value(entry, aware, src_type="timestamp") == \
            transform_value(entry, utc_naive, src_type="timestamp"), entry
        # unit-inference path (no src_type) must agree for temporal kinds
        if not entry.startswith("bucket"):
            assert transform_value(entry, aware) == transform_value(entry, utc_naive)
    assert transform_value("day(c)", aware, src_type="timestamp") == "19722"
    # identity over timestamp: micros of the instant, not the local wall-clock
    assert transform_value("identity(c)", aware, src_type="timestamp") == \
        transform_value("identity(c)", utc_naive, src_type="timestamp")
    # ISO string with an offset goes through fromisoformat → same normalization
    assert transform_value(
        "day(c)", "2024-01-01T02:00:00+05:00", src_type="timestamp"
    ) == "19722"
    # tz-aware datetime against a DATE column: the UTC date, not the local one
    assert transform_value("identity(c)", aware, src_type="date") == "19722"


def test_range_planner_skips_string_identity_entry(catalog, spark):
    """ADVICE r6 (low): an identity(string-col) spec entry must not crash
    planned_files_transformed_range with int('abc') — it is dropped from the
    bounds (superset-safe), matching the point planner's tolerance."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    sch = StructType([
        StructField("name", StringType(), True),
        StructField("n", LongType(), True),
    ])
    ident = TableIdentifier.parse("pt.str_ident_range")
    t = catalog.create_table(ident, sch, partition_by=["name"])
    df = spark.createDataFrame([("alpha", 1), ("beta", 2)], sch)
    t = t.new_transaction().append_dataframe(df).commit()
    all_files = [f for f in t.metadata.current_data_files()]
    planned = t.planned_files_transformed_range("name", "a", "z")
    assert len(planned) == len(all_files)  # superset-safe: keeps everything


def test_day_partitioned_roundtrip_and_pruning(catalog, spark):
    """day(ts)-partitioned table: hive-style daily layout, point lookup on
    one day plans exactly that day's file."""
    import datetime as dt

    from pyspark.sql.types import TimestampType

    s = StructType(
        [StructField("ts", TimestampType(), True), StructField("v", LongType(), True)]
    )
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    rows = [
        (dt.datetime(2024, 5, 1 + d, h, 0, 0), d * 100 + h)
        for d in range(5)
        for h in range(4)
    ]
    df = spark.createDataFrame(rows, s)
    t = catalog.create_table(
        TableIdentifier.parse("pt.daily"), s, partition_by=["day(ts)"]
    )
    t = t.new_transaction().append_dataframe(df.coalesce(1)).commit()
    assert len(t.metadata.current_snapshot().data_files) == 5  # one per day
    probe = dt.datetime(2024, 5, 3, 2, 0, 0)
    planned = t.planned_files_transformed({"ts": probe})
    assert len(planned) == 1
    got = sorted(
        r["v"] for r in spark.read.schema(s).parquet(*planned).collect()
    )
    assert got == [200, 201, 202, 203]  # the whole day's rows, nothing else


def test_month_partitioned_date_column(catalog, spark):
    import datetime as dt

    from pyspark.sql.types import DateType

    s = StructType(
        [StructField("d", DateType(), True), StructField("v", LongType(), True)]
    )
    rows = [(dt.date(2024, 1 + m, 10 + i), m * 10 + i) for m in range(3) for i in range(3)]
    t = catalog.create_table(
        TableIdentifier.parse("pt.monthly"), s, partition_by=["month(d)"]
    )
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame(rows, s).coalesce(1)
    ).commit()
    assert len(t.metadata.current_snapshot().data_files) == 3
    planned = t.planned_files_transformed({"d": dt.date(2024, 2, 1)})
    assert len(planned) == 1
    got = sorted(r["v"] for r in spark.read.schema(s).parquet(*planned).collect())
    assert got == [10, 11, 12]


def test_temporal_source_type_validated(catalog, spark):
    s = StructType(
        [StructField("k", LongType(), True), StructField("x", StringType(), True)]
    )
    with pytest.raises(ValueError, match="must be date/timestamp"):
        catalog.create_table(TableIdentifier.parse("pt.badt1"), s, partition_by=["day(k)"])
    import datetime as dt  # noqa: F401

    from pyspark.sql.types import DateType

    s2 = StructType([StructField("d", DateType(), True)])
    with pytest.raises(ValueError, match="hour\\(\\) source column"):
        catalog.create_table(TableIdentifier.parse("pt.badt2"), s2, partition_by=["hour(d)"])


def test_bucket_binary_column(spark):
    """Binary bucketing: spec vector (00 01 02 03 -> -188683207) and
    JVM/Python parity over varied byte payloads (multimodal tables bucket
    on content digests)."""
    from iceberg_catalog_postgres_spark.catalog.table import (
        murmur3_32,
        murmur3_32_binary_col,
    )
    from pyspark.sql.types import BinaryType

    assert murmur3_32(bytes([0, 1, 2, 3])) == -188683207  # Iceberg spec
    payloads = [b"", b"\x00", bytes([0, 1, 2, 3]), bytes(range(17)), b"\xff" * 8]
    df = spark.createDataFrame([(p,) for p in payloads], "b binary")
    got = [r[0] for r in df.select(murmur3_32_binary_col(F.col("b")).alias("h")).collect()]
    want = [murmur3_32(p) & 0xFFFFFFFF for p in payloads]
    assert got == want
    for p in payloads:
        assert transform_value("bucket(8,b)", p) == [
            r[0] for r in spark.createDataFrame([(p,)], "b binary")
            .select(transform_column("bucket(8,b)", BinaryType()).alias("t")).collect()
        ][0]


def test_temporal_spark_python_parity_across_eras(spark):
    """Spark expression == Python planner for year/month/day/hour over
    timestamps spanning pre-epoch, DST-adjacent, and far-future instants
    (session tz pinned UTC; floor semantics on negatives)."""
    import datetime as dt
    import random

    from pyspark.sql.types import TimestampType

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    rng = random.Random(42)
    stamps = [
        dt.datetime(1969, 12, 31, 23, 59, 59, 999999),
        dt.datetime(1970, 1, 1, 0, 0, 0),
        dt.datetime(1969, 6, 15, 12, 0, 0),
        dt.datetime(2038, 1, 19, 3, 14, 8),
        dt.datetime(2024, 3, 10, 2, 30, 0),   # US DST gap wall-clock (UTC here)
        dt.datetime(2024, 12, 31, 23, 59, 59),
    ] + [
        dt.datetime(1970, 1, 1) + dt.timedelta(seconds=rng.randint(-10**9, 4 * 10**9))
        for _ in range(60)
    ]
    df = spark.createDataFrame([(s,) for s in stamps], "ts timestamp")
    for entry in ("year(ts)", "month(ts)", "day(ts)", "hour(ts)"):
        got = [
            r["t"]
            for r in df.select(transform_column(entry, TimestampType()).alias("t")).collect()
        ]
        want = [transform_value(entry, s, src_type="timestamp") for s in stamps]
        assert got == want, (entry, [(g, w) for g, w in zip(got, want) if g != w][:3])


def test_murmur3_fuzz_parity(spark):
    """Seeded fuzz: 200 random strings (mixed scripts/lengths) and 200
    random longs through the JVM and Python hashers, bit-identical."""
    import random

    from iceberg_catalog_postgres_spark.catalog.table import (
        murmur3_32,
        murmur3_32_long_col,
        murmur3_32_utf8_col,
    )

    rng = random.Random(7)
    alphabet = "abcXYZ019 _-日本語éüñ🙂"
    strs = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
        for _ in range(200)
    ]
    longs = [rng.randint(-(2**63), 2**63 - 1) for _ in range(200)]
    df = spark.createDataFrame([(s,) for s in strs], "s string")
    got = [r[0] for r in df.select(murmur3_32_utf8_col(F.col("s")).alias("h")).collect()]
    assert got == [murmur3_32(s.encode()) & 0xFFFFFFFF for s in strs]
    df2 = spark.createDataFrame([(v,) for v in longs], "v long")
    got2 = [r[0] for r in df2.select(murmur3_32_long_col(F.col("v")).alias("h")).collect()]
    assert got2 == [murmur3_32((v & (2**64 - 1)).to_bytes(8, "little")) & 0xFFFFFFFF for v in longs]


def test_range_pruning_day_transform(catalog, spark):
    """planned_files_transformed_range on a day(ts) table: only the days
    inside [lo, hi] plan; bucket specs are skipped (non-monotone) and a
    missing tuple keeps the file (superset-safe)."""
    import datetime as dt

    from pyspark.sql.types import TimestampType

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    s = StructType(
        [StructField("ts", TimestampType(), True), StructField("v", LongType(), True)]
    )
    rows = [
        (dt.datetime(2024, 7, 1 + d, h, 0, 0), d * 10 + h)
        for d in range(8)
        for h in range(3)
    ]
    t = catalog.create_table(
        TableIdentifier.parse("pt.range1"), s, partition_by=["day(ts)"]
    )
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame(rows, s).coalesce(1)
    ).commit()
    assert len(t.metadata.current_snapshot().data_files) == 8
    lo, hi = dt.datetime(2024, 7, 3), dt.datetime(2024, 7, 5, 23, 59, 59)
    planned = t.planned_files_transformed_range("ts", lo, hi)
    assert len(planned) == 3  # days 3,4,5
    got = sorted(r["v"] for r in spark.read.schema(s).parquet(*planned).collect())
    assert got == sorted(d * 10 + h for d in (2, 3, 4) for h in range(3))
    # a column with no monotone spec entry -> keep everything
    assert len(t.planned_files_transformed_range("v", 0, 1)) == 8


def test_range_pruning_bucket_spec_keeps_all(catalog, spark):
    """bucket(N) is not monotone: a range probe over a bucket-only spec
    must keep every file rather than mis-prune."""
    s = StructType(
        [StructField("k", LongType(), True), StructField("v", LongType(), True)]
    )
    t = catalog.create_table(
        TableIdentifier.parse("pt.range2"), s, partition_by=["bucket(4,k)"]
    )
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(i, i) for i in range(40)], s).coalesce(1)
    ).commit()
    n = len(t.metadata.current_snapshot().data_files)
    assert len(t.planned_files_transformed_range("k", 5, 10)) == n


def test_range_pruning_through_manifest_chunks(catalog, spark):
    """Two-level path: with > MANIFEST_THRESHOLD files the range prune must
    skip whole chunks from summaries and still plan exactly the touched
    days."""
    import datetime as dt

    from iceberg_catalog_postgres_spark.catalog import metadata as md

    from pyspark.sql.types import TimestampType

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    s = StructType(
        [StructField("ts", TimestampType(), True), StructField("v", LongType(), True)]
    )
    old_thr = md.MANIFEST_THRESHOLD
    md.MANIFEST_THRESHOLD = 10  # force chunk spill at fixture scale
    try:
        rows = [(dt.datetime(2024, 8, 1 + d, 0, 0, 0), d) for d in range(30)]
        t = catalog.create_table(
            TableIdentifier.parse("pt.range3"), s, partition_by=["day(ts)"]
        )
        t = t.new_transaction().append_dataframe(
            spark.createDataFrame(rows, s).coalesce(1)
        ).commit()
        assert t.metadata.current_snapshot().chunk_refs(), "chunked snapshot expected"
        lo, hi = dt.datetime(2024, 8, 10), dt.datetime(2024, 8, 12, 23, 59, 59)
        planned = t.planned_files_transformed_range("ts", lo, hi)
        assert len(planned) == 3
        got = sorted(r["v"] for r in spark.read.schema(s).parquet(*planned).collect())
        assert got == [9, 10, 11]
    finally:
        md.MANIFEST_THRESHOLD = old_thr


def test_to_df_transformed_pruning_composes_with_mor_deletes(catalog, spark):
    """to_df(transformed_filter=... / transformed_range=...) prunes by the
    day(ts) spec INSIDE the reader, so merge-on-read deletes still apply —
    the full read contract, not a raw parquet scan of planned paths."""
    import datetime as dt

    from pyspark.sql import functions as F2
    from pyspark.sql.types import TimestampType

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    s = StructType(
        [StructField("ts", TimestampType(), True), StructField("v", LongType(), True)]
    )
    rows = [
        (dt.datetime(2024, 9, 1 + d, h, 0, 0), d * 10 + h)
        for d in range(4)
        for h in range(3)
    ]
    t = catalog.create_table(
        TableIdentifier.parse("pt.todf"), s, partition_by=["day(ts)"]
    )
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame(rows, s).coalesce(1)
    ).commit()
    # MOR-delete one row from day 1 (v = 11)
    keys = spark.createDataFrame([(11,)], "v long")
    t = t.new_transaction().delete_keys_dataframe(keys).commit()

    probe = dt.date(2024, 9, 2)  # day index 1
    got = sorted(
        r["v"]
        for r in t.to_df(spark, transformed_filter={"ts": probe}).collect()
    )
    assert got == [10, 12]  # day 1's rows minus the MOR-deleted one

    lo, hi = dt.datetime(2024, 9, 2), dt.datetime(2024, 9, 3, 23, 59, 59)
    got2 = sorted(
        r["v"] for r in t.to_df(spark, transformed_range=("ts", lo, hi)).collect()
    )
    assert got2 == [10, 12, 20, 21, 22]  # days 1-2, delete applied

    # and row-level correctness aside, the prune really narrowed the scan
    assert len(t.planned_files_transformed({"ts": probe})) == 1
