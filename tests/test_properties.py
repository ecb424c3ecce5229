"""Property-based tests (hypothesis) for the codec/identifier layers —
the parts where hand-picked examples miss edge cases."""

from __future__ import annotations

import string

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from iceberg_catalog_postgres_spark.catalog.catalog import TableIdentifier
from iceberg_catalog_postgres_spark.catalog.metadata import (
    Snapshot,
    TableMetadata,
    schema_to_iceberg,
    schema_to_spark,
)

_name = st.text(alphabet=string.ascii_lowercase + "_", min_size=1, max_size=12)
_primitive = st.sampled_from(
    [BooleanType(), IntegerType(), LongType(), FloatType(), DoubleType(), StringType()]
)
_dtype = st.recursive(_primitive, lambda inner: st.builds(ArrayType, inner), max_leaves=3)


@st.composite
def _schemas(draw):
    n = draw(st.integers(min_value=1, max_value=6))
    names = draw(st.lists(_name, min_size=n, max_size=n, unique=True))
    return StructType(
        [StructField(nm, draw(_dtype), draw(st.booleans())) for nm in names]
    )


@given(_schemas())
@settings(max_examples=50, deadline=None)
def test_schema_codec_roundtrip(schema):
    """StructType -> iceberg fields -> StructType preserves names, types,
    nullability, and assigns stable increasing field ids."""
    back = schema_to_spark(schema_to_iceberg(schema))
    assert [f.name for f in back.fields] == [f.name for f in schema.fields]
    assert [f.dataType for f in back.fields] == [f.dataType for f in schema.fields]
    assert [f.nullable for f in back.fields] == [f.nullable for f in schema.fields]


@given(st.lists(_name, min_size=2, max_size=4))
@settings(max_examples=50, deadline=None)
def test_identifier_parse_display_roundtrip(parts):
    s = ".".join(parts)
    ident = TableIdentifier.parse(s)
    assert str(ident) == s
    assert ident.name == parts[-1]
    assert list(ident.namespace) == parts[:-1]


@given(st.text(max_size=5))
@settings(max_examples=50, deadline=None)
def test_identifier_rejects_invalid(s):
    """Strings without a dot-separated ns.name structure must raise."""
    if "." not in s or any(not p for p in s.split(".")):
        with pytest.raises(ValueError):
            TableIdentifier.parse(s)


@given(
    st.lists(
        st.builds(
            Snapshot,
            snapshot_id=st.integers(min_value=1, max_value=2**60),
            timestamp_ms=st.integers(min_value=0, max_value=2**50),
            operation=st.sampled_from(["append", "overwrite"]),
            data_files=st.lists(_name, max_size=4),
        ),
        max_size=4,
        unique_by=lambda s: s.snapshot_id,
    )
)
@settings(max_examples=50, deadline=None)
def test_metadata_json_roundtrip(snapshots):
    md = TableMetadata.new("data.db/ns/t", StructType([StructField("a", StringType(), True)]))
    for s in snapshots:
        md = md.with_snapshot(s)
    back = TableMetadata.from_json(md.to_json())
    assert back.table_uuid == md.table_uuid
    assert back.current_snapshot_id == md.current_snapshot_id
    assert [s.snapshot_id for s in back.snapshots] == [s.snapshot_id for s in md.snapshots]
    assert back.current_data_files() == md.current_data_files()


# ---------------------------------------------------------------------------
# r5 property tests: partition transforms, bound codec, chunk summaries
# ---------------------------------------------------------------------------

from iceberg_catalog_postgres_spark.catalog.metadata import (
    chunk_summary,
    decode_bound,
    encode_bound,
)
from iceberg_catalog_postgres_spark.catalog.table import (
    parse_partition_field,
    transform_value,
)


@given(st.integers(min_value=-(2**40), max_value=2**40), st.integers(2, 64))
def test_bucket_transform_in_range_and_stable(v, n):
    """bucket(N) lands in [0, N) and is a pure function of the value."""
    entry = f"bucket({n},c)"
    b = transform_value(entry, v)
    assert 0 <= int(b) < n
    assert transform_value(entry, v) == b
    # planner contract: a query value arriving as a string still maps to the
    # column's bucket once the caller passes the source type (the typed
    # murmur3 hash distinguishes int 34 from string "34" by design —
    # planned_files_transformed coerces via the schema)
    assert transform_value(entry, str(v), src_type="bigint") == b
    # legacy CRC-32 tables keep the untyped str-form equivalence
    assert transform_value(entry, str(v), bucket_hash="crc32") == transform_value(
        entry, v, bucket_hash="crc32"
    )


@given(st.integers(min_value=-(2**40), max_value=2**40), st.integers(1, 1000))
def test_truncate_int_floor_property(v, w):
    """truncate(W) on ints floors to a multiple of W, never above v, within
    W of v — Iceberg's negative-safe floor."""
    t = int(transform_value(f"truncate({w},c)", v))
    assert t % w == 0
    assert t <= v < t + w


@given(st.text(min_size=0, max_size=40), st.integers(1, 10))
def test_truncate_string_prefix_property(s, w):
    t = transform_value(f"truncate({w},c)", s)
    assert t == s[:w]
    assert s.startswith(t)


@given(st.one_of(st.integers(-(2**50), 2**50), st.floats(allow_nan=False, allow_infinity=False), st.text(max_size=30), st.booleans()))
def test_bound_codec_roundtrip_primitives(v):
    e = encode_bound(v)
    assert decode_bound(e) == v


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["data", "eq-delete", "pos-delete"]),
            st.integers(0, 10_000),  # record_count
            st.integers(0, 10**9),  # file_size_bytes
        ),
        min_size=0,
        max_size=20,
    )
)
def test_chunk_summary_totals_are_exact_folds(entries):
    """Summary counts/records/bytes must equal the per-entry sums for every
    kind — the invariant every metadata fold relies on."""
    docs = [
        {
            "path": f"f{i}",
            "kind": k,
            "seq": 1,
            "stats": {"record_count": rc, "file_size_bytes": fb},
        }
        for i, (k, rc, fb) in enumerate(entries)
    ]
    s = chunk_summary(docs)
    for kind in ("data", "eq-delete", "pos-delete"):
        sel = [(rc, fb) for (k, rc, fb) in entries if k == kind]
        assert s["counts"][kind] == len(sel)
        assert s["records"][kind] == sum(rc for rc, _ in sel)
        assert s["bytes"][kind] == sum(fb for _, fb in sel)


@given(st.lists(st.integers(0, 3), min_size=1, max_size=8))
def test_parse_partition_field_identity_fallback(parts):
    """Anything that is not bucket(...)/truncate(...) parses as identity."""
    name = "c" + "".join(str(p) for p in parts)
    assert parse_partition_field(name) == ("identity", None, name)


@given(
    st.lists(st.integers(0, 10**12), min_size=1, max_size=10, unique=True).map(sorted),
    st.integers(0, 10**12),
)
def test_snapshot_as_of_resolution_rule(ts_list, probe):
    """snapshot_as_of returns the LAST snapshot at-or-before the probe —
    None before the first commit, the newest snapshot after the last."""
    from iceberg_catalog_postgres_spark.catalog.metadata import Snapshot, TableMetadata

    snaps = [
        Snapshot(snapshot_id=i + 1, timestamp_ms=t, operation="append", data_files=[])
        for i, t in enumerate(ts_list)
    ]
    md = TableMetadata(
        table_uuid="u", location="loc", schema={"fields": []}, snapshots=snaps,
        current_snapshot_id=len(ts_list),
    )
    got = md.snapshot_as_of(probe)
    expect = None
    for s in snaps:
        if s.timestamp_ms <= probe:
            expect = s
    assert got is expect


@given(
    st.lists(
        st.tuples(st.integers(-10**6, 10**6), st.integers(0, 10**6), st.booleans()),
        min_size=1,
        max_size=15,
    )
)
def test_chunk_summary_bounds_merge_property(specs):
    """Merged chunk bounds are the exact min/max over covered entries; a
    single truncated (None) upper poisons only the chunk's upper bound —
    the lower stays usable, coverage count stays exact."""
    from iceberg_catalog_postgres_spark.catalog.metadata import chunk_summary, decode_bound

    entries = []
    for i, (lo, width, hi_none) in enumerate(specs):
        hi = None if hi_none else lo + width
        entries.append(
            {
                "path": f"f{i}",
                "kind": "data",
                "seq": 1,
                "stats": {"record_count": 1, "bounds": {"c": [lo, hi]}},
            }
        )
    s = chunk_summary(entries)
    b = s["bounds"]["c"]
    los = [sp[0] for sp in specs]
    assert decode_bound(b["lo"]) == min(los)
    assert b["n"] == len(specs)
    if any(h for (_, _, h) in specs):
        assert b["hi"] is None
    else:
        assert decode_bound(b["hi"]) == max(lo + w for (lo, w, _) in specs)


# ---- r7: tz-invariance + temporal monotonicity of partition transforms ----

_TEMPORAL_ENTRIES = ("year(c)", "month(c)", "day(c)", "hour(c)", "bucket(16, c)")


@given(
    st.integers(min_value=-(2**44), max_value=2**44),  # micros ~ +/-557 years
    st.integers(min_value=-14 * 60, max_value=14 * 60),  # offset minutes
)
@settings(max_examples=100, deadline=None)
def test_transform_value_is_offset_invariant(micros, offset_min):
    """The same INSTANT expressed under any UTC offset must transform to the
    same partition value (ADVICE r6: the epoch-with-v.tzinfo bug planned a
    different day/bucket for +05:00 spellings)."""
    import datetime as dt

    from iceberg_catalog_postgres_spark.catalog.table import transform_value

    utc_naive = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=micros)
    tz = dt.timezone(dt.timedelta(minutes=offset_min))
    aware = utc_naive.replace(tzinfo=dt.timezone.utc).astimezone(tz)
    for entry in _TEMPORAL_ENTRIES:
        assert transform_value(entry, aware, src_type="timestamp") == \
            transform_value(entry, utc_naive, src_type="timestamp"), entry


@given(
    st.integers(min_value=-(2**44), max_value=2**44),
    st.integers(min_value=0, max_value=2**44),
)
@settings(max_examples=100, deadline=None)
def test_temporal_transforms_are_monotone(micros, delta):
    """a <= b  =>  T(a) <= T(b) for year/month/day/hour — the property
    planned_files_transformed_range's bound mapping relies on."""
    import datetime as dt

    from iceberg_catalog_postgres_spark.catalog.table import transform_value

    a = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=micros)
    b = a + dt.timedelta(microseconds=delta)
    for entry in ("year(c)", "month(c)", "day(c)", "hour(c)"):
        ta = int(transform_value(entry, a, src_type="timestamp"))
        tb = int(transform_value(entry, b, src_type="timestamp"))
        assert ta <= tb, (entry, a, b)


@given(st.lists(st.integers(min_value=0, max_value=10**6), min_size=0, max_size=300))
@settings(max_examples=50, deadline=None)
def test_metadata_log_bounded_and_newest_kept(ids):
    """with_log_entry never exceeds METADATA_LOG_MAX and always keeps the
    newest suffix in order."""
    from pyspark.sql.types import LongType, StructField, StructType

    md = TableMetadata.new(
        "/w/t", StructType([StructField("k", LongType(), True)])
    )
    for i, x in enumerate(ids):
        md = md.with_log_entry(f"/w/t/metadata/v{x}-{i}.metadata.json", 1000 + i)
    cap = TableMetadata.METADATA_LOG_MAX
    assert len(md.metadata_log) == min(len(ids), cap)
    expected_ts = [1000 + i for i in range(len(ids))][-cap:]
    assert [e["timestamp-ms"] for e in md.metadata_log] == expected_ts
