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
