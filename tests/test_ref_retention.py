"""Per-ref retention policies (Iceberg's min-snapshots-to-keep /
max-snapshot-age-ms / max-ref-age-ms, stored on refs via ``set_ref``):
``expire_snapshots`` honors each branch/tag's own policy on top of the
call's global policy — two branches with different policies retain
different depths of the shared history, and an aged-out ref releases its
pins in the same expiry commit."""

from __future__ import annotations

import time as _time

import pytest
from pyspark.sql.types import LongType, StructField, StructType

from iceberg_catalog_postgres_spark.catalog.catalog import (
    PostgresCatalog,
    TableIdentifier,
)
from iceberg_catalog_postgres_spark.catalog.maintenance import expire_snapshots

S = StructType([StructField("k", LongType(), True)])


@pytest.fixture
def catalog(tmp_path):
    cat = PostgresCatalog.connect("refret", None, str(tmp_path / "wh"))
    cat.initialize()
    yield cat
    cat.backend.close()


def _grow(catalog, spark, name, n):
    """n append snapshots with strictly increasing timestamps."""
    t = catalog.create_table(TableIdentifier.parse(name), S)
    snaps = []
    for i in range(n):
        t = t.new_transaction().append_dataframe(
            spark.createDataFrame([(i,)], S).coalesce(1)
        ).commit()
        snaps.append(t.metadata.current_snapshot())
        while int(_time.time() * 1000) <= snaps[-1].timestamp_ms:
            _time.sleep(0.002)
    return t, snaps


def test_two_branches_different_min_keep_depths(catalog, spark):
    """branch at s3 with min-keep 3 pins s1..s3; branch at s6 with min-keep
    2 pins s5,s6 — under a global keep_last=1, only s4 expires."""
    t, snaps = _grow(catalog, spark, "rr.two", 6)
    t = t.set_ref(
        "b_old", snaps[2].snapshot_id, ref_type="branch", min_snapshots_to_keep=3
    )
    t = t.set_ref(
        "b_new", snaps[5].snapshot_id, ref_type="branch", min_snapshots_to_keep=2
    )
    t = expire_snapshots(t, keep_last=1)
    kept = {s.snapshot_id for s in t.metadata.snapshots}
    exp = {snaps[i].snapshot_id for i in (0, 1, 2, 4, 5)}
    assert kept == exp, "per-branch min-keep depths not honored"
    # both branch heads still readable
    assert "b_old" in t.metadata.refs and "b_new" in t.metadata.refs


def test_branch_max_snapshot_age_window(catalog, spark):
    """A branch's max-snapshot-age-ms keeps exactly the ancestors inside
    the window (clock pinned via now_ms for determinism)."""
    t, snaps = _grow(catalog, spark, "rr.age", 5)
    now = snaps[-1].timestamp_ms + 1
    # window reaches back to s3 (inclusive), not s1/s2
    age = now - snaps[2].timestamp_ms
    t = t.set_ref(
        "b", snaps[4].snapshot_id, ref_type="branch", max_snapshot_age_ms=age
    )
    t = expire_snapshots(t, keep_last=1, now_ms=now)
    kept = {s.snapshot_id for s in t.metadata.snapshots}
    assert kept == {snaps[i].snapshot_id for i in (2, 3, 4)}


def test_max_ref_age_releases_pins(catalog, spark):
    """An aged-out tag is dropped in the expiry commit and its snapshot
    becomes expirable; a fresh tag (no age cap / within cap) survives."""
    t, snaps = _grow(catalog, spark, "rr.refage", 4)
    t = t.set_ref(
        "stale_tag", snaps[0].snapshot_id, ref_type="tag", max_ref_age_ms=1
    )
    t = t.set_ref("pinned_tag", snaps[1].snapshot_id, ref_type="tag")
    now = snaps[-1].timestamp_ms + 10_000
    t = expire_snapshots(t, keep_last=1, now_ms=now)
    assert "stale_tag" not in t.metadata.refs
    assert "pinned_tag" in t.metadata.refs
    kept = {s.snapshot_id for s in t.metadata.snapshots}
    assert snaps[0].snapshot_id not in kept, "aged-out ref still pinning"
    assert snaps[1].snapshot_id in kept and snaps[3].snapshot_id in kept


def test_ref_age_drop_alone_commits(catalog, spark):
    """Even when no snapshot would otherwise expire (chain <= keep_last),
    an aged-out ref is still dropped (the expiry commit happens)."""
    t, snaps = _grow(catalog, spark, "rr.dropsolo", 2)
    t = t.set_ref(
        "old", snaps[0].snapshot_id, ref_type="tag", max_ref_age_ms=1
    )
    t = expire_snapshots(t, keep_last=5, now_ms=snaps[-1].timestamp_ms + 10_000)
    assert "old" not in t.metadata.refs
    # nothing needed expiring beyond the pin release: both snapshots kept
    assert len(t.metadata.snapshots) == 2


def test_set_ref_preserves_existing_properties(catalog, spark):
    """Moving a ref keeps its prior properties (a WAP branch's
    base-snapshot-id, retention keys) unless overridden."""
    t, snaps = _grow(catalog, spark, "rr.move", 3)
    t = t.set_ref(
        "b", snaps[0].snapshot_id, ref_type="branch", min_snapshots_to_keep=2
    )
    t = t.set_ref("b", snaps[2].snapshot_id, ref_type="branch")
    r = t.metadata.refs["b"]
    assert r["snapshot-id"] == snaps[2].snapshot_id
    assert r["min-snapshots-to-keep"] == 2, "retention lost on ref move"


def test_retention_kwargs_validated(catalog, spark):
    t, snaps = _grow(catalog, spark, "rr.val", 1)
    with pytest.raises(ValueError, match="branches only"):
        t.set_ref("x", ref_type="tag", min_snapshots_to_keep=2)
    with pytest.raises(ValueError, match="branches only"):
        t.set_ref("x", ref_type="tag", max_snapshot_age_ms=5)
    # max-ref-age is legal on tags
    t.set_ref("x", ref_type="tag", max_ref_age_ms=5)


def test_vacuum_flows_per_ref_retention(catalog, spark):
    """vacuum's expiry pass honors the same per-ref policies."""
    from iceberg_catalog_postgres_spark.catalog.maintenance import vacuum

    t, snaps = _grow(catalog, spark, "rr.vac", 4)
    t = t.set_ref(
        "b", snaps[3].snapshot_id, ref_type="branch", min_snapshots_to_keep=3
    )
    t, report = vacuum(t, keep_last_snapshots=1, orphan_older_than_s=0.0)
    kept = {s.snapshot_id for s in t.metadata.snapshots}
    assert kept == {snaps[i].snapshot_id for i in (1, 2, 3)}
    assert report["snapshots_expired"] == 1
