"""Unit coverage for the r16 clustered manifest split (pure Python —
the integration behavior is pinned in test_planner_scale /
test_catalog; these pin the splitter's own invariants)."""

from __future__ import annotations

from iceberg_catalog_postgres_spark.catalog.metadata import (
    MANIFEST_CHUNK_TARGET,
    cluster_entries,
    encode_bound,
    split_entries,
)


def _e(path, part=None, lo=None):
    e = {"path": path, "kind": "data"}
    if part:
        e["partition"] = part
    if lo is not None:
        e["stats"] = {"bounds": {"id": [encode_bound(lo), encode_bound(lo)]}}
    return e


def test_split_balanced_and_bounded():
    entries = [_e(f"f{i:05d}", lo=i) for i in range(1001)]
    parts = split_entries(entries, 400)
    assert len(parts) == 3  # ceil(1001/400)
    sizes = [len(p) for p in parts]
    assert sum(sizes) == 1001 and max(sizes) <= 400
    # no entry lost or duplicated
    flat = [e["path"] for p in parts for e in p]
    assert sorted(flat) == sorted(e["path"] for e in entries)


def test_cluster_orders_by_partition_then_bound():
    entries = [
        _e("c", part={"day": "3"}, lo=5),
        _e("a", part={"day": "1"}, lo=9),
        _e("b", part={"day": "1"}, lo=2),
        _e("d", lo=1),  # unpartitioned sorts by its bound group
    ]
    ordered = cluster_entries(entries)
    days = [
        (e.get("partition") or {}).get("day") for e in ordered
    ]
    assert days == [None, "1", "1", "3"]
    # within day=1: bound order 2 then 9
    assert [e["path"] for e in ordered][1:3] == ["b", "a"]


def test_cluster_mixed_bound_types_falls_back_to_path():
    entries = [
        _e("b", lo="zz"),   # string bound
        _e("a", lo=7),      # int bound on the same column
    ]
    ordered = cluster_entries(entries)  # TypeError inside -> path order
    assert [e["path"] for e in ordered] == ["a", "b"]


def test_split_single_chunk_below_target():
    entries = [_e(f"f{i}") for i in range(5)]
    assert len(split_entries(entries, MANIFEST_CHUNK_TARGET)) == 1
    assert split_entries([], 100) == [[]]
