"""Planner scale evidence (r8): metadata-only scan planning must stay
fast and exact at file counts far beyond the fixtures — the local proxy
for the 10^7-file claim. Synthetic Snapshot metadata (no real files):
20k data entries across 200 day-partitions x 2 buckets, spilled to
manifest chunks, then every planner walks it."""

from __future__ import annotations

import time

import pytest
from pyspark.sql.types import LongType, StructField, StructType, TimestampType

from iceberg_catalog_postgres_spark.catalog.catalog import (
    PostgresCatalog,
    TableIdentifier,
)
from iceberg_catalog_postgres_spark.catalog.metadata import FIELD_ID_KEY

N_DAYS, N_BUCKETS, FILES_PER = 200, 2, 50  # 20_000 entries


@pytest.fixture
def big_table(tmp_path, monkeypatch):
    import iceberg_catalog_postgres_spark.catalog.metadata as md_mod
    from iceberg_catalog_postgres_spark.catalog.metadata import Snapshot

    cat = PostgresCatalog.connect("scale_cat", None, str(tmp_path / "wh"))
    cat.initialize()
    S = StructType(
        [
            StructField("id", LongType(), True, {FIELD_ID_KEY: 1}),
            StructField("ts", TimestampType(), True, {FIELD_ID_KEY: 2}),
            StructField("uid", LongType(), True, {FIELD_ID_KEY: 3}),
        ]
    )
    t = cat.create_table(
        TableIdentifier.parse("sc.big"), S, partition_by=["day(ts)", "bucket(2,uid)"]
    )
    day0 = 19723  # 2024-01-01
    files, seqs, parts, stats = [], {}, {}, {}
    for d in range(N_DAYS):
        for b in range(N_BUCKETS):
            for i in range(FILES_PER // N_BUCKETS):
                rel = f"data/d{d}/b{b}/f{i}.parquet"
                files.append(rel)
                seqs[rel] = 1
                parts[rel] = {"day(ts)": str(day0 + d), "bucket(2,uid)": str(b)}
                lo = (day0 + d) * 86_400_000_000
                stats[rel] = {
                    "record_count": 1000,
                    "bounds": {"id": [d * 1000 + i, d * 1000 + i + 999]},
                    "null_counts": {"uid": 0},
                }
    snap = Snapshot(
        snapshot_id=1, timestamp_ms=1, operation="append", data_files=files,
        sequence_number=1, file_seqs=seqs, file_partitions=parts, file_stats=stats,
    )
    from iceberg_catalog_postgres_spark.catalog.metadata import (
        make_chunk,
        snapshot_entries,
    )

    store = cat.object_store()
    monkeypatch.setattr(md_mod, "MANIFEST_THRESHOLD", 100)
    # spill to a MANY-chunk index (r15): 400 entries per chunk -> 25
    # chunks of 8 days each, so chunk-level summary exclusion and the
    # per-branch walk budget are observable (a single full-rewrite chunk
    # would make every plan cost exactly one fetch)
    entries = snapshot_entries(snap)
    snap.manifests = [
        make_chunk(store, t.metadata.location, entries[i : i + 400])
        for i in range(0, len(entries), 400)
    ]
    from dataclasses import replace as _dc

    md = _dc(t.metadata, snapshots=[snap], current_snapshot_id=1)
    loc = t.metadata.location + "/metadata/big.metadata.json"
    store.put(loc, md.to_json().encode())
    cat.update_table(t.identifier, loc, t.metadata_location())
    yield cat.load_table(t.identifier)
    cat.backend.close()


def test_planning_20k_files_fast_and_exact(big_table):
    import datetime as dt

    t = big_table
    assert len(t.metadata.current_data_files()) == N_DAYS * FILES_PER

    # point partition plan: one day x one bucket
    t0 = time.perf_counter()
    planned = t.planned_files_transformed(
        {"ts": dt.datetime(2024, 1, 11, 12, 0)}  # day 10
    )
    dt_point = time.perf_counter() - t0
    assert len(planned) == FILES_PER  # exactly one day's files
    assert dt_point < 3.0, f"point planning took {dt_point:.2f}s for 20k entries"

    # composed range+point: 3 days x 1 bucket
    t0 = time.perf_counter()
    comp = t.planned_files_composed(
        ranges={"ts": (dt.datetime(2024, 1, 11), dt.datetime(2024, 1, 13, 23, 59))},
        points={"uid": 0},
    )
    dt_comp = time.perf_counter() - t0
    assert len(comp) == 3 * FILES_PER // N_BUCKETS
    assert dt_comp < 3.0, f"composed planning took {dt_comp:.2f}s"

    # manifest-bounds range plan on a non-partition column
    t0 = time.perf_counter()
    pb = t.planned_files("id", 10_500, 10_520, require_stats=True)
    dt_rng = time.perf_counter() - t0
    assert 0 < len(pb) <= FILES_PER
    assert dt_rng < 3.0, f"bounds planning took {dt_rng:.2f}s"

    # metadata-only record count folds summaries, no chunk inflation
    t0 = time.perf_counter()
    assert t.record_count() == N_DAYS * FILES_PER * 1000
    assert time.perf_counter() - t0 < 2.0


def test_dnf_24_branch_walk_budget(big_table):
    """r15 (VERDICT r14 #4): the DNF branch planner's manifest-index cost
    is bounded — a 24-branch disjunction (the _MAX_OR_BRANCHES cap) over
    20k files walks the chunk index once per branch and fetches only the
    chunks whose summaries intersect each branch, never branches x
    all-chunks. Planned set is the exact union; the 25th branch trips
    the cap and declines to prune (superset-safe full plan)."""
    import datetime as dt

    import iceberg_catalog_postgres_spark.catalog.metadata as md_mod
    from iceberg_catalog_postgres_spark.catalog.select_sql import (
        prune_subset_for_where,
    )

    t = big_table
    snap = t.metadata.current_snapshot()
    n_chunks = len(snap.chunk_refs())
    assert n_chunks >= 24, "budget claim needs a many-chunk index"

    # measure one branch's chunk cost (a single day point)
    before = md_mod.MANIFEST_CHUNK_READS
    single = t.planned_files_composed(points={"ts": dt.datetime(2024, 1, 2)})
    per_branch = md_mod.MANIFEST_CHUNK_READS - before
    assert len(single) == FILES_PER
    assert per_branch < n_chunks  # chunk-level exclusion works at all

    days = [dt.date(2024, 1, 1) + dt.timedelta(days=3 * i) for i in range(24)]
    where = " OR ".join(f"ts = '{d} 00:00:00'" for d in days)
    before = md_mod.MANIFEST_CHUNK_READS
    t0 = time.perf_counter()
    subset = prune_subset_for_where(t, t.identifier, where)
    walked = md_mod.MANIFEST_CHUNK_READS - before
    elapsed = time.perf_counter() - t0
    assert subset is not None and len(subset) == 24 * FILES_PER
    # budget: each branch fetches at most what a single branch fetches
    # (plus slack for chunk-boundary days), far below branches x chunks
    assert walked <= 24 * (per_branch + 1), (walked, per_branch)
    assert walked < n_chunks * 24 / 4, "DNF walk fetched like a full scan"
    assert elapsed < 5.0, f"24-branch planning took {elapsed:.2f}s"

    # 25 branches exceed the cap: planner declines, plans everything
    days25 = days + [dt.date(2024, 1, 1) + dt.timedelta(days=73)]
    where25 = " OR ".join(f"ts = '{d} 00:00:00'" for d in days25)
    assert prune_subset_for_where(t, t.identifier, where25) is None


def test_rewrite_manifests_clusters_mega_chunk(big_table):
    """r16: consolidation emits CLUSTERED bounded chunks, not one mega
    chunk. A single 20k-entry chunk's summary covers everything — every
    plan fetches (and scans) it; after rewrite_manifests the layout is
    ~target-sized partition-sorted chunks and a one-day point walk
    fetches O(1) of them with an identical planned set."""
    import datetime as dt
    from dataclasses import replace as _dc

    import iceberg_catalog_postgres_spark.catalog.metadata as md_mod
    from iceberg_catalog_postgres_spark.catalog.maintenance import (
        rewrite_manifests,
    )

    t = big_table
    cat = t.catalog
    store = cat.object_store()
    snap = t.metadata.current_snapshot()
    probe = dt.datetime(2024, 1, 11, 12, 0)  # day 10
    want = set(t.planned_files_transformed({"ts": probe}))
    assert len(want) == FILES_PER

    # collapse the index to ONE mega chunk (the pre-r16 full-rewrite and
    # consolidation shape)
    entries = md_mod.snapshot_entries(snap)
    snap.manifests = [md_mod.make_chunk(store, t.metadata.location, entries)]
    md = _dc(t.metadata)
    loc = t.metadata.location + "/metadata/mega.metadata.json"
    store.put(loc, md.to_json().encode())
    cat.update_table(t.identifier, loc, t.metadata_location())
    t = cat.load_table(t.identifier)
    assert len(t.metadata.current_snapshot().manifests) == 1

    # fragmented? no — one chunk. Oversized? yes: 20k entries >> 2x400
    t = rewrite_manifests(t, max_chunks=8, target_entries=400)
    refs = t.metadata.current_snapshot().chunk_refs()
    assert refs is not None and len(refs) == 25  # ceil(10000/400)
    # every chunk bounded and summarized
    assert all(
        sum(c["summary"]["counts"].values()) <= 400 for c in refs
    )
    # clustered: the one-day walk fetches O(1) chunks of the 25
    before = md_mod.MANIFEST_CHUNK_READS
    got = set(t.planned_files_transformed({"ts": probe}))
    fetched = md_mod.MANIFEST_CHUNK_READS - before
    assert got == want
    assert fetched <= 2, f"day-point walk fetched {fetched} of 25 chunks"
    # stable: the clustered layout is a no-op for another pass
    t2 = rewrite_manifests(t, max_chunks=8, target_entries=400)
    assert t2.metadata_location() == t.metadata_location()
