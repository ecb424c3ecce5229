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
    from iceberg_catalog_postgres_spark.catalog.metadata import plan_manifests

    store = cat.object_store()
    monkeypatch.setattr(md_mod, "MANIFEST_THRESHOLD", 100)
    # spill to chunks: one full-rewrite plan (chunked by make_chunk sizing)
    plan_manifests(store, t.metadata.location, "overwrite", None, None, snap)
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
