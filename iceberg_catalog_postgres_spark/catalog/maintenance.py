"""Catalog table maintenance: MERGE-style upsert and small-file compaction,
both expressed as snapshot-overwrite transactions through the CAS protocol.

These are the operations that keep an Iceberg-style table healthy under
continuous ingestion at scale: upserts reconcile late/corrected records,
compaction bounds the file count (and therefore scan-planning and task-
scheduling overhead) as streaming commits accumulate small files.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.catalog.catalog import PostgresCatalog, TableIdentifier
from iceberg_catalog_postgres_spark.catalog.table import Table
from iceberg_catalog_postgres_spark.registry import load, register

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def merge_upsert(spark: SparkSession, table: Table, updates: DataFrame, key_cols: list[str]) -> Table:
    """MERGE (upsert): rows in ``updates`` replace current rows with the same
    key; unmatched update rows are inserted. Implemented as copy-on-write:
    anti-join current state against update keys, union the updates, write,
    and commit as an OVERWRITE snapshot (atomic pointer swap — readers see
    pre- or post-merge state, never a mix).

    Scale: the anti-join shuffles on the merge key; at 100 TB the refinement
    is partition-scoped copy-on-write (rewrite only partitions containing
    matched keys — metadata tells you which) or merge-on-read deletes. The
    commit cost stays O(1) either way.
    """
    current = table.to_df(spark)
    kept = current.join(updates.select(*key_cols), key_cols, "left_anti")
    merged = kept.unionByName(updates)
    return table.new_transaction().overwrite_dataframe(merged).commit()


def compact_table(spark: SparkSession, table: Table, target_partitions: int = 1) -> Table:
    """Small-file compaction: read current snapshot, rewrite as
    ``target_partitions`` files, commit as an OVERWRITE snapshot. Old files
    stay referenced by older snapshots (time travel intact) until a GC pass.

    Scale: compaction is the antidote to per-micro-batch files from
    streaming commits; target size ~128 MB-1 GB per file keeps scan tasks
    coarse. The rewrite is executor-parallel; only the commit serializes.
    """
    current = table.to_df(spark).coalesce(target_partitions)
    return table.new_transaction().overwrite_dataframe(current).commit()


def _fresh_catalog(name: str) -> PostgresCatalog:
    work = os.path.join(_REPO_ROOT, ".tmp", name)
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)
    cat = PostgresCatalog.connect(
        name, f"sqlite://{os.path.join(work, 'catalog.db')}", os.path.join(work, "warehouse")
    )
    cat.initialize()
    return cat


@register(
    "catalog_merge_upsert",
    oracle="""
    WITH updates AS (
      SELECT n_nationkey, upper(n_name) AS n_name, n_regionkey
      FROM nation WHERE n_nationkey < 5
    )
    SELECT n.n_nationkey,
           coalesce(u.n_name, n.n_name) AS n_name,
           n.n_regionkey
    FROM nation n LEFT JOIN updates u ON n.n_nationkey = u.n_nationkey
    """,
    tags=("catalog", "merge"),
)
def catalog_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE demo: upsert uppercased names for nations 0-4 into a catalog
    table seeded from the fixture; result must equal the oracle's
    left-join/coalesce reconstruction — proving upsert = keyed replacement.
    """
    cat = _fresh_catalog("catalog_merge_demo")
    src = load(spark, sf_dir, "nation")
    ident = TableIdentifier.parse("maint.nation")
    table = cat.create_table(ident, src.schema)
    table = table.new_transaction().append_dataframe(src).commit()

    updates = src.filter(F.col("n_nationkey") < 5).withColumn("n_name", F.upper("n_name"))
    table = merge_upsert(spark, table, updates, ["n_nationkey"])
    return table.to_df(spark).select("n_nationkey", "n_name", "n_regionkey")


@register("catalog_compaction", oracle=None, tags=("catalog", "compaction"))
def catalog_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction demo: 5 small append commits (simulated streaming) then
    one compaction; returns (files_before, files_after, n_rows) — rows-only
    check here, exact assertions in tests/test_catalog.py.
    """
    cat = _fresh_catalog("catalog_compact_demo")
    src = load(spark, sf_dir, "supplier")
    ident = TableIdentifier.parse("maint.supplier")
    table = cat.create_table(ident, src.schema)
    for i in range(5):
        batch = src.filter(F.col("s_suppkey") % 5 == i)
        table = table.new_transaction().append_dataframe(batch).commit()

    files_before = len(table.metadata.current_data_files())
    n_rows = table.to_df(spark).count()
    table = compact_table(spark, table, target_partitions=1)
    files_after = len(table.metadata.current_data_files())
    n_rows_after = table.to_df(spark).count()

    return spark.createDataFrame(
        [(files_before, files_after, n_rows, n_rows_after)],
        "files_before int, files_after int, rows_before long, rows_after long",
    )


def expire_snapshots(table: Table, keep_last: int = 2) -> Table:
    """Snapshot expiry + orphan-file cleanup: retain the most recent
    ``keep_last`` snapshots, commit the pruned metadata via CAS, then
    physically delete data files referenced ONLY by expired snapshots.

    Ordering is the crux: files are deleted AFTER the pointer swap
    succeeds, so a reader holding the old pointer during the commit still
    resolves every file it can reference through surviving snapshots; a
    reader of an expired snapshot is explicitly out of contract (that is
    what expiry means). The reference leaves all file deletion as a TODO
    (mod.rs:164) — this closes the gap.

    Scale: metadata-only decisioning (set difference of file lists), O(1)
    commit; deletes fan out as independent object-store calls.
    """
    import os as _os

    md = table.metadata
    if len(md.snapshots) <= keep_last:
        return table
    kept = md.snapshots[-keep_last:]
    expired = md.snapshots[: -keep_last]

    from iceberg_catalog_postgres_spark.catalog.metadata import TableMetadata

    new_md = TableMetadata(
        table_uuid=md.table_uuid,
        location=md.location,
        schema=md.schema,
        snapshots=kept,
        current_snapshot_id=md.current_snapshot_id,
        last_updated_ms=md.last_updated_ms,
        format_version=md.format_version,
        properties=dict(md.properties),
    )
    import posixpath as _pp
    import uuid as _uuid

    store = table.catalog.object_store()
    new_location = _pp.join(
        md.location, "metadata", f"gc-{_uuid.uuid4().hex}.metadata.json"
    )
    store.put(new_location, new_md.to_json().encode())
    committed = table.catalog.update_table(
        table.identifier, new_location, table.metadata_location()
    )

    live_files = {f for s in kept for f in s.data_files}
    orphans = {f for s in expired for f in s.data_files} - live_files
    for f in orphans:
        path = store.resolve(f)
        if _os.path.exists(path):
            _os.remove(path)
    return committed
