"""Catalog-backed scan as a registered query: the reference's E2 read path
(pointer lookup -> metadata JSON -> DataFrame, SURVEY §3) exercised
end-to-end through the driver contract.

Ephemeral state lives under ``.tmp/`` inside the repo (gitignored); each run
rebuilds it from the fixture parquet, so the query is deterministic and the
DuckDB oracle can check values (the oracle just reads the source fixture —
the catalog round-trip must be value-preserving).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.catalog.catalog import PostgresCatalog, TableIdentifier
from iceberg_catalog_postgres_spark.registry import load, register

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@register(
    "catalog_roundtrip_scan",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
    tags=("catalog",),
)
def catalog_roundtrip_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full E1+E2+E3 lifecycle: create table in a fresh catalog, append the
    nation fixture through a snapshot transaction, drop+reload via the
    pointer, and return the scanned DataFrame. Value-preservation is checked
    against the fixture itself by the oracle.

    Scale: the catalog path cost is O(1) per query (one point SELECT + one
    small JSON GET) regardless of data volume — the scan plans directly over
    the snapshot's file list with no directory listing.
    """
    work = os.path.join(_REPO_ROOT, ".tmp", "catalog_roundtrip")
    shutil.rmtree(work, ignore_errors=True)

    os.makedirs(work, exist_ok=True)
    catalog = PostgresCatalog.connect(
        "demo", f"sqlite://{os.path.join(work, 'catalog.db')}", os.path.join(work, "warehouse")
    )
    catalog.initialize()

    src = load(spark, sf_dir, "nation")
    ident = TableIdentifier.parse("fixtures.nation")
    table = catalog.create_table(ident, src.schema)
    table.new_transaction().append_dataframe(src).commit()

    loaded = catalog.load_table(ident)
    return loaded.to_df(spark).select(
        F.col("n_nationkey"), F.col("n_name"), F.col("n_regionkey")
    )
