"""SparkSession factory tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32), but every
config here is chosen to also hold on a 1000-executor cluster reading 100 TB:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting, and
  SMJ->broadcast conversion are the mechanisms that make the same declarative
  plan survive a 100x scale-up without manual retuning.
- ``spark.sql.shuffle.partitions`` is only the *initial* number; AQE coalesces
  down at small SF and a real cluster raises it (rule of thumb: ~128 MB of
  shuffle data per partition).
- Arrow enabled: every pandas interchange (toPandas, Pandas UDFs, applyInPandas)
  moves columnar batches instead of pickled rows.
- Session timezone pinned to UTC so timestamp semantics are deterministic and
  match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "iceberg-catalog-postgres-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = cpus or default_cpus()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # r15: let AQE re-plan CACHED frames too (default false). The MOR
        # merge persists its full-outer join; without this, the cache
        # materializes at the full pre-AQE shuffle width (32 tasks of
        # near-empty partitions at bench scale — measured ~25% of the
        # merge-commit phase in pure task scheduling). Nothing in the repo
        # depends on a cached plan's output partitioning (positions come
        # from parquet _metadata, ids are checked for uniqueness only).
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.session.timeZone", "UTC")
        # INT96 (the default) writes NO parquet column statistics for
        # timestamps — it would make every ts column unprunable forever.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
        # Small-dim broadcast threshold: nation/region/supplier always fit; at
        # 100 TB, AQE still converts SMJ->BHJ when the built side is < threshold.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # events.parquet carries TIMESTAMP(NANOS) which the vectorized reader
        # rejects; read as long and convert in registry.load (ns -> us floor
        # division, matching DuckDB's truncation to microseconds).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
