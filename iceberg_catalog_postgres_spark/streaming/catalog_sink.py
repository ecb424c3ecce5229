"""Exactly-once Structured Streaming -> catalog sink with batch-id fencing.

The torn-writer failure mode real pipelines hit (VERDICT r6 'Next round'
item 4): a checkpointed ``foreachBatch`` sink commits its micro-batch to
the catalog, then the driver dies BEFORE Structured Streaming records the
batch as complete in the checkpoint. On restart Spark replays the same
batch id with the same data — an unfenced sink appends it twice. The
reference's CAS commit protocol (mod.rs:309-343) makes the fix natural:
record the last committed batch id as a table property IN THE SAME metadata
document / CAS swap as the data, and make replayed (or zombie-twin) commits
of an already-landed epoch a no-op. Either the whole (data + fence) commit
is visible or none of it is, so:

- crash BEFORE the CAS: no data visible, fence unmoved -> replay re-runs
  the batch from scratch (no lost batch);
- crash AFTER the CAS, before the checkpoint ack: replay finds the fence
  at/above its batch id -> skipped (no duplicate batch);
- a zombie executor double-running the same epoch: the loser's CAS retry
  reloads the winner's metadata, re-checks the fence, and no-ops.

Scale: the fence is one small property in the metadata JSON — O(1) per
micro-batch on top of the commit the sink already makes; no extra
round-trips, no external coordination store.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.catalog.catalog import (
    PostgresCatalog,
    TableIdentifier,
)
from iceberg_catalog_postgres_spark.registry import load, register

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def fence_key(sink_id: str) -> str:
    return f"stream.{sink_id}.last-committed-batch"


def fenced_batch_sink(catalog: PostgresCatalog, identifier: TableIdentifier,
                      sink_id: str, fail_after_batch: int | None = None):
    """Build a ``foreachBatch`` callable that appends each micro-batch to the
    catalog table exactly once across restarts.

    ``fail_after_batch`` is fault injection for tests: raise AFTER the
    catalog commit of that batch id succeeds but BEFORE returning to Spark —
    precisely the torn window between the data landing and the checkpoint
    acknowledging the batch.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        t = catalog.load_table(identifier)
        last = t.metadata.properties.get(fence_key(sink_id))
        if last is not None and int(last) >= batch_id:
            return  # replayed batch: already committed before the crash
        (
            t.new_transaction()
            .append_dataframe(batch_df)
            .fence(fence_key(sink_id), batch_id)
            .commit()
        )
        if fail_after_batch is not None and batch_id >= fail_after_batch:
            raise RuntimeError(
                f"injected torn write after committing batch {batch_id}"
            )

    return sink


def run_torn_writer_scenario(
    spark: SparkSession,
    catalog: PostgresCatalog,
    src: DataFrame,
    key_col: str,
    work_dir: str,
    table_name: str = "streams.torn_sink",
) -> dict:
    """Drive the kill/restart protocol and return its observable facts.

    Source data is split by ``key_col`` parity into two parquet files read
    with ``maxFilesPerTrigger=1`` (two micro-batches). Run 1 commits batch 0
    then dies in the torn window (injected). Run 2 restarts on the SAME
    checkpoint: Spark replays batch 0 (fence -> skip) then processes batch 1.
    """
    shutil.rmtree(work_dir, ignore_errors=True)
    src_dir = os.path.join(work_dir, "src")
    ckpt = os.path.join(work_dir, "ckpt")
    # two part files in one source dir -> two micro-batches under
    # maxFilesPerTrigger=1 (batch order follows file mtime; either order is
    # handled below)
    src.filter((F.col(key_col) % 2) == 0).coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)
    src.filter((F.col(key_col) % 2) == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)

    ident = TableIdentifier.parse(table_name)
    table = catalog.create_table(ident, src.schema)

    def start(sink):
        stream = (
            spark.readStream.schema(src.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        return (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    # -- run 1: torn writer — batch 0 commits, then the "driver dies" ------
    q1 = start(fenced_batch_sink(catalog, ident, "torn", fail_after_batch=0))
    torn_as_expected = False
    try:
        q1.awaitTermination(120)
    except Exception:  # StreamingQueryException: the injected death
        torn_as_expected = True
    t_mid = catalog.load_table(ident)
    snaps_after_crash = len(t_mid.metadata.snapshots)
    rows_after_crash = t_mid.to_df(spark).count()

    # -- run 2: restart on the same checkpoint — replay must be fenced -----
    q2 = start(fenced_batch_sink(catalog, ident, "torn"))
    q2.awaitTermination(120)

    t_end = catalog.load_table(ident)
    final = t_end.to_df(spark)
    appends = [s for s in t_end.metadata.snapshots if s.operation == "append"]
    return {
        "torn_as_expected": torn_as_expected,
        "snaps_after_crash": snaps_after_crash,
        "rows_after_crash": rows_after_crash,
        "final_df": final,
        "n_append_snapshots": len(appends),
        "fence_value": int(t_end.metadata.properties[fence_key("torn")]),
    }


@register(
    "catalog_stream_torn_writer_restart",
    oracle="""
    SELECT CAST(count(*) AS BIGINT)                     AS n_rows,
           CAST(count(DISTINCT n_nationkey) AS BIGINT)  AS n_distinct_keys,
           true  AS torn_crash_observed,
           true  AS no_duplicate_batch,
           true  AS no_lost_batch,
           CAST(1 AS BIGINT) AS fence_batch_id
    FROM nation
    """,
    tags=("streaming", "catalog", "exactly-once", "fault-injection"),
)
def catalog_stream_torn_writer_restart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once across a torn-writer restart, certified end to end: a
    checkpointed foreachBatch catalog sink commits micro-batch 0 and is
    killed before the checkpoint acknowledges it; the restarted query
    replays batch 0 (fenced -> skipped, no duplicate) and processes batch 1
    (no lost batch). Certified: final row count and distinct keys equal the
    source exactly (the oracle), exactly 2 append snapshots exist for 3
    batch executions, and the fence property reads the last batch id.
    """
    from iceberg_catalog_postgres_spark.catalog.integration import _fresh_catalog

    cat = _fresh_catalog("catalog_torn_writer")
    src = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey", "n_name"
    )
    out = run_torn_writer_scenario(
        spark,
        cat,
        src,
        key_col="n_nationkey",
        work_dir=os.path.join(_REPO_ROOT, ".tmp", "torn_writer_q"),
    )
    n_src = src.count()
    halves = {
        src.filter((F.col("n_nationkey") % 2) == 0).count(),
        src.filter((F.col("n_nationkey") % 2) == 1).count(),
    }
    stats = out["final_df"].agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("n_nationkey").alias("d"),
    ).first()
    no_duplicate = (
        stats["n"] == n_src
        and stats["d"] == n_src
        and out["n_append_snapshots"] == 2
        # the crash landed exactly ONE batch (either parity file)
        and out["rows_after_crash"] in halves
        and out["snaps_after_crash"] == 1
    )
    no_lost = stats["n"] == n_src and out["fence_value"] == 1
    return spark.createDataFrame(
        [
            (
                int(stats["n"]),
                int(stats["d"]),
                bool(out["torn_as_expected"]),
                bool(no_duplicate),
                bool(no_lost),
                int(out["fence_value"]),
            )
        ],
        "n_rows long, n_distinct_keys long, torn_crash_observed boolean, "
        "no_duplicate_batch boolean, no_lost_batch boolean, fence_batch_id long",
    )
