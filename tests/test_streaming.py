"""Streaming-specific assertions beyond the rows-only driver check:
the incremental (readStream) execution must produce exactly the same rows as
the batch execution of the same logical query — the stream/batch unification
contract."""

from __future__ import annotations

from tests.conftest import soak_only

from iceberg_catalog_postgres_spark.registry import load_all

REGISTRY = load_all()


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_streaming_tumbling_matches_batch(spark, sf_oracle):
    batch = REGISTRY["stream_tumbling_window_agg"].fn(spark, sf_oracle)
    stream = REGISTRY["stream_readstream_tumbling"].fn(spark, sf_oracle)
    cols = ["window_start", "event_type", "n_events"]
    assert _rows(stream, cols) == _rows(batch.select(*cols), cols)


def test_streaming_dedup_keeps_one_per_key(spark, sf_oracle):
    out = REGISTRY["stream_readstream_dedup_watermark"].fn(spark, sf_oracle)
    per_key = out.groupBy("user_id", "event_type").count().filter("count > 1")
    assert per_key.count() == 0


def test_stateful_counter_totals_match_batch(spark, sf_oracle):
    from iceberg_catalog_postgres_spark.registry import load
    from pyspark.sql import functions as F

    out = REGISTRY["stream_stateful_user_counter"].fn(spark, sf_oracle)
    ev = load(spark, sf_oracle, "events")
    batch = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("total_value")
    )
    cols = ["user_id", "n_events", "total_value"]
    assert _rows(out.select(*cols), cols) == _rows(batch.select(*cols), cols)


def test_stream_stream_join_matches_batch(spark, sf_oracle):
    stream = REGISTRY["stream_stream_interval_join"].fn(spark, sf_oracle)
    batch = REGISTRY["join_event_pairs_interval_batch"].fn(spark, sf_oracle)
    cols = ["user_id", "n_pairs"]
    assert _rows(stream.select(*cols), cols) == _rows(batch.select(*cols), cols)


def test_transform_with_state_matches_batch(spark, sf_smoke):
    """Spark 4 transformWithState running counter == batch aggregation.
    The API's Python state server needs protobuf; skip where it's broken
    (this container) — the legacy applyInPandasWithState surface stays
    certified either way."""
    import pytest as _pytest

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        _pytest.skip("google.protobuf broken: transformWithState state server cannot start")

    from pyspark.sql import functions as F

    from iceberg_catalog_postgres_spark.registry import load
    from iceberg_catalog_postgres_spark.streaming.windows import stream_transform_with_state

    got = {
        r["user_id"]: (r["n_events"], r["total_value"], r["max_value"])
        for r in stream_transform_with_state(spark, sf_smoke).collect()
    }
    want = {
        r["user_id"]: (r["n"], r["t"], r["m"])
        for r in load(spark, sf_smoke, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("t"),
            F.round(F.max("value"), 4).alias("m"),
        )
        .collect()
    }
    assert got == want


def test_stateful_counter_falls_back_when_tws_fails(spark, sf_smoke, monkeypatch):
    """The registered stateful query auto-swaps to transformWithState when
    the runtime gate opens; if that path then fails (half-healed protobuf,
    state-server startup error), the legacy applyInPandasWithState fallback
    must still serve the identical oracle contract."""
    from iceberg_catalog_postgres_spark.streaming import windows as W

    monkeypatch.setattr(W, "transform_with_state_available", lambda: True)

    def boom(spark_, sf_dir_):
        raise RuntimeError("simulated state-server failure")

    monkeypatch.setattr(W, "stream_transform_with_state", boom)
    df = W.stream_stateful_user_counter(spark, sf_smoke)
    assert df.columns == ["user_id", "n_events", "total_value"]
    assert df.count() > 0


def test_stream_full_outer_join_matches_batch(spark, sf_oracle):
    """The streaming FULL OUTER interval join inside the certified horizon
    equals a batch full join with the identical per-row anchor predicate
    — including both unmatched categories."""
    from pyspark.sql import functions as F

    from iceberg_catalog_postgres_spark.registry import load

    stream = REGISTRY["stream_stream_full_outer_join"].fn(spark, sf_oracle)

    ev = load(spark, sf_oracle, "events")
    mx = (
        ev.filter(F.col("event_type").isin("error", "purchase"))
        .groupBy("event_type").agg(F.max("ts").alias("m"))
        .agg(F.min("m")).first()[0]
    )
    cutoff_ms = int(mx.timestamp() * 1000) - 45 * 60 * 1000
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("eu"), F.unix_millis("ts").alias("ets_ms")
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.unix_millis("ts").alias("pts_ms")
    )
    j = err.join(
        pur,
        (F.col("eu") == F.col("pu"))
        & (F.col("pts_ms") >= F.col("ets_ms"))
        & (F.col("pts_ms") < F.col("ets_ms") + 600000),
        "full_outer",
    )
    anchor_ok = F.when(
        F.col("ets_ms").isNotNull(), F.col("ets_ms") < F.lit(cutoff_ms)
    ).otherwise(F.col("pts_ms") < F.lit(cutoff_ms))
    batch = (
        j.filter(anchor_ok)
        .groupBy(F.coalesce("eu", "pu").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(
                F.when(F.col("ets_ms").isNotNull() & F.col("pts_ms").isNotNull(), 1)
            ).alias("n_matched"),
            F.count(F.when(F.col("pts_ms").isNull(), 1)).alias("n_err_unmatched"),
            F.count(F.when(F.col("ets_ms").isNull(), 1)).alias("n_pur_unmatched"),
        )
    )
    cols = ["user_id", "n_rows", "n_matched", "n_err_unmatched", "n_pur_unmatched"]
    assert _rows(stream.select(*cols), cols) == _rows(batch.select(*cols), cols)


def test_changelog_stream_incremental_and_overwrite_contract(spark, tmp_path):
    """r9 CDC stream beyond the oracle row: (a) a checkpointed stream
    resumes AFTER the consumed snapshots — a second availableNow run from
    the same checkpoint emits ONLY the new snapshot's changes; (b) an
    overwrite snapshot in range raises (no well-defined row-level diff),
    matching the batch changelog_df contract."""
    import uuid as _uuid

    from pyspark.sql import functions as F

    from iceberg_catalog_postgres_spark.catalog.catalog import (
        PostgresCatalog,
        TableIdentifier,
    )
    from iceberg_catalog_postgres_spark.sources.catalog_datasource import (
        CatalogChangelogDataSource,
        CatalogChangelogStreamReader,
    )

    db = str(tmp_path / "catalog.db")
    wh = str(tmp_path / "wh")
    cat = PostgresCatalog.connect("cdcinc", f"sqlite://{db}", wh)
    cat.initialize()
    rows = [(i, f"n{i}", i % 5) for i in range(10)]
    schema = "n_nationkey long, n_name string, n_regionkey long"
    src = spark.createDataFrame(rows, schema)
    ident = TableIdentifier.parse("inc.nation")
    t = cat.create_table(ident, src.schema)
    t = t.new_transaction().append_dataframe(src.coalesce(1)).commit()

    # end-to-end availableNow run through the registered source
    spark.dataSource.register(CatalogChangelogDataSource)
    name1 = f"cdcinc_{_uuid.uuid4().hex[:10]}"
    stream = (
        spark.readStream.format("catalog_changelog")
        .option("db", db)
        .option("warehouse", wh)
        .option("ident", "inc.nation")
        .option("catalog", "cdcinc")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(name1)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    first = spark.table(name1).collect()
    assert len(first) == 10 and all(r["_change_type"] == "insert" for r in first)

    # incremental offset contract (what a checkpointed resume replays):
    # read from the consumed offset emits ONLY the new snapshot's changes
    reader = CatalogChangelogStreamReader(
        {"db": db, "warehouse": wh, "ident": "inc.nation", "catalog": "cdcinc"}
    )
    _rows0, end0 = reader.read(reader.initialOffset())
    assert end0["n_snapshots"] == 1 and len(_rows0) == 10

    keys = spark.createDataFrame([(3,), (4,)], "n_nationkey long").coalesce(1)
    t = t.new_transaction().delete_keys_dataframe(keys).commit()
    second, end1 = reader.read(end0)
    assert end1["n_snapshots"] == 2
    assert sorted(r[0] for r in second) == [3, 4]
    assert all(r[3] == "delete" for r in second)
    assert all(r[1] is None for r in second)  # key-only contract
    # deterministic replay between the same offsets
    assert reader.readBetweenOffsets(end0, end1) == second

    # start_snapshots bootstrap: a consumer initialized from a snapshot
    # read starts AFTER it — only the delete commit is emitted
    boot = CatalogChangelogStreamReader(
        {
            "db": db,
            "warehouse": wh,
            "ident": "inc.nation",
            "catalog": "cdcinc",
            "start_snapshots": "1",
        }
    )
    assert boot.initialOffset() == {"n_snapshots": 1}
    boot_rows, _boot_end = boot.read(boot.initialOffset())
    assert sorted(r[0] for r in boot_rows) == [3, 4]

    # overwrite in range: loud refusal, same as the batch changelog
    t = t.new_transaction().overwrite_dataframe(
        spark.createDataFrame(rows[:2], schema).coalesce(1)
    ).commit()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-append/delete"):
        reader.read(end1)


def test_stream_source_refuses_schema_drift(spark, tmp_path):
    """The DataSource-constructed readers carry expect_columns from the
    declared output schema; a table whose columns differ refuses loudly
    instead of silently misaligning rows. Direct reader construction
    (no expect_columns) stays schema-agnostic for generic tails."""
    from iceberg_catalog_postgres_spark.catalog.catalog import (
        PostgresCatalog,
        TableIdentifier,
    )
    from iceberg_catalog_postgres_spark.sources.catalog_datasource import (
        CatalogCommitsStreamReader,
    )

    db = str(tmp_path / "c.db")
    cat = PostgresCatalog.connect("drift", f"sqlite://{db}", str(tmp_path / "wh"))
    cat.initialize()
    src = spark.createDataFrame([(1, "x")], "a long, b string")
    t = cat.create_table(TableIdentifier.parse("d.t"), src.schema)
    t.new_transaction().append_dataframe(src.coalesce(1)).commit()

    guarded = CatalogCommitsStreamReader(
        {"db": db, "warehouse": str(tmp_path / "wh"), "ident": "d.t",
         "catalog": "drift", "expect_columns": "n_nationkey,n_name,n_regionkey"}
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="schema mismatch"):
        guarded.read(guarded.initialOffset())

    # unguarded direct construction reads the table's own columns
    free = CatalogCommitsStreamReader(
        {"db": db, "warehouse": str(tmp_path / "wh"), "ident": "d.t", "catalog": "drift"}
    )
    rows, end = free.read(free.initialOffset())
    assert end["n_snapshots"] == 1 and list(rows) == [(1, "x", 1)]


@soak_only
def test_parallel_cdc_partition_planning_scales(spark, tmp_path):
    """r9 scale check: over a 30-commit chain (mixed appends/deletes), the
    parallel CDC reader's partitions(start,end) plans exactly one unit
    per inserted file / per delete-snapshot eq-set, offsets advance per
    commit, and an arbitrary mid-chain offset window plans only its own
    slice — the planner cost stays O(delta), never O(history)."""
    from iceberg_catalog_postgres_spark.catalog.catalog import (
        PostgresCatalog,
        TableIdentifier,
    )
    from iceberg_catalog_postgres_spark.sources.catalog_datasource import (
        CatalogChangelogParallelStreamReader,
    )

    db = str(tmp_path / "c.db")
    wh = str(tmp_path / "wh")
    cat = PostgresCatalog.connect("cdcsc", f"sqlite://{db}", wh)
    cat.initialize()
    schema = "n_nationkey long, n_name string, n_regionkey long"
    t = cat.create_table(TableIdentifier.parse("sc.t"), spark.createDataFrame([], schema).schema)
    n_appends, n_deletes = 0, 0
    next_id = 0
    for i in range(30):
        if i % 3 == 2 and next_id > 0:
            keys = spark.createDataFrame([(next_id - 1,)], "n_nationkey long").coalesce(1)
            t = t.new_transaction().delete_keys_dataframe(keys).commit()
            n_deletes += 1
        else:
            batch = [(next_id + j, f"n{next_id + j}", j) for j in range(2)]
            next_id += 2
            t = t.new_transaction().append_dataframe(
                spark.createDataFrame(batch, schema).coalesce(1)
            ).commit()
            n_appends += 1

    reader = CatalogChangelogParallelStreamReader(
        {"db": db, "warehouse": wh, "ident": "sc.t", "catalog": "cdcsc"}
    )
    assert reader.latestOffset()["n_snapshots"] == 30
    full = reader.partitions({"n_snapshots": 0}, {"n_snapshots": 30})
    # one partition per appended file (coalesce(1) => 1/append) + one per
    # delete snapshot's eq set
    assert len(full) == n_appends + n_deletes
    kinds = {}
    for p in full:
        kinds[p.kind] = kinds.get(p.kind, 0) + 1
    assert kinds == {"insert": n_appends, "eqdel": n_deletes}
    # a mid-chain window plans only its own slice
    window = reader.partitions({"n_snapshots": 10}, {"n_snapshots": 13})
    assert len(window) == 3


def test_rate_limited_streaming_admission(spark, tmp_path):
    """r10: max_files_per_trigger / max_rows_per_trigger bound how much of
    a pending backlog one micro-batch admits — bounded batches AND eventual
    catch-up (offsets converge), on both the simple and executor-parallel
    readers. A single over-cap commit is admitted whole (a commit is the
    atomicity unit), never split and never a stall."""
    from iceberg_catalog_postgres_spark.catalog.catalog import (
        PostgresCatalog,
        TableIdentifier,
    )
    from iceberg_catalog_postgres_spark.sources.catalog_datasource import (
        CatalogCommitsParallelStreamReader,
        CatalogCommitsStreamReader,
    )

    db = str(tmp_path / "c.db")
    wh = str(tmp_path / "wh")
    cat = PostgresCatalog.connect("admit", f"sqlite://{db}", wh)
    cat.initialize()
    schema = "n_nationkey long, n_name string, n_regionkey long"
    t = cat.create_table(TableIdentifier.parse("a.nation"),
                         spark.createDataFrame([], schema).schema)
    # 6 single-file commits of 4 rows each, then ONE 5-file commit (over-cap)
    next_id = 0
    for _ in range(6):
        rows = [(next_id + j, f"n{next_id + j}", j % 3) for j in range(4)]
        next_id += 4
        t = t.new_transaction().append_dataframe(
            spark.createDataFrame(rows, schema).coalesce(1)
        ).commit()
    big = [(next_id + j, f"n{next_id + j}", j % 5) for j in range(10)]
    next_id += 10
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame(big, schema).repartition(5)
    ).commit()
    total_rows = next_id

    # --- simple reader, max_files_per_trigger=2 ---------------------------
    opts = {"db": db, "warehouse": wh, "ident": "a.nation", "catalog": "admit",
            "max_files_per_trigger": "2"}
    r = CatalogCommitsStreamReader(dict(opts))
    off = r.initialOffset()
    seen, ends = [], []
    for _ in range(20):
        rows, end = r.read(off)
        if end == off:
            break
        seen.extend(rows)
        ends.append(end["n_snapshots"])
        off = end
    # bounded steps: 2 snapshots (=2 files) per batch over the small
    # commits, then the over-cap commit ALONE
    assert ends == [2, 4, 6, 7]
    assert len(seen) == total_rows and len(set(seen)) == total_rows

    # --- max_rows_per_trigger uses manifest stats (metadata-only) ---------
    r2 = CatalogCommitsStreamReader({**opts, "max_files_per_trigger": "",
                                     "max_rows_per_trigger": "8"})
    off = r2.initialOffset()
    ends2, n2 = [], 0
    for _ in range(20):
        rows, end = r2.read(off)
        if end == off:
            break
        n2 += len(rows)
        ends2.append(end["n_snapshots"])
        off = end
    assert ends2 == [2, 4, 6, 7]  # 8 rows = 2 commits; big commit alone
    assert n2 == total_rows

    # --- executor-parallel reader: trigger loop with admission ------------
    pr = CatalogCommitsParallelStreamReader(dict(opts))
    start = pr.initialOffset()
    got, batches = [], 0
    for _ in range(20):
        latest = pr.latestOffset()
        if latest == start:
            break
        parts = pr.partitions(start, latest)
        real = [p for p in parts if p.abs_path]
        # every capped batch plans <=2 files except the atomic over-cap
        # commit, which is admitted ALONE (5 files in its own batch)
        assert len(real) <= 2 or latest["n_snapshots"] - start["n_snapshots"] == 1
        for p in parts:
            got.extend(pr.read(p))
        pr.commit(latest)
        start = latest
        batches += 1
    assert start["n_snapshots"] == 7  # converged on the full chain
    assert batches == 4
    assert len(got) == total_rows and len(set(got)) == total_rows
    cat.backend.close()


def test_admission_fold_is_delta_based_no_fileset_materialization():
    """r11: the admission cap folds snapshot-summary counters — O(1) per
    snapshot — and never touches data_files/delete_files on the fast path
    (before, every admitted snapshot rebuilt set(data_files): O(total
    table files) per snapshot per trigger). Counter-based assertion: the
    file-list properties record every access."""
    from iceberg_catalog_postgres_spark.sources.catalog_datasource import (
        _bounded_hi,
    )

    touched: list = []

    class Snap:
        def __init__(self, i, summary=None):
            self._i = i
            self.summary = summary if summary is not None else {
                "added-files": "2",
                "added-delete-files": "0",
                "added-records": "10",
            }
            self.file_stats = {}

        def _touch(self, what):
            touched.append((self._i, what))
            return [] if what != "dv" else {}

        data_files = property(lambda s: s._touch("data"))
        delete_files = property(lambda s: s._touch("eq"))
        position_delete_files = property(lambda s: s._touch("pos"))
        deletion_vectors = property(lambda s: s._touch("dv"))

    snaps = [Snap(i) for i in range(100)]
    # cap 4 units -> exactly two 2-file snapshots admitted, zero accesses
    assert _bounded_hi(snaps, 0, 4, None) == 2
    assert touched == [], f"admission materialized file sets: {touched[:4]}"
    # row cap: 10 rows/snapshot, cap 15 -> one snapshot
    assert _bounded_hi(snaps, 0, None, 15) == 1
    assert touched == []
    # progress guarantee: a single over-cap snapshot still admits
    assert _bounded_hi(snaps, 0, 1, None) == 1
    assert touched == []

    # a maintenance snapshot WITHOUT the summary counters falls back to the
    # exact pairwise set diff — file lists touched for that snapshot (and
    # its predecessor) only
    snaps[5] = Snap(5, summary={"operation-detail": "rewrite"})
    assert _bounded_hi(snaps, 0, 1000, None) == 100
    idx = {i for i, _w in touched}
    assert idx <= {4, 5}, f"fallback leaked beyond the statless snapshot: {idx}"
