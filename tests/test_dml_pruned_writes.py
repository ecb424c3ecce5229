"""Planner-pruned WRITE paths (r14): the UPDATE / DELETE SQL statements
route their WHERE through the same DNF extractor as SELECT
(``prune_subset_for_where``), so the matching scan (MOR) opens only the
planner's candidate files and the CoW rewrite touches only them —
previously the write-side scan opened every data file and relied on
parquet row-group min/max alone."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.catalog.catalog import (
    PostgresCatalog,
    TableIdentifier,
)
from iceberg_catalog_postgres_spark.catalog.merge_sql import execute_dml
from iceberg_catalog_postgres_spark.catalog.select_sql import (
    prune_subset_for_where,
)


@pytest.fixture
def catalog(tmp_path):
    cat = PostgresCatalog.connect("dmlprune", None, str(tmp_path / "wh"))
    cat.initialize()
    yield cat
    cat.backend.close()


def _seed(catalog, spark, name, n=60, mod=5):
    df = spark.createDataFrame(
        [(i, f"n{i}", i % mod) for i in range(n)], "k long, name string, r long"
    )
    t = catalog.create_table(
        TableIdentifier.parse(name), df.schema, partition_by=["r"]
    )
    return t.new_transaction().append_dataframe(df.repartition("r")).commit()


def test_prune_subset_for_where_matches_planner(catalog, spark):
    t = _seed(catalog, spark, "d.a")
    ident = TableIdentifier.parse("d.a")
    subset = prune_subset_for_where(t, ident, "r = 1 OR r = 3")
    assert subset is not None
    expect = sorted(
        set(t.planned_files_composed(points={"r": [1, 3]}))
    )
    assert subset == expect and len(subset) == 2
    # conjunct with a non-partition piece still prunes on the partition
    subset = prune_subset_for_where(t, ident, "r = 1 AND name <> ''")
    assert subset is not None and len(subset) == 1
    # r15: a non-partition disjunct/conjunct prunes via string zone-map
    # bounds instead of poisoning (still a superset of matching files)
    sub = prune_subset_for_where(t, ident, "r = 1 OR name = 'n7'")
    assert sub is not None and 2 <= len(sub) < 5
    sub = prune_subset_for_where(t, ident, "name = 'n7'")
    assert sub is not None and 0 < len(sub) < 5
    # an expression the extractor cannot take -> None (scan everything)
    assert prune_subset_for_where(t, ident, "upper(name) = 'N7'") is None
    assert prune_subset_for_where(t, ident, "r = 1 OR name <> 'n7'") is None


def test_delete_mor_sql_passes_planner_subset(catalog, spark, monkeypatch):
    """The SQL DELETE path hands the extractor's subset to
    delete_where_mor — spied at the maintenance module — and the result
    stays exact."""
    from iceberg_catalog_postgres_spark.catalog import maintenance as m

    _seed(catalog, spark, "d.m")
    seen = {}
    orig = m.delete_where_mor

    def spy(spark_, table, cond, **kw):
        seen["file_subset"] = kw.get("file_subset")
        return orig(spark_, table, cond, **kw)

    monkeypatch.setattr(m, "delete_where_mor", spy)
    execute_dml(spark, catalog, "DELETE FROM d.m WHERE r = 1 OR r = 3")
    monkeypatch.undo()
    assert seen["file_subset"] is not None and len(seen["file_subset"]) == 2
    t = catalog.load_table(TableIdentifier.parse("d.m"))
    got = sorted(r.k for r in t.to_df(spark).collect())
    assert got == [i for i in range(60) if i % 5 not in (1, 3)]


def test_delete_cow_pruned_carries_untouched_files_byte_identical(
    catalog, spark
):
    """CoW DELETE with a partition WHERE rewrites ONLY the planned files:
    every other file keeps its exact rel path (no rewrite, no copy), and
    the snapshot summary reports the split."""
    t = _seed(catalog, spark, "d.c")
    before = set(t.metadata.current_data_files())
    assert len(before) == 5
    execute_dml(
        spark, catalog,
        "DELETE FROM d.c WHERE r = 0 OR r = 2", strategy="cow",
    )
    t = catalog.load_table(TableIdentifier.parse("d.c"))
    snap = t.metadata.current_snapshot()
    assert snap.summary["files-rewritten"] == "2"
    assert snap.summary["files-kept"] == "3"
    after = set(t.metadata.current_data_files())
    # the 3 untouched partition files carried over byte-identical
    assert len(before & after) == 3
    got = sorted(r.k for r in t.to_df(spark).collect())
    assert got == [i for i in range(60) if i % 5 not in (0, 2)]


def test_delete_cow_pruned_materializes_pending_eq_deletes(catalog, spark):
    """The pruned rewrite must not resurrect rows: a pending equality
    delete applies to the rewritten files via the to_df read (files move
    past the delete's sequence) and keeps applying to carried files."""
    t = _seed(catalog, spark, "d.e")
    # eq-delete two names living in partitions 1 and 2
    t = (
        t.new_transaction()
        .delete_keys_dataframe(
            spark.createDataFrame([("n6",), ("n7",)], "name string").coalesce(1)
        )
        .commit()
    )
    execute_dml(
        spark, catalog, "DELETE FROM d.e WHERE r = 1", strategy="cow"
    )
    t = catalog.load_table(TableIdentifier.parse("d.e"))
    got = sorted(r.k for r in t.to_df(spark).collect())
    # r=1 gone (CoW), k=6 (r=1, already inside the rewrite set) gone,
    # k=7 (r=2, carried file + still-applicable eq delete) gone
    assert got == [i for i in range(60) if i % 5 != 1 and i != 7]


def test_delete_cow_pruned_noop_when_planner_proves_empty(catalog, spark):
    t = _seed(catalog, spark, "d.n")
    before = t.metadata.current_snapshot_id
    execute_dml(
        spark, catalog, "DELETE FROM d.n WHERE r = 99", strategy="cow"
    )
    t = catalog.load_table(TableIdentifier.parse("d.n"))
    assert t.metadata.current_snapshot_id == before  # provable no-op
    assert t.to_df(spark).count() == 60


def test_update_mor_sql_passes_planner_subset(catalog, spark, monkeypatch):
    from iceberg_catalog_postgres_spark.catalog import maintenance as m

    _seed(catalog, spark, "d.u")
    seen = {}
    orig = m.update_where

    def spy(spark_, table, cond, set_, **kw):
        seen["file_subset"] = kw.get("file_subset")
        return orig(spark_, table, cond, set_, **kw)

    monkeypatch.setattr(m, "update_where", spy)
    execute_dml(
        spark, catalog,
        "UPDATE d.u SET name = concat(name, '_x') WHERE r = 2 AND k < 30",
    )
    monkeypatch.undo()
    assert seen["file_subset"] is not None and len(seen["file_subset"]) == 1
    t = catalog.load_table(TableIdentifier.parse("d.u"))
    rows = {r.k: r.name for r in t.to_df(spark).collect()}
    assert len(rows) == 60
    for k in range(60):
        expect = f"n{k}_x" if (k % 5 == 2 and k < 30) else f"n{k}"
        assert rows[k] == expect


def test_update_cow_pruned_rewrites_only_candidate_files(catalog, spark):
    """CoW UPDATE with a partition WHERE (r14): only the candidate files
    rewrite with the CASE projection; the rest carry over byte-identical,
    and no row is dropped or missed."""
    t = _seed(catalog, spark, "d.uc")
    before = set(t.metadata.current_data_files())
    execute_dml(
        spark, catalog,
        "UPDATE d.uc SET name = 'hit' WHERE r = 1 OR r = 3",
        strategy="cow",
    )
    t = catalog.load_table(TableIdentifier.parse("d.uc"))
    snap = t.metadata.current_snapshot()
    assert snap.summary["files-rewritten"] == "2"
    assert snap.summary["files-kept"] == "3"
    assert snap.operation == "overwrite"
    after = set(t.metadata.current_data_files())
    assert len(before & after) == 3  # untouched partitions carried
    rows = {r.k: r.name for r in t.to_df(spark).collect()}
    assert len(rows) == 60
    for k in range(60):
        assert rows[k] == ("hit" if k % 5 in (1, 3) else f"n{k}")


def test_merge_mor_dynamic_file_pruning(catalog, spark, monkeypatch):
    """r14: a MOR MERGE with no by-source clauses restricts its target
    scan to files whose key bounds intersect the source's key range —
    the small-delta-into-huge-table shape. Spied at Table.to_df; results
    must equal the unpruned merge."""
    from iceberg_catalog_postgres_spark.catalog import maintenance as m
    from iceberg_catalog_postgres_spark.catalog.table import Table

    df = spark.createDataFrame(
        [(i, f"n{i}") for i in range(100)], "k long, name string"
    )
    t = catalog.create_table(TableIdentifier.parse("d.dfp"), df.schema)
    # range partitioning gives each file a contiguous, stats-covered k
    # span; 10 files clears the _DFP_MIN_FILES gate
    t = t.new_transaction().append_dataframe(
        df.repartitionByRange(10, "k")
    ).commit()
    src = spark.createDataFrame(
        [(3, "u3"), (7, "u7")], "k long, name string"
    )
    seen = {}
    orig = Table.to_df

    def spy(self, spark_, **kw):
        seen["file_subset"] = kw.get("file_subset")
        return orig(self, spark_, **kw)

    monkeypatch.setattr(Table, "to_df", spy)
    t = m.merge_into(
        spark, t, src, on=["k"],
        when_matched=[{"action": "update", "set": {"name": "s.name"}}],
        when_not_matched=[{"action": "insert"}],
        strategy="mor",
    )
    monkeypatch.undo()
    # keys {3, 7}: only the range file holding low keys intersects [3, 7]
    assert seen["file_subset"] is not None
    assert 0 < len(seen["file_subset"]) < 10
    rows = {r.k: r.name for r in t.to_df(spark).collect()}
    assert len(rows) == 100
    assert rows[3] == "u3" and rows[7] == "u7"
    assert rows[50] == "n50"  # untouched row in a pruned-away file

    # scattered keys: the INTERVAL [3, 500] covers every file, but the
    # small-delta key-set upgrade still skips files holding none of
    # {3, 7, 500} (the middle of the table)
    src_sc = spark.createDataFrame(
        [(3, "v3"), (7, "v7"), (500, "v500")], "k long, name string"
    )
    seen.clear()
    monkeypatch.setattr(Table, "to_df", spy)
    t = m.merge_into(
        spark, t, src_sc, on=["k"],
        when_matched=[{"action": "update", "set": {"name": "s.name"}}],
        when_not_matched=[{"action": "insert"}],
        strategy="mor",
    )
    monkeypatch.undo()
    assert seen["file_subset"] is not None
    assert 0 < len(seen["file_subset"]) < 10
    rows = {r.k: r.name for r in t.to_df(spark).collect()}
    assert len(rows) == 101
    assert rows[3] == "v3" and rows[7] == "v7" and rows[500] == "v500"
    assert rows[50] == "n50"

    # all-new keys: the planner misses EVERY file -> empty target scan,
    # pure-insert merge (the cheapest possible shape)
    src_new = spark.createDataFrame([(600, "new")], "k long, name string")
    seen.clear()
    monkeypatch.setattr(Table, "to_df", spy)
    t = m.merge_into(
        spark, t, src_new, on=["k"],
        when_matched=[{"action": "update", "set": {"name": "s.name"}}],
        when_not_matched=[{"action": "insert"}],
        strategy="mor",
    )
    monkeypatch.undo()
    assert seen["file_subset"] == []
    rows = {r.k: r.name for r in t.to_df(spark).collect()}
    assert len(rows) == 102 and rows[600] == "new" and rows[3] == "v3"

    # by-source clauses need every target row: pruning must stay off
    src2 = spark.createDataFrame([(3, "x3")], "k long, name string")
    seen.clear()
    monkeypatch.setattr(Table, "to_df", spy)
    t = m.merge_into(
        spark, t, src2, on=["k"],
        when_matched=[{"action": "update", "set": {"name": "s.name"}}],
        when_not_matched_by_source=[
            {"action": "update", "set": {"name": "concat(t.name, '.')"}},
        ],
        strategy="mor",
    )
    monkeypatch.undo()
    assert seen["file_subset"] is None
    rows = {r.k: r.name for r in t.to_df(spark).collect()}
    assert rows[3] == "x3" and rows[50] == "n50."

    # NULL source keys join null-safe: bounds cannot scope them — no prune
    src3 = spark.createDataFrame([(None, "nn")], "k long, name string")
    seen.clear()
    monkeypatch.setattr(Table, "to_df", spy)
    m.merge_into(
        spark, t, src3, on=["k"],
        when_matched=[{"action": "update", "set": {"name": "s.name"}}],
        strategy="mor",
    )
    monkeypatch.undo()
    assert seen["file_subset"] is None


def test_merge_dfp_disabled_on_nan_source_keys(catalog, spark):
    """r15 ADVICE: NaN float keys evade count(key)/min/max/sorted() — a
    NaN in the source must disable the prune entirely (Spark's join
    treats NaN = NaN as a match, so a skipped file holding NaN rows
    would turn updates into duplicate inserts)."""
    import math

    from iceberg_catalog_postgres_spark.catalog import maintenance as m

    df = spark.createDataFrame(
        [(float(i), f"n{i}") for i in range(100)]
        + [(float("nan"), "nanrow")],
        "k double, name string",
    )
    t = catalog.create_table(TableIdentifier.parse("d.nan"), df.schema)
    t = t.new_transaction().append_dataframe(
        df.repartitionByRange(10, "k")
    ).commit()
    src_nan = spark.createDataFrame(
        [(float("nan"), "upd")], "k double, name string"
    )
    assert m._merge_candidate_files(spark, t, src_nan, ["k"]) is None
    # and the merge through it is still exact: the NaN row updates once
    t = m.merge_into(
        spark, t, src_nan, on=["k"],
        when_matched=[{"action": "update", "set": {"name": "s.name"}}],
        when_not_matched=[{"action": "insert"}],
        strategy="mor",
    )
    rows = [r for r in t.to_df(spark).collect() if math.isnan(r.k)]
    assert len(rows) == 1 and rows[0].name == "upd"
    # a clean float source still prunes (the gate is NaN, not the type)
    src_ok = spark.createDataFrame([(3.0, "x")], "k double, name string")
    subset = m._merge_candidate_files(spark, t, src_ok, ["k"])
    assert subset is not None and 0 < len(subset) < 11


def test_merge_dfp_checkpoints_nondeterministic_source(catalog, spark):
    """r15 (VERDICT r14 #6): a source whose lineage contains rand()/uuid()
    could recompute DIFFERENT rows between the DFP key collect and the
    join build if a persisted block were evicted — such plans must be
    localCheckpoint'ed (lineage truncated), and the merge stays exact."""
    from iceberg_catalog_postgres_spark.catalog import maintenance as m

    df = spark.createDataFrame(
        [(i, f"n{i}") for i in range(100)], "k long, name string"
    )
    t = catalog.create_table(TableIdentifier.parse("d.nd"), df.schema)
    t = t.new_transaction().append_dataframe(
        df.repartitionByRange(10, "k")
    ).commit()
    # detection: rand-filtered lineage flags; a plain scan does not
    src_nd = (
        spark.createDataFrame(
            [(3, "u3", 0.0), (7, "u7", 0.0)], "k long, name string, _r double"
        )
        .withColumn("_r", F.rand(seed=1))
        .filter("_r >= 0")
        .drop("_r")
    )
    assert m._plan_is_nondeterministic(src_nd)
    assert not m._plan_is_nondeterministic(df)
    calls = {"n": 0}
    try:  # Spark 4: the concrete class overrides localCheckpoint
        from pyspark.sql.classic.dataframe import DataFrame as _DF
    except ImportError:
        from pyspark.sql import DataFrame as _DF

    orig_ckpt = _DF.localCheckpoint

    def spy(self, *a, **kw):
        calls["n"] += 1
        return orig_ckpt(self, *a, **kw)

    import pytest as _pytest

    mp = _pytest.MonkeyPatch()
    mp.setattr(_DF, "localCheckpoint", spy)
    try:
        t = m.merge_into(
            spark, t, src_nd, on=["k"],
            when_matched=[{"action": "update", "set": {"name": "s.name"}}],
            when_not_matched=[{"action": "insert"}],
            strategy="mor",
        )
    finally:
        mp.undo()
    assert calls["n"] == 1
    rows = {r.k: r.name for r in t.to_df(spark).collect()}
    assert len(rows) == 100 and rows[3] == "u3" and rows[7] == "u7"


def test_insert_overwrite_static_partition(catalog, spark):
    """r14: INSERT OVERWRITE ... PARTITION (col = lit) replaces exactly
    the named identity partition; every other partition's files carry
    over byte-identical (the dynamic-overwrite machinery under a
    constant-column batch)."""
    t = _seed(catalog, spark, "d.so")  # r = k % 5, partitioned by r
    before = set(t.metadata.current_data_files())
    spark.createDataFrame(
        [(1000, "res0"), (1001, "res1")], "k long, name string"
    ).createOrReplaceTempView("so_src")
    execute_dml(
        spark, catalog,
        "INSERT OVERWRITE d.so PARTITION (r = 1) "
        "SELECT k, name FROM so_src",
    )
    t = catalog.load_table(TableIdentifier.parse("d.so"))
    after = set(t.metadata.current_data_files())
    assert len(before & after) == 4  # 4 untouched partitions carried
    rows = sorted(
        (r.k, r.name, r.r) for r in t.to_df(spark).collect()
    )
    expect = sorted(
        [(i, f"n{i}", i % 5) for i in range(60) if i % 5 != 1]
        + [(1000, "res0", 1), (1001, "res1", 1)]
    )
    assert rows == expect
    # INSERT INTO ... PARTITION appends with the constant column
    execute_dml(
        spark, catalog,
        "INSERT INTO d.so PARTITION (r = 9) VALUES (2000, 'nine')",
    )
    t = catalog.load_table(TableIdentifier.parse("d.so"))
    got = t.to_df(spark).filter(F.col("r") == 9).collect()
    assert [(g.k, g.name) for g in got] == [(2000, "nine")]
    # refusals: partition column also in the column list; unknown column
    with pytest.raises(ValueError, match="also provided"):
        execute_dml(
            spark, catalog,
            "INSERT OVERWRITE d.so PARTITION (r = 1) (k, name, r) "
            "SELECT k, name, 5 FROM so_src",
        )
    with pytest.raises(ValueError, match="unknown column"):
        execute_dml(
            spark, catalog,
            "INSERT OVERWRITE d.so PARTITION (bogus = 1) "
            "SELECT k, name FROM so_src",
        )


def test_insert_overwrite_static_partition_zero_rows_truncates(catalog, spark):
    """r15 ADVICE: a static PARTITION overwrite whose source query yields
    ZERO rows still truncates the named partition — Spark/Iceberg static
    overwrite semantics; pre-r15 this was a silent no-op and the stale
    files survived a restatement meant to empty the slice."""
    t = _seed(catalog, spark, "d.sz")  # r = k % 5, partitioned by r
    before = set(t.metadata.current_data_files())
    spark.createDataFrame(
        [(1000, "x")], "k long, name string"
    ).createOrReplaceTempView("sz_src")
    execute_dml(
        spark, catalog,
        "INSERT OVERWRITE d.sz PARTITION (r = 2) "
        "SELECT k, name FROM sz_src WHERE k < 0",
    )
    t = catalog.load_table(TableIdentifier.parse("d.sz"))
    after = set(t.metadata.current_data_files())
    assert len(after) == 4 and len(before & after) == 4  # r=2 files gone
    rows = sorted((r.k, r.r) for r in t.to_df(spark).collect())
    assert rows == sorted((i, i % 5) for i in range(60) if i % 5 != 2)
    # and the snapshot is a real commit (restatement is auditable)
    assert t.metadata.current_snapshot().operation == "overwrite"


def test_insert_overwrite_partition_in_atomic_script(catalog, spark):
    """The static partition overwrite composes with BEGIN...COMMIT: its
    pointer swap joins the script's single multi-table CAS batch, so the
    restatement and its audit-log append land atomically."""
    t = _seed(catalog, spark, "d.sc", n=9, mod=3)
    log_df = spark.createDataFrame([(0, "seed")], "k long, op string")
    tl = catalog.create_table(TableIdentifier.parse("d.sclog"), log_df.schema)
    tl.new_transaction().append_dataframe(log_df).commit()
    execute_dml(
        spark, catalog,
        "BEGIN; "
        "INSERT OVERWRITE d.sc PARTITION (r = 1) VALUES (100, 'restated'); "
        "INSERT INTO d.sclog VALUES (1, 'restate-r1'); "
        "COMMIT",
    )
    t = catalog.load_table(TableIdentifier.parse("d.sc"))
    rows = sorted((r.k, r.r) for r in t.to_df(spark).collect())
    assert rows == [(0, 0), (2, 2), (3, 0), (5, 2), (6, 0), (8, 2), (100, 1)]
    tl = catalog.load_table(TableIdentifier.parse("d.sclog"))
    assert tl.to_df(spark).count() == 2


def test_insert_overwrite_dynamic_mode_conf(catalog, spark):
    """Spark's partitionOverwriteMode=dynamic: INSERT OVERWRITE replaces
    ONLY the partitions present in the incoming rows."""
    t = _seed(catalog, spark, "d.dy")
    before = set(t.metadata.current_data_files())
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        execute_dml(
            spark, catalog,
            "INSERT OVERWRITE d.dy VALUES (3000, 'dyn', 2), (3001, 'dyn2', 4)",
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    t = catalog.load_table(TableIdentifier.parse("d.dy"))
    after = set(t.metadata.current_data_files())
    assert len(before & after) == 3  # r in {2, 4} replaced, 3 carried
    rows = sorted((r.k, r.r) for r in t.to_df(spark).collect())
    expect = sorted(
        [(i, i % 5) for i in range(60) if i % 5 not in (2, 4)]
        + [(3000, 2), (3001, 4)]
    )
    assert rows == expect
    # static mode (default): the same statement is a FULL overwrite
    t2 = _seed(catalog, spark, "d.st")
    execute_dml(
        spark, catalog, "INSERT OVERWRITE d.st VALUES (1, 'only', 0)"
    )
    t2 = catalog.load_table(TableIdentifier.parse("d.st"))
    assert t2.to_df(spark).count() == 1


def test_explain_dml_reports_planning_without_committing(catalog, spark):
    """EXPLAIN DELETE/UPDATE (r14): planning decision + matching-scan
    plan as rows; the table must be untouched afterwards."""
    t = _seed(catalog, spark, "d.x")
    before = t.metadata.current_snapshot_id
    lines = [
        r.plan_line
        for r in execute_dml(
            spark, catalog, "EXPLAIN DELETE FROM d.x WHERE r = 1 OR r = 3"
        ).collect()
    ]
    assert lines[0] == "== metadata planning =="
    assert "files total: 5" in lines[1] and "files planned: 2" in lines[1]
    assert "pruned: True" in lines[2]
    assert any("physical plan" in l for l in lines)
    # r15: a non-partition equality prunes through string zone-map bounds
    lines = [
        r.plan_line
        for r in execute_dml(
            spark, catalog,
            "EXPLAIN UPDATE d.x SET name = 'z' WHERE name = 'n7'",
        ).collect()
    ]
    assert "files planned: 3" in lines[1] and "pruned: True" in lines[2]
    # an expression the extractor cannot take stays unpruned
    lines = [
        r.plan_line
        for r in execute_dml(
            spark, catalog,
            "EXPLAIN UPDATE d.x SET name = 'z' WHERE upper(name) = 'N7'",
        ).collect()
    ]
    assert "files planned: 5" in lines[1] and "pruned: False" in lines[2]
    t = catalog.load_table(TableIdentifier.parse("d.x"))
    assert t.metadata.current_snapshot_id == before  # nothing committed
    assert t.to_df(spark).count() == 60


def test_update_cow_lineage_stays_full_overwrite(catalog, spark):
    """The lineage-preserving CoW UPDATE keeps the table-wide overwrite
    (rewritten files need their _row_id map rebuilt) — exactness first."""
    t = _seed(catalog, spark, "d.ul")
    execute_dml(
        spark, catalog,
        "UPDATE d.ul SET name = 'hit' WHERE r = 1",
        strategy="cow", preserve_lineage=True,
    )
    t = catalog.load_table(TableIdentifier.parse("d.ul"))
    rows = {r.k: r.name for r in t.to_df(spark).collect()}
    assert len(rows) == 60
    for k in range(60):
        assert rows[k] == ("hit" if k % 5 == 1 else f"n{k}")


def test_delete_update_with_subquery_where(catalog, spark):
    """r15: DML WHEREs may contain SUBQUERIES (the tombstone pattern) —
    Dataset.filter cannot parse them, so the WHERE routes through
    select_sql as a full statement; catalog tables INSIDE the subquery
    resolve too."""
    t = _seed(catalog, spark, "d.sq")  # 60 rows, r = k % 5
    # tombstones as a CATALOG table (subquery ref resolution)
    tomb = spark.createDataFrame([(3,), (7,), (11,)], "k long")
    tt = catalog.create_table(TableIdentifier.parse("d.tomb"), tomb.schema)
    tt.new_transaction().append_dataframe(tomb).commit()
    execute_dml(
        spark, catalog,
        "DELETE FROM d.sq WHERE k IN (SELECT k FROM d.tomb)",
    )
    t = catalog.load_table(TableIdentifier.parse("d.sq"))
    got = sorted(r.k for r in t.to_df(spark).collect())
    assert got == [i for i in range(60) if i not in (3, 7, 11)]
    # UPDATE with an IN-subquery (MOR row delta)
    execute_dml(
        spark, catalog,
        "UPDATE d.sq SET name = 'hit' "
        "WHERE k IN (SELECT k + 1 FROM d.tomb)",
    )
    t = catalog.load_table(TableIdentifier.parse("d.sq"))
    hits = sorted(r.k for r in t.to_df(spark).filter("name = 'hit'").collect())
    assert hits == [4, 8, 12]
    # CoW delete with a subquery: overwrite keeps pred-IS-NOT-TRUE rows
    execute_dml(
        spark, catalog,
        "DELETE FROM d.sq WHERE k IN (SELECT max(k) FROM d.sq)",
        strategy="cow",
    )
    t = catalog.load_table(TableIdentifier.parse("d.sq"))
    got = sorted(r.k for r in t.to_df(spark).collect())
    assert got == [i for i in range(59) if i not in (3, 7, 11)]
    # CoW UPDATE with a subquery refuses with guidance
    with pytest.raises(ValueError, match="strategy='mor'"):
        execute_dml(
            spark, catalog,
            "UPDATE d.sq SET name = 'x' WHERE k IN (SELECT k FROM d.tomb)",
            strategy="cow",
        )
    # a quoted 'select' in a string literal is NOT a subquery
    execute_dml(
        spark, catalog, "DELETE FROM d.sq WHERE name = 'select'"
    )
    t = catalog.load_table(TableIdentifier.parse("d.sq"))
    assert t.to_df(spark).count() == 56  # nothing matched, nothing lost


def test_overwrite_string_partition_no_numeric_collision(catalog, spark):
    """r16 ADVICE: distinct STRING partition values that parse to the
    same number ('09' vs '9', '0123' vs '123', '1_0' -> int 10 via
    Python underscore parsing) must NOT collide in the dynamic-overwrite
    touched-set — pre-r16 the numeric canonicalization treated the
    untouched sibling as replaced and silently dropped its files."""
    from iceberg_catalog_postgres_spark.catalog import maintenance as m

    df = spark.createDataFrame(
        [(1, "09"), (2, "9"), (3, "0123"), (4, "123"), (5, "1_0")],
        "k long, p string",
    )
    t = catalog.create_table(
        TableIdentifier.parse("d.strp"), df.schema, partition_by=["p"]
    )
    t = t.new_transaction().append_dataframe(df.repartition("p")).commit()
    assert len(t.metadata.current_data_files()) == 5
    # restate ONLY p='9'
    t = m.overwrite_partitions(
        spark, t, spark.createDataFrame([(20, "9")], "k long, p string")
    )
    rows = sorted((r.k, r.p) for r in t.to_df(spark).collect())
    assert rows == [(1, "09"), (3, "0123"), (4, "123"), (5, "1_0"), (20, "9")]
    # restate ONLY p='123' — '0123' must survive
    t = m.overwrite_partitions(
        spark, t, spark.createDataFrame([(40, "123")], "k long, p string")
    )
    rows = sorted((r.k, r.p) for r in t.to_df(spark).collect())
    assert rows == [(1, "09"), (3, "0123"), (5, "1_0"), (20, "9"), (40, "123")]
    # NUMERIC partitions keep spelling-insensitive matching: a static
    # clause naming day = 5 still truncates a file recorded under "5"
    dfn = spark.createDataFrame([(1, 5), (2, 6)], "k long, day long")
    tn = catalog.create_table(
        TableIdentifier.parse("d.nump"), dfn.schema, partition_by=["day"]
    )
    tn = tn.new_transaction().append_dataframe(dfn.repartition("day")).commit()
    tn = m.overwrite_partitions(
        spark, tn,
        spark.createDataFrame([], "k long, day long"),
        replace_partitions=[{"day": 5}],
    )
    assert sorted((r.k, r.day) for r in tn.to_df(spark).collect()) == [(2, 6)]
