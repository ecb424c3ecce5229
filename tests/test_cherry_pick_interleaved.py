"""Cherry-pick must re-apply exactly the snapshot's OWN file delta, even
when the snapshots list interleaves branch commits with main-side rewrites
(r6 self-review find: positional-predecessor diffing resurrected the whole
old lineage when the list neighbor was an unrelated overwrite)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from iceberg_catalog_postgres_spark.catalog.catalog import (
    PostgresCatalog,
    TableIdentifier,
)


@pytest.fixture
def catalog(tmp_path):
    cat = PostgresCatalog.connect("cp_cat", None, str(tmp_path / "warehouse"))
    cat.initialize()
    yield cat
    cat.backend.close()


S = StructType(
    [StructField("k", LongType(), True), StructField("v", LongType(), True)]
)


def test_cherry_pick_across_interleaved_overwrite(catalog, spark):
    """snapshots = [A, B1(branch), M(main overwrite), B2(branch)]: B2's
    positional predecessor is the overwrite M, but its real delta is only
    its own files. Cherry-picking B2 onto main must append exactly B2's
    rows — not resurrect A's or B1's lineage."""
    t = catalog.create_table(TableIdentifier.parse("cp.t1"), S)
    mk = lambda lo, hi: spark.createDataFrame(  # noqa: E731
        [(i, i * 10) for i in range(lo, hi)], S
    ).coalesce(1)

    t = t.new_transaction().append_dataframe(mk(0, 10)).commit()          # A
    t = t.new_transaction(branch="wap").append_dataframe(mk(100, 105)).commit()  # B1
    # main-side full rewrite (compaction shape): same rows, NEW files
    t = t.new_transaction().overwrite_dataframe(mk(0, 10)).commit()       # M
    t = t.new_transaction(branch="wap").append_dataframe(mk(200, 203)).commit()  # B2
    b2_id = t.metadata.refs["wap"]["snapshot-id"]

    t = t.new_transaction().cherry_pick(b2_id).commit()
    got = sorted(r["k"] for r in t.to_df(spark).collect())
    # main rows + ONLY B2's delta; B1's rows stay branch-only, nothing doubled
    assert got == [*range(0, 10), *range(200, 203)]


def test_cherry_pick_unknown_and_non_append_rejected(catalog, spark):
    t = catalog.create_table(TableIdentifier.parse("cp.t2"), S)
    df = spark.createDataFrame([(1, 1)], S).coalesce(1)
    t = t.new_transaction().append_dataframe(df).commit()
    t = t.new_transaction().overwrite_dataframe(df).commit()
    ow_id = t.metadata.current_snapshot_id
    with pytest.raises(ValueError, match="no such snapshot"):
        t.new_transaction().cherry_pick(999999)
    with pytest.raises(ValueError, match="only append snapshots"):
        t.new_transaction().cherry_pick(ow_id)


def test_cherry_pick_empty_delta_rejected(catalog, spark):
    """A snapshot that added no files (raw append_files([]) commit) has
    nothing to re-apply — explicit error beats a silent no-op commit."""
    t = catalog.create_table(TableIdentifier.parse("cp.t3"), S)
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(1, 1)], S).coalesce(1)
    ).commit()
    t = t.new_transaction().append_files([]).commit()
    empty_id = t.metadata.current_snapshot_id
    with pytest.raises(ValueError, match="added no data files"):
        t.new_transaction().cherry_pick(empty_id)


def test_dynamic_overwrite_rejects_mixed_spec_files(catalog, spark):
    """After partition evolution, files written under the OLD spec can't be
    partition-matched by the new spec's values — dynamic overwrite must
    refuse (their rows could silently go stale next to the restatement)."""
    from iceberg_catalog_postgres_spark.catalog.maintenance import (
        overwrite_partitions,
    )

    t = catalog.create_table(TableIdentifier.parse("cp.dpo"), S, partition_by=["k"])
    df = spark.createDataFrame([(1, 1), (2, 2)], S).coalesce(1)
    t = t.new_transaction().append_dataframe(df).commit()
    t = t.commit_partition_spec(["v"])  # evolve: old files carry {k} tuples
    with pytest.raises(ValueError, match="different spec"):
        overwrite_partitions(spark, t, spark.createDataFrame([(1, 9)], S))


def test_partition_filter_keeps_old_spec_files_superset_safe(catalog, spark):
    """r7: a partition filter on the NEW spec column must KEEP files whose
    tuples were recorded under an older spec — they may contain matching
    rows (pre-r7 they were silently excluded: a partition-filtered read
    returned 1 of 3 true rows after evolving ["k"] -> ["v"]). New-spec
    files still prune by their recorded values."""
    t = catalog.create_table(TableIdentifier.parse("cp.mixedread"), S, partition_by=["k"])
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(1, 2), (2, 2)], S).coalesce(1)
    ).commit()
    t = t.commit_partition_spec(["v"])
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(3, 2), (4, 5)], S).coalesce(1)
    ).commit()
    total = len(t.metadata.current_data_files())
    planned = t.planned_files_partition({"v": 2})
    # old-spec files kept (superset-safe), the v=5 new-spec file pruned
    assert len(planned) == total - 1
    got = sorted(
        r["k"]
        for r in t.to_df(spark, partition_filter={"v": 2}).filter("v = 2").collect()
    )
    assert got == [1, 2, 3]
