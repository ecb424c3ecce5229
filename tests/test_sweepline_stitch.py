"""Bucketed-stitch windows == global windows, pinned on skewed synthetic data.

VERDICT r5 flagged the two remaining un-partitioned data-proportional windows
(`events_max_concurrent`, `pareto_revenue_coverage`). Both now run the
bucket-and-stitch form; these tests certify the stitch is EXACT (not
approximate) against the straightforward global-window computation, on inputs
deliberately skewed so most rows land in one bucket (the worst stitching case:
offsets must cross many empty/thin buckets and one dense burst).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from iceberg_catalog_postgres_spark.operators.sessions import (
    _bucketed_sweep_max,
    _purchase_interval_deltas,
)


def _global_sweep_max(pts):
    run = pts.withColumn(
        "conc",
        F.sum("d").over(
            W.orderBy(F.col("t").asc(), F.col("d").asc()).rowsBetween(
                W.unboundedPreceding, W.currentRow
            )
        ),
    )
    return run.agg(F.max("conc").alias("peak_concurrency"))


@pytest.mark.parametrize("bucket_ms", [1000, 3600_000, 10**12])
def test_bucketed_sweep_equals_global_on_skewed_burst(spark, bucket_ms):
    """A 500-interval burst inside one second (all in ONE bucket at any
    reasonable width) plus a sparse tail across hours: stitched peak must
    equal the global running-sum peak for thin, typical, and degenerate
    (everything-in-one-bucket) widths alike."""
    rows = []
    # burst: 500 intervals opening within the same second, 10ms apart, each
    # 5s long -> deep overlap (peak well over 400)
    for i in range(500):
        s = 1_000_000 + i * 10
        rows.append((s, 1))
        rows.append((s + 5000, -1))
    # sparse tail: one interval per hour, no overlap
    for h in range(20):
        s = 10_000_000 + h * 3600_000
        rows.append((s, 1))
        rows.append((s + 1000, -1))
    pts = spark.createDataFrame(rows, "t long, d int").repartition(8)
    got = _bucketed_sweep_max(pts, bucket_ms=bucket_ms).first()[0]
    want = _global_sweep_max(pts).first()[0]
    assert got == want
    assert got > 400  # the burst really overlaps


def test_bucketed_sweep_touching_intervals_do_not_double_count(spark):
    """End-before-start at equal t (d ascending) must survive stitching even
    when the shared timestamp falls exactly on a bucket boundary."""
    bucket = 1000
    rows = [(0, 1), (1000, -1), (1000, 1), (2000, -1)]  # touching at t=1000
    pts = spark.createDataFrame(rows, "t long, d int")
    got = _bucketed_sweep_max(pts, bucket_ms=bucket).first()[0]
    assert got == 1


def test_events_query_stitch_matches_global_on_fixture(spark):
    """The registered query's own input (sf0.001 purchases) through both
    forms: bucketed stitch == global window, bit-exact."""
    from iceberg_catalog_postgres_spark.registry import load
    from tests.conftest import SF_SMOKE

    pts = _purchase_interval_deltas(load(spark, SF_SMOKE, "events"))
    got = _bucketed_sweep_max(pts).first()[0]
    want = _global_sweep_max(pts).first()[0]
    assert got == want


def test_pareto_no_unpartitioned_window_in_plan(spark):
    """The pareto physical plan must contain no un-partitioned ordered
    window over data-proportional rows: every Window node either has a
    partition spec or runs over the per-bucket totals (<= 64 rows).
    Cheap proxy pinned here: the plan's Sort-for-Window nodes all sort by
    bkt first (partition key), never a bare global (r DESC) sort feeding a
    Window."""
    from iceberg_catalog_postgres_spark.operators.relational import (
        pareto_revenue_coverage,
    )
    from tests.conftest import SF_SMOKE

    df = pareto_revenue_coverage(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            # every window spec must carry a partition column (bkt) except
            # the bucket-offset window, which orders by bkt itself
            assert "bkt" in line, f"un-partitioned data window in plan: {line}"


def test_pareto_value_matches_prior_global_form(spark):
    """Stitched pareto == the r5 global-window formulation, run side by side."""
    from iceberg_catalog_postgres_spark.registry import load
    from tests.conftest import SF_SMOKE

    rev = (
        load(spark, SF_SMOKE, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("r"))
    )
    wrun = W.orderBy(F.col("r").desc(), F.col("o_custkey").asc()).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    total = rev.agg(F.sum("r")).first()[0]
    n = rev.count()
    ranked = rev.select(
        F.sum("r").over(wrun).alias("cum_r"),
        F.row_number()
        .over(W.orderBy(F.col("r").desc(), F.col("o_custkey").asc()))
        .alias("rk"),
    )
    want = ranked.agg(
        F.min(F.when(F.col("cum_r") >= 0.8 * float(total), F.col("rk")))
    ).first()[0]

    from iceberg_catalog_postgres_spark.operators.relational import (
        pareto_revenue_coverage,
    )

    got = pareto_revenue_coverage(spark, SF_SMOKE).first()
    assert got["n_for_80pct"] == want
    assert got["n_customers"] == n


def test_global_ranking_stitch_matches_builtin(spark):
    """window_rank_dense_ntile's bucket-stitched rank/dense_rank/ntile must
    equal Spark's built-in global windows, including tie groups (equal
    acctbal) and the ntile extras-to-first-buckets distribution."""
    from pyspark.sql.window import Window as W

    from iceberg_catalog_postgres_spark.operators.windows import (
        window_rank_dense_ntile,
    )
    from iceberg_catalog_postgres_spark.registry import load
    from tests.conftest import SF_SMOKE

    got = {
        r["s_suppkey"]: (r["rnk"], r["drnk"], r["quartile"])
        for r in window_rank_dense_ntile(spark, SF_SMOKE).collect()
    }
    s = load(spark, SF_SMOKE, "supplier")
    w_bal = W.orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey").asc())
    w_nat = W.orderBy(F.col("s_nationkey").asc())
    want = {
        r["s_suppkey"]: (r["rnk"], r["drnk"], r["quartile"])
        for r in s.select(
            "s_suppkey",
            F.rank().over(w_bal).alias("rnk"),
            F.dense_rank().over(w_nat).alias("drnk"),
            F.ntile(4).over(w_bal).alias("quartile"),
        ).collect()
    }
    assert got == want


def test_global_ranking_stitch_with_heavy_ties(spark):
    """Synthetic frame where one tie group holds half the rows: rank gaps
    and ntile boundaries must survive the stitch (ties share a value-range
    bucket by construction)."""
    from pyspark.sql.window import Window as W

    rows = [(i, 500.0 if i % 2 == 0 else float(i), i % 5) for i in range(200)]
    df = spark.createDataFrame(rows, "s_suppkey long, s_acctbal double, s_nationkey int")

    import iceberg_catalog_postgres_spark.operators.windows as wmod
    orig_load = wmod.load
    wmod.load = lambda sp, d, t: df
    try:
        got = {
            r["s_suppkey"]: (r["rnk"], r["drnk"], r["quartile"])
            for r in wmod.window_rank_dense_ntile(spark, "ignored").collect()
        }
    finally:
        wmod.load = orig_load
    w_bal = W.orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey").asc())
    w_nat = W.orderBy(F.col("s_nationkey").asc())
    want = {
        r["s_suppkey"]: (r["rnk"], r["drnk"], r["quartile"])
        for r in df.select(
            "s_suppkey",
            F.rank().over(w_bal).alias("rnk"),
            F.dense_rank().over(w_nat).alias("drnk"),
            F.ntile(4).over(w_bal).alias("quartile"),
        ).collect()
    }
    assert got == want


def test_stitched_rankings_handle_empty_input(spark, monkeypatch):
    """Empty supplier: the stitched ranking queries must return empty
    frames with the declared schema, not crash on float(None) ranges."""
    import iceberg_catalog_postgres_spark.operators.advanced as amod
    import iceberg_catalog_postgres_spark.operators.windows as wmod

    empty = spark.createDataFrame(
        [], "s_suppkey long, s_acctbal double, s_nationkey int"
    )
    monkeypatch.setattr(wmod, "load", lambda sp, d, t: empty)
    monkeypatch.setattr(amod, "load", lambda sp, d, t: empty)
    assert wmod.window_rank_dense_ntile(spark, "x").count() == 0
    assert amod.window_percent_rank_cume(spark, "x").count() == 0


def test_stitched_ntile_fewer_rows_than_tiles(spark, monkeypatch):
    """n < k: each row is its own tile (Spark semantics) — the stitched
    arithmetic's q=0 edge."""
    from pyspark.sql.window import Window as W

    import iceberg_catalog_postgres_spark.operators.windows as wmod

    tiny = spark.createDataFrame(
        [(1, 9.0, 0), (2, 5.0, 1), (3, 1.0, 2)],
        "s_suppkey long, s_acctbal double, s_nationkey int",
    )
    monkeypatch.setattr(wmod, "load", lambda sp, d, t: tiny)
    got = {
        r["s_suppkey"]: r["quartile"]
        for r in wmod.window_rank_dense_ntile(spark, "x").collect()
    }
    want = {
        r["s_suppkey"]: r["q"]
        for r in tiny.select(
            "s_suppkey",
            F.ntile(4)
            .over(W.orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey").asc()))
            .alias("q"),
        ).collect()
    }
    assert got == want == {1: 1, 2: 2, 3: 3}
