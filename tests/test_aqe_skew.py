"""AQE skew-join split certification (r8, VERDICT r6/r7 carried item): the
session enables spark.sql.adaptive.skewJoin (session.py:42), but nothing
proved a hot partition actually SPLITS. At 100x organic skew this automatic
path — not the manual salted join (operators/scale_patterns.py) — is what
keeps the join's straggler task from running 400x longer than the median.

The test builds a synthetic hot-key join (one key carrying ~83% of the
rows), lowers the skew thresholds so local[*] data sizes trip them, runs a
sort-merge join, and asserts from the FINAL adaptive plan + its SQL metrics
that the skewed partition was split into >1 read (numSkewedSplits), with
the exact join result unchanged."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SKEW_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # local test data is MBs, not the prod-default 256MB threshold — scale
    # the knobs down so the same code path fires (documented: at a real
    # 1000-executor deployment these stay at defaults)
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256k",
}


@pytest.fixture
def skew_conf(spark):
    saved = {}
    for k, v in SKEW_CONFS.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    yield
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _aqe_metrics(df, node_substr: str) -> list[dict]:
    """Walk the executed (final) adaptive plan via py4j and collect SQL
    metric values from every node whose name contains ``node_substr``."""
    plan = df._jdf.queryExecution().executedPlan()
    if plan.nodeName() == "AdaptiveSparkPlan":
        plan = plan.executedPlan()  # the final physical plan after reoptimization

    found = []

    def walk(node):
        if node_substr in node.nodeName():
            metrics = {}
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                metrics[kv._1()] = kv._2().value()
            found.append(metrics)
        # children
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))
        # query-stage nodes wrap their subtree behind plan()
        if node.nodeName().endswith("QueryStage"):
            walk(node.plan())

    walk(plan)
    return found


def test_aqe_splits_skewed_join_partition(spark, skew_conf):
    hot, spread, n_keys = 500_000, 100_000, 100
    left = spark.range(hot + spread).select(
        F.when(F.col("id") < hot, F.lit(0))
        .otherwise((F.col("id") % n_keys) + 1)
        .alias("k"),
        # ~80-byte payload so the hot partition's shuffle bytes clear the
        # (lowered) 1 MB skew threshold
        F.concat(F.lit("x" * 72), F.col("id").cast("string")).alias("payload"),
    )
    right = spark.range(n_keys + 1).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    # the aggregate sits ON TOP of the join, so its (single) query execution
    # carries the join's AQEShuffleRead nodes — collect() runs exactly this
    # DataFrame's QueryExecution, which is the one we then inspect
    agg = left.join(right, "k").agg(
        F.count("*").alias("n"), F.sum("v").alias("sv"), F.sum(F.length("payload")).alias("sp")
    )
    [row] = agg.collect()

    # exact result unchanged by the split
    assert row["n"] == hot + spread
    expected_sv = sum(
        2 * k * (spread // n_keys) for k in range(1, n_keys + 1)
    )
    assert row["sv"] == expected_sv

    plan_str = agg._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan_str, "AQE did not finalize the plan"

    reads = _aqe_metrics(agg, "AQEShuffleRead")
    skewed_parts = sum(int(m.get("numSkewedPartitions", 0)) for m in reads)
    skewed_splits = sum(int(m.get("numSkewedSplits", 0)) for m in reads)
    assert skewed_parts >= 1, f"no partition marked skewed; reads={reads}, plan:\n{plan_str}"
    assert skewed_splits > 1, (
        f"hot partition was not split (splits={skewed_splits}); plan:\n{plan_str}"
    )


def test_aqe_no_split_without_skew(spark, skew_conf):
    """Control: a uniform join under the same lowered thresholds must NOT
    trigger skew handling — proves the positive test measures the split,
    not the conf."""
    n = 200_000
    left = spark.range(n).select(
        (F.col("id") % 64).alias("k"),
        F.concat(F.lit("x" * 72), F.col("id").cast("string")).alias("payload"),
    )
    right = spark.range(64).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    agg = left.join(right, "k").agg(F.count("*").alias("n"))
    [row] = agg.collect()
    assert row["n"] == n
    reads = _aqe_metrics(agg, "AQEShuffleRead")
    assert sum(int(m.get("numSkewedPartitions", 0)) for m in reads) == 0
