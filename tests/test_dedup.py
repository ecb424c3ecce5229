"""SimHash variant parity: the production (xxhash64) variant is certified by
proxy — it must run the identical ``_simhash_pairs`` pipeline as the
oracle-certified md5 twin, differing only in the token hash."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.llm.dedup import _simhash_pairs, dedup_simhash
from iceberg_catalog_postgres_spark.registry import load_all, load_parallel

REGISTRY = load_all()


def test_simhash_not_registered():
    """The xxhash64 variant is a library function, not a registry entry —
    no rows-only dedup entries may remain in the registry."""
    assert "dedup_simhash" not in REGISTRY
    rows_only_dedup = [
        n for n, s in REGISTRY.items() if not s.oracle and "dedup" in s.tags
    ]
    assert rows_only_dedup == []


def test_simhash_xxhash_schema_and_invariants(spark, sf_smoke):
    df = dedup_simhash(spark, sf_smoke)
    assert [f.name for f in df.schema.fields] == ["doc_a", "doc_b", "hamming"]
    rows = df.collect()
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert 0 <= r["hamming"] <= 3


def test_simhash_variants_share_pipeline(spark, sf_smoke):
    """Both variants are the same pipeline with the hash swapped: feeding the
    md5-derived hash through _simhash_pairs must equal the registered
    dedup_simhash_md5 query row-for-row."""
    d = load_parallel(spark, sf_smoke, "documents")
    hash32 = F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
    via_helper = sorted(map(tuple, _simhash_pairs(d, hash32).collect()))
    via_registry = sorted(map(tuple, REGISTRY["dedup_simhash_md5"].fn(spark, sf_smoke).collect()))
    assert via_helper == via_registry


def test_simhash_candidate_stage_single_join(spark, sf_smoke):
    """The candidate stage is ONE equi-join on (half_idx, key) — the r2 plan
    had a lo-join unioned with a hi-join (4 document scans, 18 exchanges).
    Pin the improved shape: no cartesian, at most 2 parquet scans."""
    df = REGISTRY["dedup_simhash_md5"].fn(spark, sf_smoke)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "CartesianProduct" not in plan
    assert plan.count("Scan parquet") <= 2, plan.count("Scan parquet")
