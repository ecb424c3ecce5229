"""LSH bucket-size cap: a planted mega-bucket (boilerplate-heavy corpus)
must not go quadratic — its pairs are skipped and surfaced via the
overflow accounting instead."""

from __future__ import annotations

from iceberg_catalog_postgres_spark.llm.dedup import (
    bucket_candidate_pairs,
    oversized_buckets,
)


def test_mega_bucket_is_capped_and_reported(spark):
    rows = [(i, 0, "hot") for i in range(60)]  # mega-bucket: 60 docs, 1770 pairs
    rows += [(100, 1, "cold"), (101, 1, "cold"), (102, 1, "cold")]  # small bucket
    bands = spark.createDataFrame(rows, "doc_id long, band int, key string")

    pairs = bucket_candidate_pairs(bands, max_bucket=50)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert got == {(100, 101), (100, 102), (101, 102)}

    over = oversized_buckets(bands, max_bucket=50).collect()
    assert [(r["band"], r["key"], r["n_docs"]) for r in over] == [(0, "hot", 60)]


def test_cap_inactive_below_threshold(spark):
    rows = [(i, 0, "k") for i in range(5)]
    bands = spark.createDataFrame(rows, "doc_id long, band int, key string")
    assert bucket_candidate_pairs(bands, max_bucket=50).count() == 10  # C(5,2)
    assert oversized_buckets(bands, max_bucket=50).count() == 0


def test_simhash_capped_path_matches_same_cap_oracle(spark, sf_smoke):
    """The half-bucket cap's ENGAGED path is certified, not just its dormant
    one: at sf0.001 half-buckets up to ~161 docs exist, so a cap of 50 drops
    real buckets. The Spark pipeline with max_bucket=50 must equal the
    DuckDB oracle with the SAME cap, and must differ from the uncapped run
    (proving the cap actually dropped pairs) — the exact divergence the r3
    advisory warned the registered query could hide on a denser corpus."""
    import duckdb
    from pyspark.sql import functions as F

    from iceberg_catalog_postgres_spark.llm.dedup import _simhash_md5_oracle, _simhash_pairs
    from iceberg_catalog_postgres_spark.registry import load_parallel

    d = load_parallel(spark, sf_smoke, "documents")
    hash32 = F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")

    capped = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in _simhash_pairs(d, hash32, max_bucket=50).collect()
    }
    uncapped = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in _simhash_pairs(d, hash32, max_bucket=10**9).collect()
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_smoke}/documents.parquet')"
    )
    oracle = {
        (int(a), int(b), int(h))
        for a, b, h in con.execute(_simhash_md5_oracle(max_bucket=50)).fetchall()
    }

    assert capped == oracle, (
        f"spark-only: {sorted(capped - oracle)[:5]} oracle-only: {sorted(oracle - capped)[:5]}"
    )
    assert capped < uncapped, "cap=50 must actually drop candidate pairs at sf0.001"
