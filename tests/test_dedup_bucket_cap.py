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
