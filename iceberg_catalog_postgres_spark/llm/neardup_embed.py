"""Embedding-cosine near-duplicate PAIRS via LSH-bucket blocking — the
pair-level API (doc_a, doc_b, cosine) that a dedup pipeline consumes, as
opposed to the per-label counts in ``sim_label_blocked_pairs``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.registry import load_parallel, register

THRESHOLD = 0.40
N_PLANES = 3  # 8 buckets: coarse enough that near-pairs usually collide


from iceberg_catalog_postgres_spark.llm.lsh_planes import bucket_col as _bucket_col
from iceberg_catalog_postgres_spark.llm.lsh_planes import bucket_sql as _bucket_sql


@register(
    "dedup_embedding_cosine_pairs",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    sig AS (
      SELECT vec_id, e,
             {_bucket_sql("e", 7, N_PLANES)} AS bucket
      FROM v
    ),
    pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             list_sum(list_transform(range(1, 65), i -> a.e[i] * b.e[i]))
               / (sqrt(list_sum(list_transform(a.e, x -> x * x)))
                  * sqrt(list_sum(list_transform(b.e, x -> x * x)))) AS cosine
      FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, round(cosine, 6) AS cosine
    FROM pairs WHERE cosine > {THRESHOLD}
    """,
    tags=("llm", "dedup", "embedding"),
)
def dedup_embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs above cosine {T}, candidates restricted to shared
    sign-LSH buckets (recall traded for never computing all O(n^2) pairs).

    Scale: bucket equi-join keys the shuffle; exact cosine runs only inside
    buckets (~n^2/2^planes pairs). More planes => fewer candidates, lower
    recall; production uses multiple hash tables OR'd together to recover
    recall — same plan shape, one union.
    """
    e = load_parallel(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("e")
    )

    sig = e.withColumn("bucket", _bucket_col("e", 7, N_PLANES))
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda s, x: s + x)
    )
    # per-row norms precomputed before the pair join (r17) — bit-identical
    a = sig.select(
        F.col("vec_id").alias("vec_a"),
        F.col("e").alias("ea"),
        F.col("bucket").alias("ba"),
        norm(F.col("e")).alias("na"),
    )
    b = sig.select(
        F.col("vec_id").alias("vec_b"),
        F.col("e").alias("eb"),
        F.col("bucket").alias("bb"),
        norm(F.col("e")).alias("nb_"),
    )
    dot = F.aggregate(F.zip_with(F.col("ea"), F.col("eb"), lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    cos = dot / (F.col("na") * F.col("nb_"))
    return (
        a.join(b, (F.col("ba") == F.col("bb")) & (F.col("vec_a") < F.col("vec_b")))
        .filter(cos > THRESHOLD)
        .select("vec_a", "vec_b", F.round(cos, 6).alias("cosine"))
    )


dedup_embedding_cosine_pairs.__doc__ = dedup_embedding_cosine_pairs.__doc__.replace("{T}", str(THRESHOLD))
