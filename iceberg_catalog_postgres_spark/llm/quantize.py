"""Embedding compression operators: int8 quantization with reconstruction
error, L2 normalization, and per-label centroid statistics.

All map-side array math (transform/aggregate folds in fp64) — the storage-
side half of the similarity-search stack: quantize for 4x smaller indexes,
normalize so cosine becomes dot product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.registry import load_parallel, register


def _vec(col: str):
    return F.transform(F.col(col), lambda x: x.cast("double"))


def _fold_sum(arr):
    return F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)


@register(
    "embed_int8_quantize_error",
    oracle="""
    WITH v AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e,
             greatest(list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))), 1e-12) AS scale
      FROM embeddings
    ),
    q AS (
      SELECT vec_id, label, e, scale,
             list_transform(e, x -> round(x / scale * 127.0)) AS qe
      FROM v
    )
    SELECT label,
           count(*) AS n_vectors,
           round(avg(sqrt(list_sum(list_transform(range(1, 65),
                 i -> pow(e[i] - qe[i] * scale / 127.0, 2))) / 64.0)), 9) AS rms_error,
           round(avg(scale), 6) AS avg_scale
    FROM q
    GROUP BY label
    """,
    tags=("llm", "embedding", "quantization"),
)
def embed_int8_quantize_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization (per-vector absmax scale) + RMS
    reconstruction error per label — the quantize-then-validate pass before
    shipping a compressed ANN index.

    Scale: pure map-side per-vector math; the only shuffle is the tiny
    label agg. At 100 TB the quantized vectors (+1 scale float) write back
    as a new column — 4x less index storage and memory bandwidth at query
    time. round() half-away matches across engines on the quantized grid.
    """
    e = load_parallel(spark, sf_dir, "embeddings")
    v = e.select("vec_id", "label", _vec("embedding").alias("e"))
    scale = F.greatest(
        F.array_max(F.transform(F.col("e"), lambda x: F.abs(x))), F.lit(1e-12)
    )
    v = v.withColumn("scale", scale)
    qe = F.transform(F.col("e"), lambda x: F.round(x / F.col("scale") * 127.0, 0))
    v = v.withColumn("qe", qe)
    sq_err = F.aggregate(
        F.zip_with(
            F.col("e"),
            F.col("qe"),
            lambda x, q: F.pow(x - q * F.col("scale") / 127.0, F.lit(2.0)),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return v.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg(F.sqrt(sq_err / 64.0)), 9).alias("rms_error"),
        F.round(F.avg("scale"), 6).alias("avg_scale"),
    )


@register(
    "embed_l2_normalize_check",
    oracle="""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    n AS (
      SELECT vec_id, sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm FROM v
    )
    SELECT count(*) AS n_vectors,
           round(min(nrm), 6) AS min_norm,
           round(max(nrm), 6) AS max_norm,
           count(*) FILTER (WHERE nrm < 1e-9) AS n_degenerate
    FROM n
    """,
    tags=("llm", "embedding"),
)
def embed_l2_normalize_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Norm distribution + degenerate-vector detection — the validation gate
    before normalizing a corpus so cosine reduces to dot product (saving the
    per-pair norm computations in every subsequent similarity query)."""
    e = load_parallel(spark, sf_dir, "embeddings")
    nrm = F.sqrt(_fold_sum(F.transform(_vec("embedding"), lambda x: x * x)))
    n = e.select(nrm.alias("nrm"))
    return n.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.min("nrm"), 6).alias("min_norm"),
        F.round(F.max("nrm"), 6).alias("max_norm"),
        F.count(F.when(F.col("nrm") < 1e-9, 1)).alias("n_degenerate"),
    )


@register(
    "embed_centroid_spread",
    oracle="""
    WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    cent AS (
      SELECT label, i, avg(val) AS c
      FROM (SELECT label, generate_subscripts(e, 1) AS i, unnest(e) AS val FROM v)
      GROUP BY label, i
    ),
    dists AS (
      SELECT v.vec_id, v.label, sqrt(sum(pow(v.e[c.i] - c.c, 2))) AS d
      FROM v JOIN cent c ON v.label = c.label
      GROUP BY v.vec_id, v.label
    )
    SELECT label, count(*) AS n_vectors,
           round(avg(d), 6) AS mean_dist_to_centroid
    FROM dists
    GROUP BY label
    """,
    tags=("llm", "embedding", "statistics"),
)
def embed_centroid_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid + mean distance to it (cluster tightness) — the
    one-iteration building block of the IVF k-means, oracle-checked.

    Scale: centroid = 64 avg() aggregates per label (partial-agg friendly);
    the distance pass re-joins the broadcast centroids — two passes total,
    no per-pair work.
    """
    e = load_parallel(spark, sf_dir, "embeddings")
    v = e.select("vec_id", "label", _vec("embedding").alias("e"))
    cent = v.groupBy(F.col("label").alias("cl")).agg(
        F.array(*[F.avg(F.element_at(F.col("e"), i + 1)) for i in range(64)]).alias("c")
    )
    dist = F.sqrt(
        _fold_sum(F.zip_with(F.col("e"), F.col("c"), lambda x, c: F.pow(x - c, F.lit(2.0))))
    )
    return (
        v.join(F.broadcast(cent), v.label == F.col("cl"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg(dist), 6).alias("mean_dist_to_centroid"),
        )
    )


@register(
    "embed_dim_stats",
    oracle="""
    SELECT i AS dim,
           round(avg(e[i]), 6)                    AS dim_mean,
           round(avg(e[i] * e[i]) - avg(e[i]) * avg(e[i]), 6) AS dim_var,
           round(min(e[i]), 6)                    AS dim_min,
           round(max(e[i]), 6)                    AS dim_max
    FROM (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         range(1, 65) t(i)
    GROUP BY i
    ORDER BY i
    """,
    tags=("llm", "embedding", "stats"),
)
def embed_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding health stats (mean / variance / range) — the
    feature-drift check a production embedding pipeline runs per batch: a
    collapsed dimension (var ~ 0) or a runaway range flags a bad encoder
    checkpoint before anything downstream trains on it.

    Scale: posexplode is a map-side row multiplier (n x dim rows of 12
    bytes), then one keyed agg on 64 groups — partial aggregation collapses
    each partition to 64 rows before the shuffle, so the exchange carries
    O(partitions x dims), not O(n x dims). Variance via E[x^2]-E[x]^2 keeps
    both moments in the same single-pass partial agg (matching the oracle's
    formula exactly rather than Spark's var_pop Welford form).
    """
    v = load_parallel(spark, sf_dir, "embeddings").select(_vec("embedding").alias("e"))
    exploded = v.select(F.posexplode("e").alias("pos", "x"))
    return (
        exploded.groupBy((F.col("pos") + 1).alias("dim"))
        .agg(
            F.round(F.avg("x"), 6).alias("dim_mean"),
            F.round(F.avg(F.col("x") * F.col("x")) - F.avg("x") * F.avg("x"), 6).alias("dim_var"),
            F.round(F.min("x"), 6).alias("dim_min"),
            F.round(F.max("x"), 6).alias("dim_max"),
        )
        .orderBy("dim")
    )


_MAHA_DIM = 64
_MAHA_THRESHOLD = 80.0  # ~ +1.4 sd over E[z2]=dim for near-Gaussian data


@register(
    "embed_outlier_mahalanobis",
    oracle=f"""
    WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    d AS (
      SELECT t.dim,
             round(avg(e[t.dim]), 6)          AS mu,
             round(stddev_samp(e[t.dim]), 6)  AS sd
      FROM v CROSS JOIN range(1, {_MAHA_DIM + 1}) t(dim)
      GROUP BY t.dim
    ),
    m AS (SELECT list(mu ORDER BY dim) AS mus, list(sd ORDER BY dim) AS sds FROM d),
    z AS (
      SELECT vec_id, label,
             round(list_sum(list_transform(range(1, {_MAHA_DIM + 1}),
               i -> ((e[i] - mus[i]) / sds[i]) * ((e[i] - mus[i]) / sds[i]))), 6) AS z2
      FROM v, m
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vectors,
           round(avg(z2), 4)        AS mean_z2,
           CAST(count(*) FILTER (WHERE z2 > {_MAHA_THRESHOLD}) AS BIGINT) AS n_outliers
    FROM z GROUP BY label
    """,
    tags=("llm", "embedding", "quality", "outlier"),
)
def embed_outlier_mahalanobis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding outlier screen: diagonal-covariance Mahalanobis distance
    per vector (sum of per-dimension z-scores squared — E[z2] = dim for
    healthy data), rolled up per label with an outlier count. This is the
    cheap corpus-embedding health gate that catches batch-norm drift,
    truncated vectors, and mis-encoded rows before they poison an index
    or a training mixture.

    Plan: per-dim mean/std come from ONE explode+groupBy over (dim, x)
    pairs; the 64 (mu, sd) pairs are re-entered as plan literals (rounded
    to 6 — the same determinism contract as the IVF/PQ centroids), so the
    per-vector z2 is a map-side left-to-right array fold with zero
    additional shuffles. The label rollup is the only other exchange.

    Scale: stats are O(dim) driver state; the corpus is scanned twice
    (once for moments, once for scoring) — a production run fuses both
    into one pass with Welford accumulators when the corpus dominates.
    """
    from iceberg_catalog_postgres_spark.llm.similarity import _vec

    e = load_parallel(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _vec("embedding").alias("e")
    )
    d = (
        e.select(F.posexplode("e").alias("dim0", "x"))
        .groupBy("dim0")
        .agg(
            F.round(F.avg("x"), 6).alias("mu"),
            F.round(F.stddev_samp("x"), 6).alias("sd"),
        )
        .collect()
    )
    by_dim = {r["dim0"]: (r["mu"], r["sd"]) for r in d}
    mus = F.array(*[F.lit(float(by_dim[i][0])) for i in range(_MAHA_DIM)])
    sds = F.array(*[F.lit(float(by_dim[i][1])) for i in range(_MAHA_DIM)])
    diffs = F.zip_with(F.col("e"), mus, lambda x, m: x - m)
    zsq = F.zip_with(diffs, sds, lambda dd, s: (dd / s) * (dd / s))
    z2 = F.round(
        F.aggregate(zsq, F.lit(0.0), lambda acc, x: acc + x), 6
    ).alias("z2")
    return (
        e.select("vec_id", "label", z2)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("z2"), 4).alias("mean_z2"),
            F.sum((F.col("z2") > _MAHA_THRESHOLD).cast("long")).alias("n_outliers"),
        )
    )


@register(
    "embed_duplicate_exact",
    oracle="""
    WITH feed AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id < 25
    )
    SELECT CAST(min(vec_id) AS BIGINT) AS keep_vec_id,
           CAST(count(*) AS BIGINT)    AS n_copies
    FROM feed
    GROUP BY embedding
    HAVING count(*) > 1
    """,
    tags=("llm", "embedding", "dedup"),
)
def embed_duplicate_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit-identical EMBEDDING dedup: group directly on the vector value
    (both engines group float arrays element-exact), keep the lowest id —
    the cheap pre-pass before any ANN near-dedup, catching re-encoded or
    double-ingested rows whose vectors are byte-equal. Input is the corpus
    plus a re-ingestion of its first 25 vectors under new ids so the
    operator has work to find.

    Scale: shuffles the vector once as the grouping key (dim floats per
    row); at 100 TB a production pass keys on xxhash64 of the vector bytes
    instead (8-byte keys) with an equality verify — the same hash-then-
    verify shape as exact text dedup.
    """
    e = load_parallel(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    reingested = e.filter(F.col("vec_id") < 25).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    feed = e.unionByName(reingested)
    return (
        feed.groupBy("embedding")
        .agg(
            F.min("vec_id").alias("keep_vec_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
        .select("keep_vec_id", "n_copies")
    )
