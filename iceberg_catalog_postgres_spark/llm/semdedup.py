"""Semantic deduplication (SemDeDup-shape; r15, VERDICT r14 #7).

The embedding-level dedup production pipelines pair with MinHash (Abbas
et al. 2023, "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication" — public paper): k-means-cluster the embedding
corpus, compare cosine ONLY within clusters, and drop every document
whose cluster holds a sufficiently-similar representative. Composes the
repo's already-certified primitives: the deterministic 2-update Lloyd's
loop shared with the IVF index (`similarity._ivf_final_centroids`) and
the map-side assignment (`_ivf_assign`), plus the same deterministic
corpus-doubling the ANN scale matrix uses (`ann_scale._doubled`).

Scale story (the reason SemDeDup exists): all-pairs cosine over 10^9
documents is O(n^2) and impossible; within-cluster pairs are
O(n^2 / k), and k grows WITH the corpus (here 8 -> 16 when the corpus
doubles), keeping candidates-per-document FLAT — reported as data at
both scales. Keep-one policy: within a duplicate pair the LOWER vec_id
survives (deterministic, order-free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.llm.ann_scale import (
    DIM,
    _doubled,
    _ivf_iter,
    _PERTURB_SQL,
)
from iceberg_catalog_postgres_spark.llm.similarity import (
    _ivf_assign,
    _ivf_final_centroids,
)
from iceberg_catalog_postgres_spark.registry import load_parallel, register

THRESHOLD = 0.40  # same boundary the certified pair-level row uses

_COS = (
    f"list_sum(list_transform(range(1, {DIM + 1}), i -> ea[i] * eb[i]))"
    f" / (sqrt(list_sum(list_transform(ea, x -> x * x)))"
    f" * sqrt(list_sum(list_transform(eb, x -> x * x))))"
)


def _scale_sql(sfx: str, v: str, k: int, scale_x: int) -> str:
    """Cluster assignment (unrolled Lloyd, shared CTE builder) ->
    within-cluster pairs -> duplicate pairs -> keep-one verdict summary."""
    return f"""ci_{sfx}_0 AS (
      SELECT CAST(vec_id AS INT) AS cluster, e AS c FROM {v} WHERE vec_id < {k}
    ),
    {_ivf_iter(sfx, 1, f"ci_{sfx}_0", v)},
    {_ivf_iter(sfx, 2, f"ci_{sfx}_1", v)},
    di_{sfx}_3 AS (
      SELECT t.vec_id, c.cluster,
             list_sum(list_transform(range(1, {DIM + 1}),
               i -> (t.e[i] - c.c[i]) * (t.e[i] - c.c[i]))) AS dist
      FROM {v} t, ci_{sfx}_2 c
    ),
    ai_{sfx}_3 AS (
      SELECT vec_id, cluster FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
          ORDER BY dist ASC, cluster ASC) AS rn
        FROM di_{sfx}_3
      ) WHERE rn = 1
    ),
    pairs_{sfx} AS (
      SELECT a.vec_id AS va, b.vec_id AS vb, va_t.e AS ea, vb_t.e AS eb
      FROM ai_{sfx}_3 a
      JOIN ai_{sfx}_3 b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      JOIN {v} va_t ON va_t.vec_id = a.vec_id
      JOIN {v} vb_t ON vb_t.vec_id = b.vec_id
    ),
    dup_{sfx} AS (
      SELECT va, vb FROM pairs_{sfx} WHERE {_COS} > {THRESHOLD}
    ),
    sum_{sfx} AS (
      SELECT CAST({scale_x} AS BIGINT) AS scale_x,
             CAST({k} AS BIGINT) AS k,
             (SELECT count(*) FROM {v}) AS n_docs,
             (SELECT count(DISTINCT cluster) FROM ai_{sfx}_3) AS n_clusters,
             (SELECT count(*) FROM pairs_{sfx}) AS n_cand_pairs,
             (SELECT count(*) FROM dup_{sfx}) AS n_dup_pairs,
             (SELECT count(*) FROM (SELECT DISTINCT vb FROM dup_{sfx}))
               AS n_dropped,
             (SELECT CAST(coalesce(sum(vb), 0) AS BIGINT)
              FROM (SELECT DISTINCT vb FROM dup_{sfx})) AS sum_dropped
    )"""


_ORACLE = f"""
    WITH v1 AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    {_PERTURB_SQL},
    {_scale_sql("s1", "v1", 8, 1)},
    {_scale_sql("s2", "v2", 16, 2)}
    SELECT * FROM sum_s1 UNION ALL SELECT * FROM sum_s2 ORDER BY scale_x
"""


@register(
    "dedup_semdedup",
    oracle=_ORACLE,
    tags=("llm", "dedup", "embedding", "semdedup", "clustering"),
)
def dedup_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup verdicts at 1x AND 2x corpus: cluster (k=8 -> k=16 with
    the doubled corpus — index granularity scales with the data), compare
    cosine within clusters only, drop the higher vec_id of every
    duplicate pair. The row returns, per scale: cluster/candidate/dup
    counts, the dropped-set size and its id-sum (the per-doc verdict as
    a checksum — recomputed relationally by the oracle through the SAME
    unrolled Lloyd iterations), with candidates-per-doc flat across the
    doubling (n_cand_pairs grows ~linearly, not quadratically).

    Scale: assignment is map-side (centroids ride the plan as literals),
    the pair join shuffles on cluster id only, and nothing ever computes
    a cross join — the 100 TB shape."""
    v1 = load_parallel(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("e"),
    )
    rows = []
    for v, k, scale_x in ((v1, 8, 1), (_doubled(v1), 16, 2)):
        cents = _ivf_final_centroids(v, k=k)
        assigned = _ivf_assign(v, cents).select("vec_id", "e", "cluster")
        a = assigned.select(
            F.col("vec_id").alias("va"), F.col("e").alias("ea"),
            F.col("cluster").alias("ca"),
        )
        b = assigned.select(
            F.col("vec_id").alias("vb"), F.col("e").alias("eb"),
            F.col("cluster").alias("cb"),
        )
        pairs = a.join(
            b, (F.col("ca") == F.col("cb")) & (F.col("va") < F.col("vb"))
        ).persist()
        dot = F.aggregate(
            F.zip_with(F.col("ea"), F.col("eb"), lambda x, y: x * y),
            F.lit(0.0), lambda s, x: s + x,
        )

        def _norm(c):
            return F.sqrt(
                F.aggregate(
                    F.transform(F.col(c), lambda x: x * x),
                    F.lit(0.0), lambda s, x: s + x,
                )
            )

        cos = dot / (_norm("ea") * _norm("eb"))
        dup = pairs.where(cos > F.lit(THRESHOLD))
        dropped = dup.select("vb").distinct()
        agg = dropped.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("vb"), F.lit(0)).alias("s"),
        ).first()
        rows.append(
            (
                scale_x, k, v.count(),
                assigned.select("cluster").distinct().count(),
                pairs.count(), dup.count(),
                int(agg["n"]), int(agg["s"]),
            )
        )
        pairs.unpersist()
    return spark.createDataFrame(
        rows,
        "scale_x long, k long, n_docs long, n_clusters long, "
        "n_cand_pairs long, n_dup_pairs long, n_dropped long, "
        "sum_dropped long",
    ).orderBy("scale_x")
