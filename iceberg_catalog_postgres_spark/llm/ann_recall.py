"""ANN quality evaluation: recall of the LSH-bucketed search against the
brute-force ground truth, per query and overall — the metric that decides
how many hash tables / probes a production ANN deployment needs.

Both rankings and the recall join are deterministic (fp64 folds, rounded
tie-breaks), so even this evaluation is oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.llm.similarity import N_QUERIES, TOP_K, _dot, _norm, _vec
from iceberg_catalog_postgres_spark.registry import load_parallel, register

_BRUTE_SQL = f"""
      SELECT qa.vec_id AS query_id, db.vec_id AS neighbor_id,
             row_number() OVER (
               PARTITION BY qa.vec_id
               ORDER BY round(list_sum(list_transform(range(1, 65), i -> qa.e[i] * db.e[i]))
                 / (sqrt(list_sum(list_transform(qa.e, x -> x * x)))
                    * sqrt(list_sum(list_transform(db.e, x -> x * x)))), 6) DESC,
               db.vec_id ASC) AS rk
      FROM (SELECT * FROM v WHERE vec_id < {N_QUERIES}) qa
      JOIN v db ON qa.vec_id <> db.vec_id
"""


from iceberg_catalog_postgres_spark.llm.lsh_planes import bucket_col as _bucket_col
from iceberg_catalog_postgres_spark.llm.lsh_planes import bucket_sql as _bucket_sql


@register(
    "sim_ann_recall_eval",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    brute AS (
      SELECT query_id, neighbor_id FROM ({_BRUTE_SQL}) WHERE rk <= {TOP_K}
    ),
    sig AS (
      SELECT vec_id, e,
             {_bucket_sql("e", 0, 4)} AS bucket
      FROM v
    ),
    lsh AS (
      SELECT query_id, neighbor_id FROM (
        SELECT qa.vec_id AS query_id, db.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY qa.vec_id
                 ORDER BY round(list_sum(list_transform(range(1, 65), i -> qa.e[i] * db.e[i]))
                   / (sqrt(list_sum(list_transform(qa.e, x -> x * x)))
                      * sqrt(list_sum(list_transform(db.e, x -> x * x)))), 6) DESC,
                 db.vec_id ASC) AS rk
        FROM (SELECT * FROM sig WHERE vec_id < {N_QUERIES}) qa
        JOIN sig db ON qa.bucket = db.bucket AND qa.vec_id <> db.vec_id
      ) WHERE rk <= {TOP_K}
    )
    SELECT b.query_id,
           count(l.neighbor_id) AS n_hit,
           {TOP_K} AS k,
           round(CAST(count(l.neighbor_id) AS DOUBLE) / {TOP_K}, 4) AS recall_at_k
    FROM brute b
    LEFT JOIN lsh l ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
    GROUP BY b.query_id
    """,
    tags=("llm", "similarity", "evaluation"),
)
def sim_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@k of the 16-bucket sign-LSH search vs brute force, per query.

    Scale: the evaluation itself follows ANN economics — brute force runs
    once over a SAMPLE of queries (here: the 10 query vectors) to calibrate,
    never over the full corpus. The recall number directly drives the
    production knob (more tables / multi-probe) documented in
    ``sim_ann_lsh_bucketed``.
    """
    e = load_parallel(spark, sf_dir, "embeddings").select("vec_id", _vec("embedding").alias("e"))

    def topk(corpus_with_bucket: bool) -> DataFrame:
        # per-row norms precomputed before the pair join (r17) -- bit-identical
        if corpus_with_bucket:
            sig = e.withColumn("bucket", _bucket_col("e", 0, 4))
            q = sig.filter(F.col("vec_id") < N_QUERIES).select(
                F.col("vec_id").alias("query_id"),
                F.col("e").alias("qe"),
                F.col("bucket").alias("qb"),
                _norm("e").alias("qn"),
            )
            corpus = sig.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("e").alias("ne"),
                F.col("bucket").alias("nb"),
                _norm("e").alias("nn"),
            )
            joined = q.join(
                corpus, (F.col("qb") == F.col("nb")) & (F.col("query_id") != F.col("neighbor_id"))
            )
        else:
            q = e.filter(F.col("vec_id") < N_QUERIES).select(
                F.col("vec_id").alias("query_id"), F.col("e").alias("qe"), _norm("e").alias("qn")
            )
            corpus = e.select(
                F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ne"), _norm("e").alias("nn")
            )
            joined = F.broadcast(q).join(corpus, F.col("query_id") != F.col("neighbor_id"))

        cos = F.round(_dot(F.col("qe"), F.col("ne")) / (F.col("qn") * F.col("nn")), 6)
        w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
        return (
            joined.select("query_id", "neighbor_id", cos.alias("cosine"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= TOP_K)
            .select("query_id", "neighbor_id")
        )

    brute = topk(corpus_with_bucket=False)
    lsh = topk(corpus_with_bucket=True).withColumnRenamed("neighbor_id", "lsh_neighbor_id")
    return (
        brute.join(
            lsh,
            (brute.query_id == lsh.query_id) & (brute.neighbor_id == lsh.lsh_neighbor_id),
            "left_outer",
        )
        .groupBy(brute.query_id.alias("query_id"))
        .agg(
            F.count("lsh_neighbor_id").alias("n_hit"),
            F.lit(TOP_K).alias("k"),
            F.round(F.count("lsh_neighbor_id").cast("double") / TOP_K, 4).alias("recall_at_k"),
        )
    )


_TRUNC_DIM = 16

_TRUNC_SQL = f"""
      SELECT qa.vec_id AS query_id, db.vec_id AS neighbor_id,
             row_number() OVER (
               PARTITION BY qa.vec_id
               ORDER BY round(list_sum(list_transform(range(1, {_TRUNC_DIM + 1}), i -> qa.e[i] * db.e[i]))
                 / (sqrt(list_sum(list_transform(qa.e[1:{_TRUNC_DIM}], x -> x * x)))
                    * sqrt(list_sum(list_transform(db.e[1:{_TRUNC_DIM}], x -> x * x)))), 6) DESC,
               db.vec_id ASC) AS rk
      FROM (SELECT * FROM v WHERE vec_id < {N_QUERIES}) qa
      JOIN v db ON qa.vec_id <> db.vec_id
"""


@register(
    "embed_truncate_recall",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    brute AS (
      SELECT query_id, neighbor_id FROM ({_BRUTE_SQL}) WHERE rk <= {TOP_K}
    ),
    trunc AS (
      SELECT query_id, neighbor_id FROM ({_TRUNC_SQL}) WHERE rk <= {TOP_K}
    )
    SELECT b.query_id,
           count(t.neighbor_id) AS n_hit,
           {TOP_K} AS k,
           round(CAST(count(t.neighbor_id) AS DOUBLE) / {TOP_K}, 4) AS recall_at_k
    FROM brute b
    LEFT JOIN trunc t ON b.query_id = t.query_id AND b.neighbor_id = t.neighbor_id
    GROUP BY b.query_id
    """,
    tags=("llm", "similarity", "evaluation"),
)
def embed_truncate_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-truncation recall: top-k under the first {D} of 64 dims vs
    the full-dim ground truth — the ablation a training pipeline runs before
    committing to matryoshka-style truncated embeddings (store/search fewer
    dims, re-rank survivors at full width). recall@k per query quantifies
    what the 4x footprint cut costs.

    Scale: same economics as ``sim_ann_recall_eval`` — both rankings run
    over the sampled query set only, never all-pairs over the corpus; the
    truncated ranking reads {D}/64 of each vector (at rest that is a
    column-pruned scan when dims are stored as split prefix columns).
    """
    e = load_parallel(spark, sf_dir, "embeddings").select("vec_id", _vec("embedding").alias("e"))
    # _norm builds the fold as one parsed SQL expression (r18; shared
    # helper renders slice(e, 1, D) as SQL text, lambda fallback otherwise)
    norm = _norm

    def brute_topk(prefix_dim: int | None) -> DataFrame:
        # slice (a per-row op) and the norm of the slice are both computed
        # BEFORE the pair join (r17) -- bit-identical, one fold per pair
        sl = (lambda c: F.slice(c, 1, prefix_dim)) if prefix_dim is not None else (lambda c: c)
        q = e.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            sl(F.col("e")).alias("qe"),
            norm(sl(F.col("e"))).alias("qn"),
        )
        corpus = e.select(
            F.col("vec_id").alias("neighbor_id"),
            sl(F.col("e")).alias("ne"),
            norm(sl(F.col("e"))).alias("nn"),
        )
        cos = F.round(_dot(F.col("qe"), F.col("ne")) / (F.col("qn") * F.col("nn")), 6)
        w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
        return (
            F.broadcast(q)
            .join(corpus, F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id", cos.alias("cosine"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= TOP_K)
            .select("query_id", "neighbor_id")
        )

    brute = brute_topk(None)
    trunc = brute_topk(_TRUNC_DIM).withColumnRenamed("neighbor_id", "t_neighbor_id")
    return (
        brute.join(
            trunc,
            (brute.query_id == trunc.query_id) & (brute.neighbor_id == trunc.t_neighbor_id),
            "left_outer",
        )
        .groupBy(brute.query_id.alias("query_id"))
        .agg(
            F.count("t_neighbor_id").alias("n_hit"),
            F.lit(TOP_K).alias("k"),
            F.round(F.count("t_neighbor_id").cast("double") / TOP_K, 4).alias("recall_at_k"),
        )
    )


embed_truncate_recall.__doc__ = embed_truncate_recall.__doc__.replace("{D}", str(_TRUNC_DIM))


_MULTIPROBE_SQL = f"""
      SELECT qa.vec_id AS query_id, db.vec_id AS neighbor_id,
             row_number() OVER (
               PARTITION BY qa.vec_id
               ORDER BY round(list_sum(list_transform(range(1, 65), i -> qa.e[i] * db.e[i]))
                 / (sqrt(list_sum(list_transform(qa.e, x -> x * x)))
                    * sqrt(list_sum(list_transform(db.e, x -> x * x)))), 6) DESC,
               db.vec_id ASC) AS rk
      FROM (SELECT * FROM sig WHERE vec_id < {N_QUERIES}) qa
      JOIN sig db ON bit_count(xor(qa.bucket, db.bucket)) <= 1 AND qa.vec_id <> db.vec_id
"""


@register(
    "sim_ann_multiprobe_recall",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    brute AS (
      SELECT query_id, neighbor_id FROM ({_BRUTE_SQL}) WHERE rk <= {TOP_K}
    ),
    sig AS (
      SELECT vec_id, e,
             {_bucket_sql("e", 0, 4)} AS bucket
      FROM v
    ),
    single AS (
      SELECT query_id, neighbor_id FROM (
        SELECT qa.vec_id AS query_id, db.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY qa.vec_id
                 ORDER BY round(list_sum(list_transform(range(1, 65), i -> qa.e[i] * db.e[i]))
                   / (sqrt(list_sum(list_transform(qa.e, x -> x * x)))
                      * sqrt(list_sum(list_transform(db.e, x -> x * x)))), 6) DESC,
                 db.vec_id ASC) AS rk
        FROM (SELECT * FROM sig WHERE vec_id < {N_QUERIES}) qa
        JOIN sig db ON qa.bucket = db.bucket AND qa.vec_id <> db.vec_id
      ) WHERE rk <= {TOP_K}
    ),
    multi AS (
      SELECT query_id, neighbor_id FROM ({_MULTIPROBE_SQL}) WHERE rk <= {TOP_K}
    )
    SELECT b.query_id,
           count(s.neighbor_id) AS n_hit_single,
           count(mu.neighbor_id) AS n_hit_multi,
           round(CAST(count(s.neighbor_id) AS DOUBLE) / {TOP_K}, 4) AS recall_single,
           round(CAST(count(mu.neighbor_id) AS DOUBLE) / {TOP_K}, 4) AS recall_multi
    FROM brute b
    LEFT JOIN single s ON b.query_id = s.query_id AND b.neighbor_id = s.neighbor_id
    LEFT JOIN multi mu ON b.query_id = mu.query_id AND b.neighbor_id = mu.neighbor_id
    GROUP BY b.query_id
    """,
    tags=("llm", "similarity", "evaluation"),
)
def sim_ann_multiprobe_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Side-by-side recall@k of single-probe vs multi-probe sign-LSH against
    the brute-force ground truth — the measurement that justifies
    ``sim_ann_lsh_multiprobe``'s extra 4 probes (its docstring CLAIMS probing
    1-bit-flip buckets recovers recall; this query measures it per query, so
    the claim ships with its evidence the way the multi-table variant's
    0.18->0.58 number does).

    Scale: same evaluation economics as ``sim_ann_recall_eval`` — all three
    rankings run over the sampled query set; the corpus is hashed once and
    shared by both probe strategies.
    """
    from iceberg_catalog_postgres_spark.llm.similarity import _PROBE_MASKS

    e = load_parallel(spark, sf_dir, "embeddings").select("vec_id", _vec("embedding").alias("e"))
    sig = e.withColumn("bucket", _bucket_col("e", 0, 4))
    # per-row norms precomputed before the pair joins (r17) -- bit-identical
    corpus = sig.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("e").alias("ne"),
        F.col("bucket").alias("nb"),
        _norm("e").alias("nn"),
    )

    def topk(mode: str) -> DataFrame:
        if mode == "brute":
            q = e.filter(F.col("vec_id") < N_QUERIES).select(
                F.col("vec_id").alias("query_id"), F.col("e").alias("qe"), _norm("e").alias("qn")
            )
            joined = F.broadcast(q).join(
                corpus.drop("nb"), F.col("query_id") != F.col("neighbor_id")
            )
        elif mode == "single":
            q = sig.filter(F.col("vec_id") < N_QUERIES).select(
                F.col("vec_id").alias("query_id"),
                F.col("e").alias("qe"),
                F.col("bucket").alias("pb"),
                _norm("e").alias("qn"),
            )
            joined = q.join(
                corpus, (F.col("pb") == F.col("nb")) & (F.col("query_id") != F.col("neighbor_id"))
            )
        else:  # multi
            q = sig.filter(F.col("vec_id") < N_QUERIES).select(
                F.col("vec_id").alias("query_id"),
                F.col("e").alias("qe"),
                _norm("e").alias("qn"),
                F.explode(
                    F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in _PROBE_MASKS])
                ).alias("pb"),
            )
            joined = q.join(
                corpus, (F.col("pb") == F.col("nb")) & (F.col("query_id") != F.col("neighbor_id"))
            )
        cos = F.round(_dot(F.col("qe"), F.col("ne")) / (F.col("qn") * F.col("nn")), 6)
        w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
        return (
            joined.select("query_id", "neighbor_id", cos.alias("cosine"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= TOP_K)
            .select("query_id", "neighbor_id")
        )

    brute = topk("brute")
    single = topk("single").withColumnRenamed("neighbor_id", "s_neighbor_id")
    multi = topk("multi").withColumnRenamed("neighbor_id", "m_neighbor_id")
    joined = brute.join(
        single,
        (brute.query_id == single.query_id) & (brute.neighbor_id == single.s_neighbor_id),
        "left_outer",
    ).join(
        multi,
        (brute.query_id == multi.query_id) & (brute.neighbor_id == multi.m_neighbor_id),
        "left_outer",
    )
    return joined.groupBy(brute.query_id.alias("query_id")).agg(
        F.count("s_neighbor_id").alias("n_hit_single"),
        F.count("m_neighbor_id").alias("n_hit_multi"),
        F.round(F.count("s_neighbor_id").cast("double") / TOP_K, 4).alias("recall_single"),
        F.round(F.count("m_neighbor_id").cast("double") / TOP_K, 4).alias("recall_multi"),
    )
