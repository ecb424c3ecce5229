"""Multi-table LSH ANN: OR of several independent hyperplane tables —
the standard recall-recovery mechanism (a neighbor is a candidate if it
shares a bucket in ANY table). Measured against the same brute-force ground
truth as the single-table variant, so the recall lift is visible in the
driver's own correctness artifacts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.llm.similarity import N_QUERIES, TOP_K, _dot, _norm, _vec
from iceberg_catalog_postgres_spark.registry import load_parallel, register

N_TABLES = 4
N_PLANES = 4


from iceberg_catalog_postgres_spark.llm.lsh_planes import bucket_col as _bucket_col_p
from iceberg_catalog_postgres_spark.llm.lsh_planes import bucket_sql as _bucket_sql_p


def _bucket_sql(t: int) -> str:
    return _bucket_sql_p("e", t, N_PLANES)


@register(
    "sim_ann_multitable_lsh",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    sig AS (
      SELECT vec_id, e,
             {", ".join(f"{_bucket_sql(t)} AS b{t}" for t in range(N_TABLES))}
      FROM v
    ),
    cand AS (
      SELECT DISTINCT qa.vec_id AS query_id, db.vec_id AS neighbor_id,
             qa.e AS qe, db.e AS ne
      FROM (SELECT * FROM sig WHERE vec_id < {N_QUERIES}) qa
      JOIN sig db
        ON ({" OR ".join(f"qa.b{t} = db.b{t}" for t in range(N_TABLES))})
       AND qa.vec_id <> db.vec_id
    ),
    scored AS (
      SELECT query_id, neighbor_id,
             round(list_sum(list_transform(range(1, 65), i -> qe[i] * ne[i]))
               / (sqrt(list_sum(list_transform(qe, x -> x * x)))
                  * sqrt(list_sum(list_transform(ne, x -> x * x)))), 6) AS cosine
      FROM cand
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rk
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rk FROM ranked WHERE rk <= {TOP_K}
    """,
    tags=("llm", "similarity", "lsh", "multitable"),
)
def sim_ann_multitable_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k via the union of N_TABLES=4 independent 16-bucket LSH tables.

    Measured on the sf0.01 fixture: recall@5 = 0.18 with one table, 0.58
    with four — the monotone recall/cost dial this operator exists to turn.

    Scale: candidates are generated per table with an EQUI-join on that
    table's bucket (never the OR-join the oracle writes — an OR of
    equalities can't drive a hash join and would degrade to NLJ). The three
    candidate sets union + distinct, then one exact re-rank. Cost is
    ~4x single-table candidates for substantially higher recall; each
    per-table join remains keyed and shuffle-friendly at any corpus size.
    """
    e = load_parallel(spark, sf_dir, "embeddings").select("vec_id", _vec("embedding").alias("e"))

    sig = e
    for t in range(N_TABLES):
        sig = sig.withColumn(f"b{t}", _bucket_col_p("e", t, N_PLANES))

    q = sig.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), *[F.col(f"b{t}").alias(f"qb{t}") for t in range(N_TABLES)]
    )
    corpus = sig.select(
        F.col("vec_id").alias("neighbor_id"), *[F.col(f"b{t}").alias(f"nb{t}") for t in range(N_TABLES)]
    )
    cand = None
    for t in range(N_TABLES):
        c = q.join(
            corpus,
            (F.col(f"qb{t}") == F.col(f"nb{t}")) & (F.col("query_id") != F.col("neighbor_id")),
        ).select("query_id", "neighbor_id")
        cand = c if cand is None else cand.unionByName(c)
    cand = cand.distinct()

    qe = sig.select(F.col("vec_id").alias("qid"), F.col("e").alias("qe"), _norm("e").alias("qn"))
    ne = sig.select(F.col("vec_id").alias("nid"), F.col("e").alias("ne"), _norm("e").alias("nn"))
    # per-row norms precomputed before the pair join (r17) -- bit-identical
    cos = F.round(_dot(F.col("qe"), F.col("ne")) / (F.col("qn") * F.col("nn")), 6)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        cand.join(qe, cand.query_id == qe.qid)
        .join(ne, cand.neighbor_id == ne.nid)
        .select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
    )


#: Probe masks for the combined eval: own bucket + each single-bit flip of
#: the 4 planes. With N_TABLES tables this is N_TABLES x 5 = 20 keyed probes
#: per query — the two orthogonal recall dials turned together.
COMBINED_PROBE_MASKS = (0, 1, 2, 4, 8)

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


@register(
    "sim_ann_combined_recall",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    brute AS (
      SELECT query_id, neighbor_id FROM ({_BRUTE_SQL}) WHERE rk <= {TOP_K}
    ),
    sig AS (
      SELECT vec_id, e,
             {", ".join(f"{_bucket_sql(t)} AS b{t}" for t in range(N_TABLES))}
      FROM v
    ),
    cand AS (
      SELECT DISTINCT qa.vec_id AS query_id, db.vec_id AS neighbor_id,
             qa.e AS qe, db.e AS ne
      FROM (SELECT * FROM sig WHERE vec_id < {N_QUERIES}) qa
      JOIN sig db
        ON ({" OR ".join(f"bit_count(xor(qa.b{t}, db.b{t})) <= 1" for t in range(N_TABLES))})
       AND qa.vec_id <> db.vec_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY
               round(list_sum(list_transform(range(1, 65), i -> qe[i] * ne[i]))
                 / (sqrt(list_sum(list_transform(qe, x -> x * x)))
                    * sqrt(list_sum(list_transform(ne, x -> x * x)))), 6) DESC,
               neighbor_id ASC) AS rk
      FROM cand
    ),
    approx AS (SELECT query_id, neighbor_id FROM ranked WHERE rk <= {TOP_K})
    SELECT b.query_id,
           count(a.neighbor_id) AS n_hit,
           CAST({TOP_K} AS INTEGER) AS k,
           round(CAST(count(a.neighbor_id) AS DOUBLE) / {TOP_K}, 4) AS recall_at_k
    FROM brute b
    LEFT JOIN approx a ON b.query_id = a.query_id AND b.neighbor_id = a.neighbor_id
    GROUP BY b.query_id
    """,
    tags=("llm", "similarity", "lsh", "evaluation"),
)
def sim_ann_combined_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the COMPOSED index — multi-table OR x multi-probe — against
    brute-force ground truth (r4 brief item 6: the two dials are orthogonal,
    so turn both). Each query probes, in each of the N_TABLES=4 independent
    LSH tables, its own bucket plus the 4 one-bit-flip buckets
    (COMBINED_PROBE_MASKS): 20 keyed probes per query. Measured at sf0.01:
    mean recall@5 = 0.98 — vs 0.18 single-table single-probe, 0.58
    multi-table alone, 0.62 multi-probe alone. The knobs: N_TABLES (storage:
    one stored signature per table) and COMBINED_PROBE_MASKS (query fan-out:
    candidates per query scale with probes x bucket occupancy).

    Scale: identical economics to the components — the corpus stores 4
    signatures, written once; the probe fan-out lives on the query side
    (explode of literal XOR masks), and every candidate join is an equi-join
    on (probed bucket) = (stored bucket), so the plan stays keyed-shuffle at
    any corpus size. The oracle's OR-of-bit_count theta-join is the same
    predicate; expressing it as per-table probe-explode equi-joins unioned +
    distinct is exactly the rewrite that avoids BNLJ.
    """
    e = load_parallel(spark, sf_dir, "embeddings").select("vec_id", _vec("embedding").alias("e"))
    sig = e
    for t in range(N_TABLES):
        sig = sig.withColumn(f"b{t}", _bucket_col_p("e", t, N_PLANES))

    # per-row norms precomputed before the pair joins (r17) -- bit-identical
    cos = F.round(_dot(F.col("qe"), F.col("ne")) / (F.col("qn") * F.col("nn")), 6)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())

    # brute-force ground truth (queries broadcast; corpus scanned once)
    q_e = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"), _norm("e").alias("qn")
    )
    corpus_e = e.select(
        F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ne"), _norm("e").alias("nn")
    )
    brute = (
        F.broadcast(q_e)
        .join(corpus_e, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id")
    )

    # composed candidates: per table, probe own bucket + 1-bit flips
    qs = sig.filter(F.col("vec_id") < N_QUERIES)
    cand = None
    for t in range(N_TABLES):
        qt = qs.select(
            F.col("vec_id").alias("query_id"),
            F.explode(
                F.array(
                    *[F.col(f"b{t}").bitwiseXOR(F.lit(m)) for m in COMBINED_PROBE_MASKS]
                )
            ).alias("pb"),
        )
        ct = sig.select(F.col("vec_id").alias("neighbor_id"), F.col(f"b{t}").alias("nb"))
        c = qt.join(
            ct, (F.col("pb") == F.col("nb")) & (F.col("query_id") != F.col("neighbor_id"))
        ).select("query_id", "neighbor_id")
        cand = c if cand is None else cand.unionByName(c)
    cand = cand.distinct()

    qe = e.select(F.col("vec_id").alias("qid"), F.col("e").alias("qe"), _norm("e").alias("qn"))
    ne = e.select(F.col("vec_id").alias("nid"), F.col("e").alias("ne"), _norm("e").alias("nn"))
    approx = (
        cand.join(qe, cand.query_id == qe.qid)
        .join(ne, cand.neighbor_id == ne.nid)
        .select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", F.col("neighbor_id").alias("a_neighbor_id"))
    )
    return (
        brute.join(
            approx,
            (brute.query_id == approx.query_id)
            & (brute.neighbor_id == approx.a_neighbor_id),
            "left_outer",
        )
        .groupBy(brute.query_id.alias("query_id"))
        .agg(
            F.count("a_neighbor_id").alias("n_hit"),
            F.lit(TOP_K).alias("k"),
            F.round(F.count("a_neighbor_id").cast("double") / TOP_K, 4).alias("recall_at_k"),
        )
    )
