"""Binary quantization (1-bit) ANN with hamming pre-rank + exact rescore
(r9) — the extreme end of the compressed-index family ({PQ 4 B, SQ8 68 B,
BQ 8 B}/vec): each vector compresses to its CENTERED sign bits (x >
per-dim corpus mean — the standard BQ centering; 64 dims -> 64 bits,
packed as two 32-bit words so the codes build identically in Spark longs
and DuckDB BIGINTs — a single 1<<63 overflows both engines' checked
shifts), candidates are ranked by hamming distance (xor + popcount, pure
JVM bit ops), and the top R=8k candidates are RESCORED with exact cosine
against the full-precision vectors — the two-stage shape production BQ
systems use (bit-sliced scan, then a tiny rescore).

Recall@5 vs exact cosine is measured at 1x AND 2x corpus (the
deterministic perturbed twins of ann_scale). The measured 0.60-0.74 band
is the honest 1-bit result on THIS synthetic corpus (near-isotropic
vectors are BQ's worst case — every bit carries ~1 bit of noise-limited
signal); real embedding corpora with cluster structure sit far higher at
the same byte budget, and the floor test pins 0.5 so a regression in the
pipeline (not the corpus) still fails loudly. For ANISOTROPIC corpora —
plain BQ's other failure mode — ``llm/bq_rotate.py`` (r10) adds a
deterministic Hadamard rotation before sign quantization and pins a 0.7
floor on a deliberately hostile variant.

Plan shape at 100 TB: encoding is one map-side projection (two 32-bit OR
folds per row, no training); stage 1 is a broadcast of N_QUERIES packed
codes against ONE scan of the (vec_id, w1, w2) code table — 8 code bytes
per corpus vector, full-precision vectors are not touched; stage 2 reads
full vectors for ONLY the R candidates per query (a semi-join-sized
fetch). Reference delegates query capability to an external engine
(mod.rs:359-361); this operator is part of the engine side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.llm.ann_scale import (
    _PERTURB_SQL,
    _doubled,
)
from iceberg_catalog_postgres_spark.llm.similarity import (
    N_QUERIES,
    TOP_K,
    _vec,
)
from iceberg_catalog_postgres_spark.registry import load_parallel, register

DIM = 64
_RESCORE = 8 * TOP_K  # hamming candidates per query fed to the exact rescore


def _pack_sql(half: int) -> str:
    """DuckDB: OR-fold CENTERED sign bits (x > per-dim corpus mean, the
    standard BQ centering — raw signs waste bits on dims with off-center
    distributions) of dims [1+32*half, 32*(half+1)] into a BIGINT word
    (shift < 32, overflow-safe in both engines). The mean is rounded to 6
    decimals on both engines so fp drift cannot flip a borderline bit."""
    lo = 32 * half
    return (
        f"list_reduce(list_transform(range(1, 33), i -> CASE WHEN "
        f"e[i + {lo}] > m.mu[i + {lo}] THEN (CAST(1 AS BIGINT) << (i - 1)) ELSE "
        f"CAST(0 AS BIGINT) END), (a, b) -> a | b)"
    )


def _bq_scale_sql(sfx: str, v: str, scale_x: int) -> str:
    cos = (
        f"round(list_sum(list_transform(range(1, {DIM + 1}), i -> q.qe[i] * t.e[i]))"
        f" / (sqrt(list_sum(list_transform(q.qe, x -> x * x)))"
        f" * sqrt(list_sum(list_transform(t.e, x -> x * x)))), 6)"
    )
    return f"""mu_{sfx} AS (
      SELECT list(round(m, 6) ORDER BY dim) AS mu FROM (
        SELECT t2.dim, avg(e[t2.dim]) AS m
        FROM {v} CROSS JOIN range(1, {DIM + 1}) t2(dim)
        GROUP BY t2.dim
      )
    ),
    code_{sfx} AS (
      SELECT vec_id, {_pack_sql(0)} AS w1, {_pack_sql(1)} AS w2
      FROM {v}, mu_{sfx} m
    ),
    qb_{sfx} AS (
      SELECT c.vec_id AS query_id, c.w1 AS qw1, c.w2 AS qw2, t.e AS qe
      FROM code_{sfx} c JOIN {v} t USING (vec_id) WHERE c.vec_id < {N_QUERIES}
    ),
    ham_{sfx} AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             bit_count(xor(q.qw1, c.w1)) + bit_count(xor(q.qw2, c.w2)) AS ham
      FROM qb_{sfx} q, code_{sfx} c WHERE q.query_id != c.vec_id
    ),
    cand_{sfx} AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY ham ASC, neighbor_id ASC) AS rk
        FROM ham_{sfx}
      ) WHERE rk <= {_RESCORE}
    ),
    resc_{sfx} AS (
      SELECT query_id, neighbor_id FROM (
        SELECT cd.query_id, cd.neighbor_id,
               row_number() OVER (PARTITION BY cd.query_id ORDER BY
                 {cos} DESC, cd.neighbor_id ASC) AS rk
        FROM cand_{sfx} cd
        JOIN qb_{sfx} q ON q.query_id = cd.query_id
        JOIN {v} t ON t.vec_id = cd.neighbor_id
      ) WHERE rk <= {TOP_K}
    ),
    bl_{sfx} AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, t.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.query_id ORDER BY
                 {cos} DESC, t.vec_id ASC) AS rk
        FROM qb_{sfx} q, {v} t WHERE q.query_id != t.vec_id
      ) WHERE rk <= {TOP_K}
    ),
    r_{sfx} AS (
      SELECT 'bq' AS method,
             {scale_x} AS scale_x,
             CAST((SELECT count(*) FROM {v}) AS BIGINT) AS corpus_n,
             round(CAST((SELECT count(*) FROM bl_{sfx} b
                         JOIN resc_{sfx} t USING (query_id, neighbor_id)) AS DOUBLE)
                   / {N_QUERIES * TOP_K}, 4) AS recall_at_k,
             {_RESCORE} AS rescored_per_query
    )"""


def _bq_oracle() -> str:
    parts = [
        "WITH v1 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)",
        _PERTURB_SQL,
        _bq_scale_sql("x1", "v1", 1),
        _bq_scale_sql("x2", "v2", 2),
    ]
    return (
        ",\n    ".join(parts)
        + "\n    SELECT * FROM r_x1 UNION ALL SELECT * FROM r_x2 ORDER BY scale_x"
    )


def _pack_col(half: int, mu: list):
    """Spark: fold CENTERED sign bits (x > per-dim mean, rounded to 6
    decimals like the oracle) of one 32-dim half into a long word. Bit i
    is added as 2^i (exact in fp64 for i<=31; the bits are disjoint so
    SUM == OR — pyspark's shiftleft wrapper takes only literal shifts).
    The 64 means travel as plan literals (KBs), never a join."""
    lo = 32 * half
    bits = F.transform(
        F.slice(F.col("e"), lo + 1, 32),
        lambda x, i: F.when(
            x
            > F.element_at(
                F.array(*[F.lit(float(m)) for m in mu[lo : lo + 32]]), i + 1
            ),
            F.pow(F.lit(2.0), i).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda acc, b: acc + b)


@register(
    "sim_ann_bq_hamming_recall",
    oracle=_bq_oracle(),
    tags=("llm", "similarity", "quantization", "bq", "hamming", "evaluation", "scale"),
)
def sim_ann_bq_hamming_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BQ recall@5: sign-bit codes, hamming pre-rank, exact-cosine rescore
    of the top ``_RESCORE`` (= 8k) candidates, at 1x and 2x corpus (see
    module doc)."""
    base = load_parallel(spark, sf_dir, "embeddings").select(
        "vec_id", _vec("embedding").alias("e")
    )
    base = base.select(
        "vec_id", F.transform("e", lambda x: x.cast("double")).alias("e")
    )
    rows = []
    for scale_x in (1, 2):
        v = base if scale_x == 1 else _doubled(base)
        v = v.localCheckpoint(eager=True)
        corpus_n = v.count()
        ckpt = lambda df: df.localCheckpoint(eager=False)  # noqa: E731

        mu_row = v.agg(
            *[
                F.round(F.avg(F.element_at(F.col("e"), i + 1)), 6).alias(f"m{i}")
                for i in range(DIM)
            ]
        ).first()
        mu = [mu_row[f"m{i}"] for i in range(DIM)]
        code = v.select(
            "vec_id", _pack_col(0, mu).alias("w1"), _pack_col(1, mu).alias("w2")
        )
        q = (
            code.filter(F.col("vec_id") < N_QUERIES)
            .join(v, "vec_id")
            .select(
                F.col("vec_id").alias("query_id"),
                F.col("w1").alias("qw1"),
                F.col("w2").alias("qw2"),
                F.col("e").alias("qe"),
            )
        )
        ham = (
            F.broadcast(q.select("query_id", "qw1", "qw2"))
            .crossJoin(code)
            .filter(F.col("query_id") != F.col("vec_id"))
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                (
                    F.bit_count(F.col("qw1").bitwiseXOR(F.col("w1")))
                    + F.bit_count(F.col("qw2").bitwiseXOR(F.col("w2")))
                ).alias("ham"),
            )
        )
        wh = Window.partitionBy("query_id").orderBy(
            F.col("ham").asc(), F.col("neighbor_id").asc()
        )
        cand = ckpt(
            ham.withColumn("rk", F.row_number().over(wh))
            .filter(F.col("rk") <= _RESCORE)
            .select("query_id", "neighbor_id")
        )

        cos = F.round(
            F.aggregate(
                F.zip_with(F.col("qe"), F.col("ne"), lambda a, b: a * b),
                F.lit(0.0),
                lambda s, x: s + x,
            )
            / (
                F.sqrt(
                    F.aggregate(
                        F.transform(F.col("qe"), lambda x: x * x),
                        F.lit(0.0),
                        lambda s, x: s + x,
                    )
                )
                * F.sqrt(
                    F.aggregate(
                        F.transform(F.col("ne"), lambda x: x * x),
                        F.lit(0.0),
                        lambda s, x: s + x,
                    )
                )
            ),
            6,
        )
        ne_df = v.select(F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ne"))
        qe_df = q.select("query_id", "qe")
        wr = Window.partitionBy("query_id").orderBy(
            F.col("c").desc(), F.col("neighbor_id").asc()
        )
        resc = ckpt(
            cand.join(F.broadcast(qe_df), "query_id")
            .join(ne_df, "neighbor_id")
            .select("query_id", "neighbor_id", cos.alias("c"))
            .withColumn("rk", F.row_number().over(wr))
            .filter(F.col("rk") <= TOP_K)
            .select("query_id", "neighbor_id")
        )
        brute = ckpt(
            F.broadcast(qe_df)
            .join(ne_df, F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id", cos.alias("c"))
            .withColumn("rk", F.row_number().over(wr))
            .filter(F.col("rk") <= TOP_K)
            .select("query_id", "neighbor_id")
        )
        hits = brute.join(resc, ["query_id", "neighbor_id"]).count()
        rows.append(
            (
                "bq",
                scale_x,
                int(corpus_n),
                round(hits / (N_QUERIES * TOP_K), 4),
                _RESCORE,
            )
        )
    return spark.createDataFrame(
        rows,
        "method string, scale_x int, corpus_n long, recall_at_k double, "
        "rescored_per_query int",
    ).orderBy("scale_x")
