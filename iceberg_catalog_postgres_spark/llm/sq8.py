"""SQ8 scalar-quantized ADC search (r8, VERDICT item 3) — the cheapest
production compressed-index variant, completing the quantization family
(int8 health check -> PQ -> IVFPQ -> IVFADC -> SQ8).

Per-vector symmetric int8: scale = max|x| (absmax), code_i =
round(x_i / scale * 127). ADC ranks by L2 against the DEQUANTIZED corpus —
the query stays full-precision, each corpus vector is reconstructed
on the fly from its 64 int8 codes + one float scale (68 B/vec vs the
PQ M=4 codes' ~4 B/vec: 16x more memory for near-exact recall and zero
codebook training — the trade production systems take whenever the
quantized index still fits in RAM). Recall@5 is measured at BOTH corpus
scales (1x and the deterministic perturbed-twin 2x of ann_scale), judged
against exact L2 per scale.

Plan shape at 100 TB: encoding is one map-side projection (no shuffle, no
training pass — unlike PQ there is no codebook build); search is the
broadcast of N_QUERIES full-precision rows against ONE scan of the
code table (codes + scale only — full-precision corpus vectors are read
exactly once, at encode time, and never again). Reference delegates all
query capability to an external engine (mod.rs:359-361); this operator is
part of the engine side of that contract.
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


def _sq8_scale_sql(sfx: str, v: str) -> str:
    """CTE chain for one corpus scale: encode -> ADC estimate -> top-k ->
    exact-L2 ground truth -> one summary row."""
    return f"""c_{sfx} AS (
      SELECT vec_id, scale, list_transform(e, x -> round(x / scale * 127.0)) AS c
      FROM (SELECT vec_id,
                   greatest(list_max(list_transform(e, x -> abs(x))), 1e-12) AS scale,
                   e
            FROM {v})
    ),
    q_{sfx} AS (SELECT vec_id AS query_id, e AS qe FROM {v} WHERE vec_id < {N_QUERIES}),
    est_{sfx} AS (
      SELECT query_id, c.vec_id AS neighbor_id,
             round(list_sum(list_transform(range(1, {DIM + 1}),
               i -> (qe[i] - c.c[i] * c.scale / 127.0)
                  * (qe[i] - c.c[i] * c.scale / 127.0))), 6) AS est
      FROM q_{sfx}, c_{sfx} c
      WHERE query_id != c.vec_id
    ),
    top_{sfx} AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY est ASC, neighbor_id ASC) AS rk
        FROM est_{sfx}
      ) WHERE rk <= {TOP_K}
    ),
    bl_{sfx} AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, t.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.query_id ORDER BY
                 round(list_sum(list_transform(range(1, {DIM + 1}),
                   i -> (q.qe[i] - t.e[i]) * (q.qe[i] - t.e[i]))), 6) ASC,
                 t.vec_id ASC) AS rk
        FROM q_{sfx} q, {v} t WHERE q.query_id != t.vec_id
      ) WHERE rk <= {TOP_K}
    ),
    r_{sfx} AS (
      SELECT 'sq8' AS method,
             {sfx[1:]} AS scale_x,
             CAST((SELECT count(*) FROM {v}) AS BIGINT) AS corpus_n,
             round(CAST((SELECT count(*) FROM bl_{sfx} b
                         JOIN top_{sfx} t USING (query_id, neighbor_id)) AS DOUBLE)
                   / {N_QUERIES * TOP_K}, 4) AS recall_at_k,
             {DIM + 4} AS bytes_per_vec
    )"""


def _sq8_oracle() -> str:
    parts = [
        "WITH v1 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)",
        _PERTURB_SQL,
        _sq8_scale_sql("x1", "v1"),
        _sq8_scale_sql("x2", "v2"),
    ]
    return (
        ",\n    ".join(parts)
        + "\n    SELECT * FROM r_x1 UNION ALL SELECT * FROM r_x2 ORDER BY scale_x"
    )


@register(
    "sim_ann_sq8_adc_recall",
    oracle=_sq8_oracle(),
    tags=("llm", "similarity", "quantization", "sq8", "evaluation", "scale"),
)
def sim_ann_sq8_adc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 ADC recall@5 vs exact L2 at 1x and 2x corpus (see module doc)."""
    base = load_parallel(spark, sf_dir, "embeddings").select(
        "vec_id", _vec("embedding").alias("e")
    )
    base = base.select(
        "vec_id", F.transform("e", lambda x: x.cast("double")).alias("e")
    )
    rows = []
    for scale_x in (1, 2):
        v = base if scale_x == 1 else _doubled(base)
        # iterative-lineage cut, same rationale as ann_scale: materialize the
        # (tiny) corpus once per scale so downstream plans join a leaf
        v = v.localCheckpoint(eager=True)
        corpus_n = v.count()

        scale = F.greatest(
            F.array_max(F.transform("e", lambda x: F.abs(x))), F.lit(1e-12)
        )
        enc = v.select("vec_id", scale.alias("scale"), "e").select(
            "vec_id",
            "scale",
            F.transform(
                "e", lambda x: F.round(x / F.col("scale") * 127.0, 0)
            ).alias("c"),
        )
        q = v.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
        )
        est = (
            F.broadcast(q)
            .crossJoin(enc)
            .filter(F.col("query_id") != F.col("vec_id"))
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                F.round(
                    F.aggregate(
                        F.zip_with(
                            F.col("qe"),
                            F.col("c"),
                            lambda a, b: (a - b * F.col("scale") / 127.0)
                            * (a - b * F.col("scale") / 127.0),
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ),
                    6,
                ).alias("est"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("est").asc(), F.col("neighbor_id").asc()
        )
        top = (
            est.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= TOP_K)
            .select("query_id", "neighbor_id")
            .localCheckpoint(eager=False)
        )
        t = v.select(F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ne"))
        l2 = F.round(
            F.aggregate(
                F.zip_with(F.col("qe"), F.col("ne"), lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        )
        wb = Window.partitionBy("query_id").orderBy(
            F.col("l2").asc(), F.col("neighbor_id").asc()
        )
        brute = (
            F.broadcast(q)
            .join(t, F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id", l2.alias("l2"))
            .withColumn("rk", F.row_number().over(wb))
            .filter(F.col("rk") <= TOP_K)
            .select("query_id", "neighbor_id")
            .localCheckpoint(eager=False)
        )
        hits = brute.join(top, ["query_id", "neighbor_id"]).count()
        rows.append(
            (
                "sq8",
                scale_x,
                int(corpus_n),
                round(hits / (N_QUERIES * TOP_K), 4),
                DIM + 4,
            )
        )
    return spark.createDataFrame(
        rows,
        "method string, scale_x int, corpus_n long, recall_at_k double, "
        "bytes_per_vec int",
    ).orderBy("scale_x")


# ---------------------------------------------------------------------------
# IVF + SQ8 (r9, VERDICT stretch): complete the {flat,IVF} x {PQ,SQ8} matrix
# ---------------------------------------------------------------------------

_NPROBE = 2
_IVFSQ8_CONFIGS = [(1, 8), (2, 16)]  # (scale_x, ivf_k) — granularity doubles


def _ivfsq8_scale_sql(sfx: str, v: str, k: int, scale_x: int) -> str:
    """IVF candidate CTEs (same deterministic 2-update Lloyd's unroll as
    ann_scale) + SQ8 ADC ranking restricted to the candidates + exact-L2
    ground truth + one summary row."""
    from iceberg_catalog_postgres_spark.llm.ann_scale import _ivf_dist, _ivf_iter

    return f"""ci_{sfx}_0 AS (
      SELECT CAST(vec_id AS INT) AS cluster, e AS c FROM {v} WHERE vec_id < {k}
    ),
    {_ivf_iter(sfx, 1, f"ci_{sfx}_0", v)},
    {_ivf_iter(sfx, 2, f"ci_{sfx}_1", v)},
    di_{sfx}_3 AS (
      SELECT t.vec_id, c.cluster, {_ivf_dist()} AS dist FROM {v} t, ci_{sfx}_2 c
    ),
    ai_{sfx}_3 AS (
      SELECT vec_id, cluster FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
          ORDER BY dist ASC, cluster ASC) AS rn
        FROM di_{sfx}_3
      ) WHERE rn = 1
    ),
    probes_{sfx} AS (
      SELECT vec_id AS query_id, cluster FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
          ORDER BY dist ASC, cluster ASC) AS rn
        FROM di_{sfx}_3 WHERE vec_id < {N_QUERIES}
      ) WHERE rn <= {_NPROBE}
    ),
    cand_{sfx} AS (
      SELECT p.query_id, a.vec_id AS neighbor_id
      FROM probes_{sfx} p
      JOIN ai_{sfx}_3 a ON a.cluster = p.cluster AND a.vec_id <> p.query_id
    ),
    enc_{sfx} AS (
      SELECT vec_id, scale, list_transform(e, x -> round(x / scale * 127.0)) AS c
      FROM (SELECT vec_id,
                   greatest(list_max(list_transform(e, x -> abs(x))), 1e-12) AS scale,
                   e
            FROM {v})
    ),
    qs_{sfx} AS (SELECT vec_id AS query_id, e AS qe FROM {v} WHERE vec_id < {N_QUERIES}),
    est_{sfx} AS (
      SELECT cd.query_id, cd.neighbor_id,
             round(list_sum(list_transform(range(1, {DIM + 1}),
               i -> (q.qe[i] - en.c[i] * en.scale / 127.0)
                  * (q.qe[i] - en.c[i] * en.scale / 127.0))), 6) AS est
      FROM cand_{sfx} cd
      JOIN qs_{sfx} q ON q.query_id = cd.query_id
      JOIN enc_{sfx} en ON en.vec_id = cd.neighbor_id
    ),
    topq_{sfx} AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY est ASC, neighbor_id ASC) AS rk
        FROM est_{sfx}
      ) WHERE rk <= {TOP_K}
    ),
    bl2_{sfx} AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, t.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.query_id ORDER BY
                 round(list_sum(list_transform(range(1, {DIM + 1}),
                   i -> (q.qe[i] - t.e[i]) * (q.qe[i] - t.e[i]))), 6) ASC,
                 t.vec_id ASC) AS rk
        FROM qs_{sfx} q, {v} t WHERE q.query_id != t.vec_id
      ) WHERE rk <= {TOP_K}
    ),
    r_{sfx} AS (
      SELECT 'ivfsq8' AS method,
             {scale_x} AS scale_x,
             CAST((SELECT count(*) FROM {v}) AS BIGINT) AS corpus_n,
             round(CAST((SELECT count(*) FROM bl2_{sfx} b
                         JOIN topq_{sfx} t USING (query_id, neighbor_id)) AS DOUBLE)
                   / {N_QUERIES * TOP_K}, 4) AS recall_at_k,
             round(CAST((SELECT count(*) FROM cand_{sfx}) AS DOUBLE)
                   / {N_QUERIES}, 4) AS avg_candidates
    )"""


def _ivfsq8_oracle() -> str:
    parts = [
        "WITH v1 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)",
        _PERTURB_SQL,
        _ivfsq8_scale_sql("x1", "v1", _IVFSQ8_CONFIGS[0][1], 1),
        _ivfsq8_scale_sql("x2", "v2", _IVFSQ8_CONFIGS[1][1], 2),
    ]
    return (
        ",\n    ".join(parts)
        + "\n    SELECT * FROM r_x1 UNION ALL SELECT * FROM r_x2 ORDER BY scale_x"
    )


@register(
    "sim_ann_ivfsq8_recall",
    oracle=_ivfsq8_oracle(),
    tags=("llm", "similarity", "quantization", "sq8", "ivf", "evaluation", "scale"),
)
def sim_ann_ivfsq8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + SQ8 composition (r9): the flat SQ8 scan partitioned by the IVF
    coarse quantizer — probe the _NPROBE nearest centroids, rank ONLY the
    probed clusters' members by SQ8 ADC estimate, judge against exact L2
    at 1x AND 2x corpus (k 8->16 with the corpus, like ann_scale). This
    completes the {{flat, IVF}} x {{PQ, SQ8}} matrix: avg_candidates shows
    the scan fraction the partitioner buys over sim_ann_sq8_adc_recall's
    full code-table scan, at 68 B/vec and zero codebook training.

    Plan shape at 100 TB: k-means state is O(k*dim) driver constants;
    assignment and SQ8 encoding are map-side projections over ONE corpus
    scan; candidates come from a broadcast(probes) equi-join on cluster —
    never a corpus x corpus product; ADC ranking reads codes + one scale
    float per candidate (full-precision vectors are never re-read)."""
    from iceberg_catalog_postgres_spark.llm.similarity import (
        _ivf_assign,
        _ivf_final_centroids,
    )

    base = load_parallel(spark, sf_dir, "embeddings").select(
        "vec_id", _vec("embedding").alias("e")
    )
    base = base.select(
        "vec_id", F.transform("e", lambda x: x.cast("double")).alias("e")
    )
    rows = []
    for scale_x, k in _IVFSQ8_CONFIGS:
        v = base if scale_x == 1 else _doubled(base)
        v = v.localCheckpoint(eager=True)
        corpus_n = v.count()
        ckpt = lambda df: df.localCheckpoint(eager=False)  # noqa: E731

        # IVF partitioner (deterministic Lloyd's, shared with ann_scale)
        cents = _ivf_final_centroids(v, k=k)
        assigned = _ivf_assign(v, cents).select(
            F.col("vec_id").alias("neighbor_id"), "cluster"
        )
        qd = _ivf_assign(v.filter(F.col("vec_id") < N_QUERIES), cents)
        dist_structs = F.array(
            *[
                F.struct(F.col(f"d{ci}").alias("dist"), F.lit(ci).alias("cluster"))
                for ci in range(len(cents))
            ]
        )
        probes = qd.select(
            F.col("vec_id").alias("query_id"),
            F.explode(F.slice(F.array_sort(dist_structs), 1, _NPROBE)).alias("p"),
        ).select("query_id", F.col("p.cluster").alias("probe_cluster"))
        cand = ckpt(
            F.broadcast(probes)
            .join(
                assigned,
                (F.col("probe_cluster") == F.col("cluster"))
                & (F.col("query_id") != F.col("neighbor_id")),
            )
            .select("query_id", "neighbor_id")
        )
        n_cand = cand.count()

        # SQ8 encode once; ADC-rank candidates only
        scale = F.greatest(
            F.array_max(F.transform("e", lambda x: F.abs(x))), F.lit(1e-12)
        )
        enc = v.select("vec_id", scale.alias("scale"), "e").select(
            F.col("vec_id").alias("neighbor_id"),
            "scale",
            F.transform(
                "e", lambda x: F.round(x / F.col("scale") * 127.0, 0)
            ).alias("c"),
        )
        q = v.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
        )
        est = (
            cand.join(F.broadcast(q), "query_id")
            .join(enc, "neighbor_id")
            .select(
                "query_id",
                "neighbor_id",
                F.round(
                    F.aggregate(
                        F.zip_with(
                            F.col("qe"),
                            F.col("c"),
                            lambda a, b: (a - b * F.col("scale") / 127.0)
                            * (a - b * F.col("scale") / 127.0),
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ),
                    6,
                ).alias("est"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("est").asc(), F.col("neighbor_id").asc()
        )
        top = ckpt(
            est.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= TOP_K)
            .select("query_id", "neighbor_id")
        )

        # exact-L2 ground truth over the full corpus
        t = v.select(F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ne"))
        l2 = F.round(
            F.aggregate(
                F.zip_with(F.col("qe"), F.col("ne"), lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        )
        wb = Window.partitionBy("query_id").orderBy(
            F.col("l2").asc(), F.col("neighbor_id").asc()
        )
        brute = ckpt(
            F.broadcast(q)
            .join(t, F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id", l2.alias("l2"))
            .withColumn("rk", F.row_number().over(wb))
            .filter(F.col("rk") <= TOP_K)
            .select("query_id", "neighbor_id")
        )
        hits = brute.join(top, ["query_id", "neighbor_id"]).count()
        rows.append(
            (
                "ivfsq8",
                scale_x,
                int(corpus_n),
                round(hits / (N_QUERIES * TOP_K), 4),
                round(n_cand / N_QUERIES, 4),
            )
        )
    return spark.createDataFrame(
        rows,
        "method string, scale_x int, corpus_n long, recall_at_k double, "
        "avg_candidates double",
    ).orderBy("scale_x")
