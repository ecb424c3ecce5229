"""ANN recall at TWO corpus scales — does the index family's quality hold
when the corpus doubles?

The fixture corpus is doubled DETERMINISTICALLY (each vector gets a
perturbed twin: every coordinate scaled by 1 + 0.001*(((id*31+i) % 7) - 3),
new vec_id = old + OFFSET — pure arithmetic, bit-identical in Spark and
DuckDB), and the three production index shapes run side by side at 1x and
2x with the index granularity scaled the way a production deployment scales
it — LSH 4->5 hyperplanes (16->32 buckets), IVF/IVFPQ k=8->16 coarse
centroids at fixed nprobe=2 — so candidates/query stays ~FLAT while the
corpus doubles (the sublinear-scan property that makes ANN worth its build
cost; a fixed-granularity index would double its candidate sets instead).

Output: one row per (method, scale) with recall@5 against that method's
exact ground truth (cosine for lsh/ivf, L2 for ivfpq — each method is
judged against the metric it ranks by) and the measured avg candidate-set
size. tests/test_ann_scale.py asserts recall holds within 0.05 across the
doubling while avg_candidates stays sublinear.

Everything — both quantizer builds at both scales, the perturbation, the
candidate generation, the re-rank — replays under ONE DuckDB oracle
(suffix-parameterized CTE generators, same determinism pins as the
certified 1x queries: left-to-right fp64 folds, round-6 distances,
(dist, id)-ascending tie-breaks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.exprs import col_ref_sql as _ref_sql
from iceberg_catalog_postgres_spark.llm.lsh_planes import bucket_col, bucket_sql
from iceberg_catalog_postgres_spark.llm.pq import (
    M_SUB,
    SUB_DIM,
    _adc_est,
    _build_books,
    _encode,
)
from iceberg_catalog_postgres_spark.llm.similarity import (
    N_QUERIES,
    TOP_K,
    _ivf_assign,
    _ivf_final_centroids,
    _vec,
)
from iceberg_catalog_postgres_spark.registry import load_parallel, register

OFFSET = 1_000_000
_NPROBE = 2
DIM = 64

# (scale_x, n_planes, ivf_k) — granularity doubles with the corpus
_CONFIGS = [(1, 4, 8), (2, 5, 16)]


# ---------------------------------------------------------------------------
# deterministic corpus doubling
# ---------------------------------------------------------------------------

def _doubled(v: DataFrame) -> DataFrame:
    """v UNION its perturbed twins (new ids = old + OFFSET); the perturbation
    formula uses the NEW id, staged under a DISTINCT column name first — in
    both engines. (Referencing an expression aliased to an existing column
    name from a sibling select item hits lateral-column-alias resolution in
    Spark >= 3.4 exactly like DuckDB's lateral aliasing: the formula would
    silently read id + 2*OFFSET. Found the hard way; both sides now stage
    ``vid2``.)"""
    staged = v.select((F.col("vec_id") + F.lit(OFFSET)).alias("vid2"), "e")
    pert = staged.select(
        F.col("vid2").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(DIM)),
            lambda i: F.element_at(F.col("e"), i)
            * (
                F.lit(1.0)
                + F.lit(0.001)
                * (((F.col("vid2") * 31 + i.cast("long")) % 7) - 3).cast("double")
            ),
        ).alias("e"),
    )
    return v.unionByName(pert)


_PERTURB_SQL = f"""vp AS (
      SELECT vid2 AS vec_id,
             list_transform(range(1, {DIM + 1}),
               i -> e[i] * (1 + 0.001 * CAST(((vid2 * 31 + i) % 7) - 3 AS DOUBLE))) AS e
      FROM (SELECT vec_id + {OFFSET} AS vid2, e FROM v1)
    ),
    v2 AS (SELECT vec_id, e FROM v1 UNION ALL SELECT vec_id, e FROM vp)"""


# ---------------------------------------------------------------------------
# shared metric snippets (SQL)
# ---------------------------------------------------------------------------

_COS_SQL = (
    f"round(list_sum(list_transform(range(1, {DIM + 1}), i -> qe[i] * ne[i]))"
    f" / (sqrt(list_sum(list_transform(qe, x -> x * x)))"
    f" * sqrt(list_sum(list_transform(ne, x -> x * x)))), 6)"
)
_L2_SQL = (
    f"round(list_sum(list_transform(range(1, {DIM + 1}),"
    f" i -> (qe[i] - ne[i]) * (qe[i] - ne[i]))), 6)"
)


def _brute_sql(sfx: str, v: str) -> str:
    """bc_{sfx}: cosine top-k; bl_{sfx}: L2 top-k — exact ground truths."""
    pairs = f"""
      SELECT qa.vec_id AS query_id, db.vec_id AS neighbor_id, qa.e AS qe, db.e AS ne
      FROM (SELECT * FROM {v} WHERE vec_id < {N_QUERIES}) qa
      JOIN {v} db ON qa.vec_id <> db.vec_id"""
    return f"""bc_{sfx} AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY {_COS_SQL} DESC, neighbor_id ASC) AS rk
        FROM ({pairs})
      ) WHERE rk <= {TOP_K}
    ),
    bl_{sfx} AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY {_L2_SQL} ASC, neighbor_id ASC) AS rk
        FROM ({pairs})
      ) WHERE rk <= {TOP_K}
    )"""


def _summary_sql(method: str, sfx: str, scale_x: int, v: str, brute: str,
                 top: str, cand: str) -> str:
    return f"""r_{method}_{sfx} AS (
      SELECT '{method}' AS method, {scale_x} AS scale_x,
             (SELECT count(*) FROM {v}) AS corpus_n,
             round(CAST((SELECT count(*) FROM {brute} b
                         JOIN {top} t USING (query_id, neighbor_id)) AS DOUBLE)
                   / {N_QUERIES * TOP_K}, 4) AS recall_at_k,
             round(CAST((SELECT count(*) FROM {cand}) AS DOUBLE)
                   / {N_QUERIES}, 2) AS avg_candidates
    )"""


# ---------------------------------------------------------------------------
# LSH (SQL)
# ---------------------------------------------------------------------------

def _lsh_sql(sfx: str, v: str, n_planes: int, scale_x: int) -> str:
    return f"""sig_{sfx} AS (
      SELECT vec_id, e, {bucket_sql("e", 0, n_planes)} AS bucket FROM {v}
    ),
    lshc_{sfx} AS (
      SELECT qa.vec_id AS query_id, db.vec_id AS neighbor_id, qa.e AS qe, db.e AS ne
      FROM (SELECT * FROM sig_{sfx} WHERE vec_id < {N_QUERIES}) qa
      JOIN sig_{sfx} db ON qa.bucket = db.bucket AND qa.vec_id <> db.vec_id
    ),
    lsht_{sfx} AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY {_COS_SQL} DESC, neighbor_id ASC) AS rk
        FROM lshc_{sfx}
      ) WHERE rk <= {TOP_K}
    ),
    {_summary_sql("lsh", sfx, scale_x, v, f"bc_{sfx}", f"lsht_{sfx}", f"lshc_{sfx}")}"""


# ---------------------------------------------------------------------------
# IVF / IVFPQ (SQL) — suffix- and k-parameterized unrolled Lloyd
# ---------------------------------------------------------------------------

def _ivf_dist(v_alias: str = "t") -> str:
    return (
        f"list_sum(list_transform(range(1, {DIM + 1}),"
        f" i -> ({v_alias}.e[i] - c.c[i]) * ({v_alias}.e[i] - c.c[i])))"
    )


def _ivf_iter(sfx: str, it: int, prev: str, v: str) -> str:
    return f"""di_{sfx}_{it} AS (
      SELECT t.vec_id, c.cluster, {_ivf_dist()} AS dist FROM {v} t, {prev} c
    ),
    ai_{sfx}_{it} AS (
      SELECT vec_id, cluster FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
          ORDER BY dist ASC, cluster ASC) AS rn
        FROM di_{sfx}_{it}
      ) WHERE rn = 1
    ),
    mi_{sfx}_{it} AS (
      SELECT a.cluster, t2.dim, round(avg(t.e[t2.dim]), 6) AS mval
      FROM ai_{sfx}_{it} a JOIN {v} t USING (vec_id)
      CROSS JOIN range(1, {DIM + 1}) t2(dim)
      GROUP BY a.cluster, t2.dim
    ),
    gi_{sfx}_{it} AS (
      SELECT cluster, list(mval ORDER BY dim) AS c FROM mi_{sfx}_{it} GROUP BY cluster
    ),
    ci_{sfx}_{it} AS (
      SELECT CAST(dense_rank() OVER (ORDER BY cluster) - 1 AS INT) AS cluster, c
      FROM gi_{sfx}_{it}
    )"""


def _ivf_sql(sfx: str, v: str, k: int, scale_x: int) -> str:
    """Coarse quantizer + probe candidates + cosine re-rank + summary; also
    leaves cand_{sfx} for the IVFPQ ranking to reuse."""
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
    ivft_{sfx} AS (
      SELECT query_id, neighbor_id FROM (
        SELECT c.query_id, c.neighbor_id,
               row_number() OVER (PARTITION BY c.query_id
                 ORDER BY {_COS_SQL} DESC, c.neighbor_id ASC) AS rk
        FROM (SELECT cd.query_id, cd.neighbor_id, qa.e AS qe, db.e AS ne
              FROM cand_{sfx} cd
              JOIN {v} qa ON qa.vec_id = cd.query_id
              JOIN {v} db ON db.vec_id = cd.neighbor_id) c
      ) WHERE rk <= {TOP_K}
    ),
    {_summary_sql("ivf", sfx, scale_x, v, f"bc_{sfx}", f"ivft_{sfx}", f"cand_{sfx}")}"""


def _pq_iter(sfx: str, m: int, it: int, prev: str) -> str:
    dist = (
        f"list_sum(list_transform(range(1, {SUB_DIM + 1}),"
        f" i -> (s.s[i] - c.c[i]) * (s.s[i] - c.c[i])))"
    )
    return f"""dp_{sfx}_{m}_{it} AS (
      SELECT s.vec_id, c.code, {dist} AS dist FROM sp_{sfx}_{m} s, {prev} c
    ),
    ap_{sfx}_{m}_{it} AS (
      SELECT vec_id, code FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
          ORDER BY dist ASC, code ASC) AS rn
        FROM dp_{sfx}_{m}_{it}
      ) WHERE rn = 1
    ),
    mp_{sfx}_{m}_{it} AS (
      SELECT a.code, t.dim, round(avg(s.s[t.dim]), 6) AS mval
      FROM ap_{sfx}_{m}_{it} a JOIN sp_{sfx}_{m} s USING (vec_id)
      CROSS JOIN range(1, {SUB_DIM + 1}) t(dim)
      GROUP BY a.code, t.dim
    ),
    gp_{sfx}_{m}_{it} AS (
      SELECT code, list(mval ORDER BY dim) AS c FROM mp_{sfx}_{m}_{it} GROUP BY code
    ),
    cp_{sfx}_{m}_{it} AS (
      SELECT CAST(dense_rank() OVER (ORDER BY code) - 1 AS INT) AS code, c
      FROM gp_{sfx}_{m}_{it}
    )"""


def _ivfpq_sql(sfx: str, v: str, scale_x: int, k_pq: int) -> str:
    """PQ codebooks + encodings + ADC over the IVF candidates (cand_{sfx}
    from _ivf_sql) + summary vs the L2 ground truth."""
    parts = []
    for m in range(M_SUB):
        lo, hi = m * SUB_DIM + 1, (m + 1) * SUB_DIM
        parts.append(f"sp_{sfx}_{m} AS (SELECT vec_id, e[{lo}:{hi}] AS s FROM {v})")
        parts.append(
            f"cp_{sfx}_{m}_0 AS (SELECT CAST(vec_id AS INT) AS code, s AS c"
            f" FROM sp_{sfx}_{m} WHERE vec_id < {k_pq})"
        )
        parts.append(_pq_iter(sfx, m, 1, f"cp_{sfx}_{m}_0"))
        parts.append(_pq_iter(sfx, m, 2, f"cp_{sfx}_{m}_1"))
        dist = (
            f"list_sum(list_transform(range(1, {SUB_DIM + 1}),"
            f" i -> (s.s[i] - c.c[i]) * (s.s[i] - c.c[i])))"
        )
        parts.append(
            f"""enc_{sfx}_{m} AS (
      SELECT vec_id, code FROM (
        SELECT s.vec_id, c.code,
               row_number() OVER (PARTITION BY s.vec_id
                 ORDER BY {dist} ASC, c.code ASC) AS rn
        FROM sp_{sfx}_{m} s, cp_{sfx}_{m}_2 c
      ) WHERE rn = 1
    )"""
        )
        parts.append(
            f"""adc_{sfx}_{m} AS (
      SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
             list_sum(list_transform(range(1, {SUB_DIM + 1}),
               i -> (q.s[i] - c.c[i]) * (q.s[i] - c.c[i]))) AS dm
      FROM (SELECT * FROM sp_{sfx}_{m} WHERE vec_id < {N_QUERIES}) q
      CROSS JOIN enc_{sfx}_{m} a JOIN cp_{sfx}_{m}_2 c ON c.code = a.code
    )"""
        )
    est_sum = " + ".join(f"adc_{sfx}_{m}.dm" for m in range(M_SUB))
    joins = " ".join(
        f"JOIN adc_{sfx}_{m} USING (query_id, neighbor_id)" for m in range(1, M_SUB)
    )
    parts.append(
        f"""est_{sfx} AS (
      SELECT query_id, neighbor_id, round({est_sum}, 6) AS est
      FROM adc_{sfx}_0 {joins}
      WHERE query_id != neighbor_id
    ),
    pqt_{sfx} AS (
      SELECT query_id, neighbor_id FROM (
        SELECT c.query_id, c.neighbor_id,
               row_number() OVER (PARTITION BY c.query_id
                 ORDER BY e.est ASC, c.neighbor_id ASC) AS rk
        FROM cand_{sfx} c
        JOIN est_{sfx} e ON e.query_id = c.query_id AND e.neighbor_id = c.neighbor_id
      ) WHERE rk <= {TOP_K}
    ),
    {_summary_sql("ivfpq", sfx, scale_x, v, f"bl_{sfx}", f"pqt_{sfx}", f"cand_{sfx}")}"""
    )
    return ",\n    ".join(parts)


def _scale_oracle() -> str:
    from iceberg_catalog_postgres_spark.llm.pq import K_PQ

    parts = ["WITH v1 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)",
             _PERTURB_SQL]
    selects = []
    for scale_x, n_planes, k in _CONFIGS:
        sfx, v = f"x{scale_x}", f"v{scale_x}"
        parts.append(_brute_sql(sfx, v))
        parts.append(_lsh_sql(sfx, v, n_planes, scale_x))
        parts.append(_ivf_sql(sfx, v, k, scale_x))
        parts.append(_ivfpq_sql(sfx, v, scale_x, K_PQ))
        selects += [f"SELECT * FROM r_lsh_{sfx}", f"SELECT * FROM r_ivf_{sfx}",
                    f"SELECT * FROM r_ivfpq_{sfx}"]
    return ",\n    ".join(parts) + "\n    " + " UNION ALL ".join(selects) + \
        " ORDER BY method, scale_x"


# ---------------------------------------------------------------------------
# Spark side
# ---------------------------------------------------------------------------

def _cos(qe, ne):
    """Cosine of two vector Columns as ONE parsed SQL expression (r17):
    the lambda-Column form paid ~9 py4j lambda round trips per build —
    this metric is built 8x per evaluation query. Same fold order, same
    doubles. Falls back to the (identical-result) lambda-Column build when
    a Column does not render as SQL text (r18, shared helper)."""
    qs, ns = _ref_sql(qe), _ref_sql(ne)
    if qs is None or ns is None:
        from iceberg_catalog_postgres_spark.llm.similarity import _dot, _norm

        return F.round(_dot(qe, ne) / (_norm(qe) * _norm(ne)), 6)
    dot = (
        f"aggregate(zip_with({qs}, {ns}, (a, b) -> a * b), 0.0D, "
        f"(s, x) -> s + x)"
    )
    nrm = (
        lambda c: f"sqrt(aggregate(transform({c}, x -> x * x), 0.0D, "
        f"(s, x) -> s + x))"
    )
    return F.expr(f"round({dot} / ({nrm(qs)} * {nrm(ns)}), 6)")


def _l2(qe, ne):
    qs, ns = _ref_sql(qe), _ref_sql(ne)
    if qs is None or ns is None:
        return F.round(
            F.aggregate(
                F.zip_with(qe, ne, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda s, x: s + x,
            ),
            6,
        )
    return F.expr(
        f"round(aggregate(zip_with({qs}, {ns}, (a, b) -> (a - b) * (a - b)), "
        f"0.0D, (s, x) -> s + x), 6)"
    )




def _topk(pairs: DataFrame, metric, desc: bool) -> DataFrame:
    """pairs(query_id, neighbor_id, qe, ne) -> top-k by metric."""
    mcol = metric(F.col("qe"), F.col("ne")).alias("m")
    order = [F.col("m").desc() if desc else F.col("m").asc(), F.col("neighbor_id").asc()]
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        pairs.select("query_id", "neighbor_id", mcol)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id")
    )


def _all_pairs(v: DataFrame) -> DataFrame:
    q = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    t = v.select(F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ne"))
    return F.broadcast(q).join(t, F.col("query_id") != F.col("neighbor_id"))


def _summary(method, scale_x, corpus_n, brute, top, cand) -> DataFrame:
    """1-row summary: recall and candidate-cost in ONE job (two 1-row
    aggregates cross-joined — not two separate counts). Each method's row
    is executed eagerly by the caller: unioning all six into a single plan
    re-embeds every quantizer's literal arrays six times over and blows the
    default 1g driver heap during codegen; six moderate plans fit."""
    hits = brute.join(top, ["query_id", "neighbor_id"]).agg(
        F.round(F.count(F.lit(1)).cast("double") / (N_QUERIES * TOP_K), 4).alias(
            "recall_at_k"
        )
    )
    cand_cost = cand.agg(
        F.round(F.count(F.lit(1)).cast("double") / N_QUERIES, 2).alias(
            "avg_candidates"
        )
    )
    return hits.crossJoin(cand_cost).select(
        F.lit(method).alias("method"),
        F.lit(scale_x).alias("scale_x"),
        F.lit(corpus_n).cast("long").alias("corpus_n"),
        "recall_at_k",
        "avg_candidates",
    )


@register(
    "sim_ann_scale_recall",
    oracle=_scale_oracle(),
    tags=("llm", "similarity", "evaluation", "scale"),
)
def sim_ann_scale_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH vs IVF vs IVFPQ recall@5 + candidate cost at 1x and 2x corpus.

    The scale experiment the 100 TB argument rests on, run as data: double
    the corpus (deterministic perturbed twins), scale the index granularity
    with it (LSH 16->32 buckets, IVF k=8->16), and measure that (a) recall
    holds and (b) candidates/query stays flat — i.e. the scan fraction per
    query HALVES. A fixed-granularity index would show avg_candidates
    doubling instead; that differential is exactly what the finer index
    buys. All three methods and both scales replay under one DuckDB oracle.

    Plan shape: per scale, the corpus is scanned once for signatures /
    assignments (map-side literal-plane projections and centroid argmins),
    candidates come from keyed equi-joins (bucket == bucket / cluster ==
    cluster) — never a corpus x corpus product (only the 10 broadcast query
    rows fan out); k-means/codebook state on the driver is O(k*dim) /
    O(M*K*dim) constants.
    """
    base = load_parallel(spark, sf_dir, "embeddings").select(
        "vec_id", _vec("embedding").alias("e")
    )
    base = base.select(
        "vec_id", F.transform("e", lambda x: x.cast("double")).alias("e")
    )

    def _one_scale(cfg):
        # NOTE (r17): running the two ARMS from a thread pool was measured
        # ~20% faster but OOMs the driver-contract session (vanilla 1g
        # heap) when the full ANN family runs back-to-back — two arms of
        # concurrent codegen + localCheckpoint blocks exceed the headroom.
        # Arms therefore run sequentially. WITHIN an arm (r18, VERDICT r17
        # item 4) the three independent build chains — the LSH summary,
        # the IVF Lloyd's loop, the PQ codebook build — overlap on a
        # 3-worker pool: each is a chain of small blocking collects that
        # previously serialized the driver. The concurrent plan state is a
        # strict subset of what one arm already holds (the books pool ran
        # 4-wide inside _build_books before this change), so the 1g-heap
        # OOM mode of arm-level overlap does not apply; pinned by the
        # back-to-back same-session stress in test_ann_scale.
        scale_x, n_planes, k = cfg
        rows = []
        v = base if scale_x == 1 else _doubled(base)
        # Iterative-algorithm lineage cuts (the k-means/codebook builds and
        # six downstream rankings would otherwise each re-embed the whole
        # perturbation lambda + every literal centroid array into one
        # combinatorially growing plan tree — the classic Lloyd's-in-Spark
        # OOM, fixed the standard way): the (tiny) corpus is materialized
        # once per scale, and each 50-row top-k / candidate frame below is
        # lazily checkpointed so summary plans join materialized leaves
        # instead of re-expanding every quantizer pipeline.
        # count() materializes the LAZY checkpoint as a side effect — one
        # job where eager-checkpoint-then-count was two (r18).
        v = v.localCheckpoint(eager=False)
        corpus_n = v.count()
        ckpt = lambda df: df.localCheckpoint(eager=False)  # noqa: E731

        brute_cos = ckpt(_topk(_all_pairs(v), _cos, desc=True))
        brute_l2 = ckpt(_topk(_all_pairs(v), _l2, desc=False))

        # LSH: same-bucket candidates, cosine re-rank
        sig = v.withColumn("bucket", bucket_col("e", 0, n_planes))
        q = sig.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("e").alias("qe"),
            F.col("bucket").alias("qb"),
        )
        lsh_cand = q.join(
            sig.select(F.col("vec_id").alias("neighbor_id"),
                       F.col("e").alias("ne"), F.col("bucket").alias("nb")),
            (F.col("qb") == F.col("nb")) & (F.col("query_id") != F.col("neighbor_id")),
        )
        lsh_summary = _summary("lsh", scale_x, corpus_n, brute_cos,
                               ckpt(_topk(lsh_cand, _cos, desc=True)),
                               ckpt(lsh_cand.select("query_id", "neighbor_id")))
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=3) as pool:
            fut_lsh = pool.submit(lsh_summary.first)
            fut_cents = pool.submit(_ivf_final_centroids, v, k)
            fut_books = pool.submit(_build_books, v)
            cents = fut_cents.result()
            # the LSH pass also materializes the shared brute_cos
            # checkpoint; wait for it before the IVF summary reads it so
            # the lazy checkpoint is computed exactly once
            rows.append(fut_lsh.result())
            books = fut_books.result()
        assigned = _ivf_assign(v, cents).select(
            F.col("vec_id").alias("neighbor_id"), "cluster"
        )
        qd = _ivf_assign(v.filter(F.col("vec_id") < N_QUERIES), cents)
        dist_structs = F.array(
            *[F.struct(F.col(f"d{ci}").alias("dist"), F.lit(ci).alias("cluster"))
              for ci in range(len(cents))]
        )
        probes = qd.select(
            F.col("vec_id").alias("query_id"),
            F.explode(F.slice(F.array_sort(dist_structs), 1, _NPROBE)).alias("p"),
        ).select("query_id", F.col("p.cluster").alias("probe_cluster"))
        cand = F.broadcast(probes).join(
            assigned,
            (F.col("probe_cluster") == F.col("cluster"))
            & (F.col("query_id") != F.col("neighbor_id")),
        ).select("query_id", "neighbor_id")
        cand = ckpt(cand)
        qe_df = v.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
        )
        ne_df = v.select(F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ne"))
        cand_pairs = cand.join(F.broadcast(qe_df), "query_id").join(ne_df, "neighbor_id")
        ivf_summary = _summary("ivf", scale_x, corpus_n, brute_cos,
                               ckpt(_topk(cand_pairs, _cos, desc=True)), cand)

        # IVFPQ: same candidates ranked by ADC estimate, judged vs exact L2
        # (books built concurrently with the LSH/IVF chains above). The
        # IVF summary action overlaps the PQ encode collect: the encode
        # touches only the materialized corpus, while the summary
        # materializes the cand checkpoint — disjoint state, and the main
        # thread only BUILDS the PQ plans (no action) until the summary
        # returns.
        with ThreadPoolExecutor(max_workers=1) as pool:
            fut_ivf = pool.submit(ivf_summary.first)
            codes = _encode(v, books)
            est = _adc_est(spark, v, books, codes)
            w = Window.partitionBy("query_id").orderBy(
                F.col("est").asc(), F.col("neighbor_id").asc()
            )
            pq_top = (
                cand.join(est, ["query_id", "neighbor_id"])
                .withColumn("rk", F.row_number().over(w))
                .filter(F.col("rk") <= TOP_K)
                .select("query_id", "neighbor_id")
            )
            rows.append(fut_ivf.result())
        rows.append(_summary("ivfpq", scale_x, corpus_n, brute_l2,
                             ckpt(pq_top), cand).first())
        return rows

    rows = [r for cfg in _CONFIGS for r in _one_scale(cfg)]

    res = spark.createDataFrame(
        rows,
        "method string, scale_x int, corpus_n long, recall_at_k double, "
        "avg_candidates double",
    )
    return res.orderBy("method", "scale_x")
