"""Product quantization (PQ) ANN: the memory-compression path of the index
family (Jégou et al., "Product Quantization for Nearest Neighbor Search").

A 64-dim vector is split into M=4 subspaces of 16 dims; each subspace gets
its own K=16-centroid codebook (per-subspace k-means), so every vector
compresses to 4 nibble codes (measured mean recall@5 = 0.28 at fixture
scale on the synthetic embeddings — random vectors are PQ's worst case;
the knobs are K_PQ and M_SUB, and production pairs PQ with IVF). Search is ADC (asymmetric distance
computation): the query stays full-precision, a per-query lookup table
holds its distance to every (subspace, code) centroid, and the estimated
distance to ANY corpus vector is M table lookups + adds — the corpus scan
touches CODES ONLY, never the vectors.

Scale story: at 100 TB of embeddings the vectors do not fit hot storage;
PQ codes are dim/16 of the raw size (here 4 bytes vs 256), the code scan is
a projection-pruned columnar read, and the LUT rides the closure per query.
Production composes this with IVF (scan only the probed cluster's codes)
— both halves are certified separately here (``sim_ann_ivf_probe``,
``sim_ann_pq_adc_recall``) with the SAME unrolled-Lloyd oracle technique.

Determinism contract (what makes the DuckDB oracle exact): k-means inits
from the first K vectors' subvectors, runs 2 centroid updates with
coordinates rounded to 6 decimals, assigns by argmin with (dist asc, code
asc) tie-break; rankings round the distance to 6 decimals and tie-break on
vec_id — identical fp64 folds on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.llm.similarity import N_QUERIES, TOP_K, _vec
from iceberg_catalog_postgres_spark.registry import load_parallel, register

M_SUB = 4  # subspaces
SUB_DIM = 16  # dims per subspace (4 x 16 = 64)
K_PQ = 16  # centroids per subspace codebook


def _sub_slice(m: int):
    return F.slice(F.col("e"), m * SUB_DIM + 1, SUB_DIM)


def _sub_slice_sql(m: int) -> str:
    return f"slice(e, {m * SUB_DIM + 1}, {SUB_DIM})"


def _dist_literal_sql(src_sql: str, ce: list[float]) -> str:
    """Squared distance of ``src_sql`` to a literal centroid as ONE SQL
    expression string (r17): the lambda-Column form cost ~25 ms of py4j
    round trips PER aggregate/zip_with lambda, so a 16-centroid distance
    block took seconds of driver time just to CONSTRUCT. expr() parses the
    same functions JVM-side in one call (~40x faster measured) and
    evaluates identically — same fold order, same doubles (repr() emits
    the shortest round-tripping literal; Spark parses it to the same
    bits)."""
    arr = ",".join(repr(float(x)) + "D" for x in ce)
    return (
        f"aggregate(zip_with({src_sql}, array({arr}), "
        f"(a, b) -> (a - b) * (a - b)), 0.0D, (acc, x) -> acc + x)"
    )


def _sq_dist_cols(cents: list[list[float]], src: str | None = None):
    """Per-centroid squared-distance columns over the subvector ``s``
    (``src``: optional SQL expression replacing the default column)."""
    src_sql = "s" if src is None else src
    return [
        F.expr(_dist_literal_sql(src_sql, ce)).alias(f"d{ci}")
        for ci, ce in enumerate(cents)
    ]


def _assign_code(sub: DataFrame, cents: list[list[float]]) -> DataFrame:
    """(vec_id, s) -> (vec_id, s, code): argmin over the codebook, first-min
    tie-break = lowest code (mirrors the oracle's dist asc, code asc).
    ``s`` rides along (r17): the assignment is a pure map-side projection,
    so keeping the subvector costs nothing and spares the Lloyd update its
    former per-iteration join back to ``sub``."""
    with_d = sub.select("vec_id", "s", *_sq_dist_cols(cents))
    arr = F.array(*[F.col(f"d{ci}") for ci in range(len(cents))])
    return with_d.select(
        "vec_id", "s", (F.array_position(arr, F.array_min(arr)) - 1).alias("code")
    )


def _codebook(sub: DataFrame) -> list[list[float]]:
    """Per-subspace deterministic Lloyd: init = first K_PQ subvectors
    (sorted by vec_id), 2 centroid updates with round(avg, 6) per
    coordinate, dense re-index by sorted cluster id — the same recipe (and
    the same oracle CTE shape) as the certified IVF build."""
    cents = [
        s
        for _, s in sorted(
            (r["vec_id"], r["s"]) for r in sub.filter(F.col("vec_id") < K_PQ).collect()
        )
    ]
    for _ in range(2):
        assigned = _assign_code(sub, cents)
        rows = (
            assigned.groupBy("code")
            .agg(
                *[
                    F.round(F.avg(F.element_at(F.col("s"), i + 1)), 6).alias(f"c{i}")
                    for i in range(SUB_DIM)
                ]
            )
            .collect()
        )
        cents = [
            [r[f"c{i}"] for i in range(SUB_DIM)]
            for r in sorted(rows, key=lambda r: r["code"])
        ]
    return cents


def _pq_iter_ctes(m: int, it: int, prev_c: str) -> str:
    """One unrolled Lloyd iteration for subspace ``m`` as DuckDB CTEs
    (assign / per-dim rounded mean / dense renumber)."""
    dist = (
        f"list_sum(list_transform(range(1, {SUB_DIM + 1}),"
        f" i -> (s{m}.s[i] - c.c[i]) * (s{m}.s[i] - c.c[i])))"
    )
    return f"""
    d{m}_{it} AS (
      SELECT s{m}.vec_id, c.code, {dist} AS dist FROM s{m}, {prev_c} c
    ),
    a{m}_{it} AS (
      SELECT vec_id, code FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, code ASC) AS rn
        FROM d{m}_{it}
      ) WHERE rn = 1
    ),
    m{m}_{it} AS (
      SELECT a.code, t.dim, round(avg(s{m}.s[t.dim]), 6) AS mval
      FROM a{m}_{it} a JOIN s{m} USING (vec_id) CROSS JOIN range(1, {SUB_DIM + 1}) t(dim)
      GROUP BY a.code, t.dim
    ),
    g{m}_{it} AS (SELECT code, list(mval ORDER BY dim) AS c FROM m{m}_{it} GROUP BY code),
    c{m}_{it} AS (SELECT CAST(dense_rank() OVER (ORDER BY code) - 1 AS INT) AS code, c FROM g{m}_{it})"""


def _pq_ctes() -> list[str]:
    """The PQ pipeline as composable CTE strings (assumes a ``v`` CTE of
    (vec_id, e DOUBLE[]) is already in scope): per-subspace slices,
    2-iteration codebooks, final encodings, and per-(query, neighbor) ADC
    components ``adc{m}``. Shared by the flat-PQ and IVF+PQ oracles."""
    parts = []
    for m in range(M_SUB):
        lo, hi = m * SUB_DIM + 1, (m + 1) * SUB_DIM
        parts.append(f"s{m} AS (SELECT vec_id, e[{lo}:{hi}] AS s FROM v)")
        parts.append(
            f"c{m}_0 AS (SELECT CAST(vec_id AS INT) AS code, s AS c FROM s{m} WHERE vec_id < {K_PQ})"
        )
        parts.append(_pq_iter_ctes(m, 1, f"c{m}_0").lstrip())
        parts.append(_pq_iter_ctes(m, 2, f"c{m}_1").lstrip())
        # final encode against the round-2 codebook
        dist = (
            f"list_sum(list_transform(range(1, {SUB_DIM + 1}),"
            f" i -> (s{m}.s[i] - c.c[i]) * (s{m}.s[i] - c.c[i])))"
        )
        parts.append(
            f"""enc{m} AS (
      SELECT vec_id, code FROM (
        SELECT s{m}.vec_id, c.code,
               row_number() OVER (PARTITION BY s{m}.vec_id ORDER BY {dist} ASC, c.code ASC) AS rn
        FROM s{m}, c{m}_2 c
      ) WHERE rn = 1
    )"""
        )
        # ADC component: query subvector -> distance to the neighbor's centroid
        parts.append(
            f"""adc{m} AS (
      SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
             list_sum(list_transform(range(1, {SUB_DIM + 1}),
               i -> (q.s[i] - c.c[i]) * (q.s[i] - c.c[i]))) AS dm
      FROM (SELECT * FROM s{m} WHERE vec_id < {N_QUERIES}) q
      CROSS JOIN enc{m} a JOIN c{m}_2 c ON c.code = a.code
    )"""
        )
    est_sum = " + ".join(f"adc{m}.dm" for m in range(M_SUB))
    joins = " ".join(
        f"JOIN adc{m} USING (query_id, neighbor_id)" for m in range(1, M_SUB)
    )
    parts.append(
        f"""est AS (
      SELECT query_id, neighbor_id, round({est_sum}, 6) AS est
      FROM adc0 {joins}
      WHERE query_id != neighbor_id
    )"""
    )
    return parts


_BRUTE_L2_CTE = f"""brute AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round(list_sum(list_transform(range(1, {M_SUB * SUB_DIM + 1}),
                   i -> (q.e[i] - t.e[i]) * (q.e[i] - t.e[i]))), 6) ASC,
                 t.vec_id ASC) AS rk
        FROM (SELECT * FROM v WHERE vec_id < {N_QUERIES}) q
        JOIN v t ON q.vec_id != t.vec_id
      ) WHERE rk <= {TOP_K}
    )"""

_RECALL_SELECT = f"""SELECT b.query_id,
           count(p.neighbor_id) AS n_hit,
           {TOP_K} AS k,
           round(CAST(count(p.neighbor_id) AS DOUBLE) / {TOP_K}, 4) AS recall_at_k
    FROM brute b
    LEFT JOIN top_cte p ON b.query_id = p.query_id AND b.neighbor_id = p.neighbor_id
    GROUP BY b.query_id"""


def _pq_oracle() -> str:
    parts = [
        "WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)",
        *_pq_ctes(),
        f"""top_cte AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY est ASC, neighbor_id ASC) AS rk
        FROM est
      ) WHERE rk <= {TOP_K}
    )""",
        _BRUTE_L2_CTE + "\n    " + _RECALL_SELECT,
    ]
    return ",\n    ".join(parts)


def _load_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_parallel(spark, sf_dir, "embeddings").select(
        "vec_id", _vec("embedding").alias("e")
    )
    return e.select("vec_id", F.transform("e", lambda x: x.cast("double")).alias("e"))


def _build_books(e: DataFrame) -> list[list[list[float]]]:
    """Per-subspace codebooks; driver holds M*K*SUB_DIM doubles.

    The M_SUB Lloyd's builds are INDEPENDENT, so they run from a driver
    thread pool (r17, guide §2.6 — overlap independent jobs): each build is
    a short chain of small collects whose tail leaves the cluster idle;
    concurrent submission back-fills it. Results are unchanged — each
    codebook's iteration chain is untouched and pool.map preserves subspace
    order."""
    from concurrent.futures import ThreadPoolExecutor

    subs = [e.select("vec_id", _sub_slice(m).alias("s")) for m in range(M_SUB)]
    with ThreadPoolExecutor(max_workers=M_SUB) as pool:
        return list(pool.map(_codebook, subs))


def _encode(e: DataFrame, books) -> DataFrame:
    """Every vector -> M codes, map-side (argmin per subspace; first-min
    tie-break = lowest code, mirroring the oracle)."""
    enc = e
    for m in range(M_SUB):
        darr = F.array(*[x for x in _sq_dist_cols(books[m], src=_sub_slice_sql(m))])
        enc = enc.withColumn(f"code{m}", F.array_position(darr, F.array_min(darr)) - 1)
    return enc.select("vec_id", *[f"code{m}" for m in range(M_SUB)])


def _adc_est(spark: SparkSession, e: DataFrame, books, codes: DataFrame) -> DataFrame:
    """(query_id, neighbor_id, est): per-query ADC lookup tables computed
    driver-side (N_QUERIES x M*K entries, same left-to-right fp64 fold as
    the oracle) broadcast-joined against the CODE table."""
    qrows = sorted(
        (r["vec_id"], r["e"]) for r in e.filter(F.col("vec_id") < N_QUERIES).collect()
    )
    lut_rows = []
    for qid, qe in qrows:
        luts = []
        for m in range(M_SUB):
            qs = qe[m * SUB_DIM : (m + 1) * SUB_DIM]
            luts.append(
                {
                    code: sum((qs[i] - c[i]) * (qs[i] - c[i]) for i in range(SUB_DIM))
                    for code, c in enumerate(books[m])
                }
            )
        lut_rows.append((qid, *luts))
    lut_schema = "query_id long, " + ", ".join(
        f"lut{m} map<int,double>" for m in range(M_SUB)
    )
    luts_df = spark.createDataFrame(lut_rows, lut_schema)
    est_expr = F.col("lut0")[F.col("code0")]
    for m in range(1, M_SUB):
        est_expr = est_expr + F.col(f"lut{m}")[F.col(f"code{m}")]
    return (
        F.broadcast(luts_df)
        .crossJoin(codes)
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(est_expr, 6).alias("est"),
        )
    )


@register("sim_ann_pq_adc_recall", oracle=_pq_oracle(), tags=("llm", "similarity", "pq", "evaluation"))
def sim_ann_pq_adc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ + ADC search, recall@{k} vs exact L2 per query — the quality loop
    for the compressed-index path, itself oracle-certified.

    Plan shape (the 100 TB one): the codebook build collects K_PQ * SUB_DIM
    doubles per subspace to the driver (O(M*K*dim) — constant); ENCODING is
    one map-side projection (codes only, no shuffle); ADC is a broadcast of
    10 per-query LUTs (M*K doubles each) cross-joined against the CODE
    table — the full-precision corpus vectors are read exactly once (at
    encode time) and never again. The estimated-distance sum is written
    left-to-right over subspaces to match the oracle's fold order exactly.
    """
    e = _load_vectors(spark, sf_dir)
    books = _build_books(e)
    codes = _encode(e, books)
    est = _adc_est(spark, e, books, codes)
    w = Window.partitionBy("query_id").orderBy(F.col("est").asc(), F.col("neighbor_id").asc())
    pq_top = est.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= TOP_K
    ).select("query_id", "neighbor_id")
    return _recall_vs_brute(e, pq_top)


def _recall_vs_brute(e: DataFrame, top: DataFrame) -> DataFrame:
    """(query_id, n_hit, k, recall_at_k): exact L2 ground truth over the
    N_QUERIES queries, left-joined against the candidate top-k."""
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    t = e.select(F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ne"))
    l2 = F.round(
        F.aggregate(
            F.zip_with(F.col("qe"), F.col("ne"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    wb = Window.partitionBy("query_id").orderBy(F.col("l2").asc(), F.col("neighbor_id").asc())
    brute = (
        F.broadcast(q)
        .join(t, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", l2.alias("l2"))
        .withColumn("rk", F.row_number().over(wb))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", F.col("neighbor_id").alias("true_neighbor_id"))
    )
    return (
        brute.join(
            top,
            (brute.query_id == top.query_id)
            & (brute.true_neighbor_id == top.neighbor_id),
            "left_outer",
        )
        .groupBy(brute.query_id.alias("query_id"))
        .agg(
            F.count("neighbor_id").alias("n_hit"),
            F.lit(TOP_K).alias("k"),
            F.round(F.count("neighbor_id").cast("double") / TOP_K, 4).alias(
                "recall_at_k"
            ),
        )
    )


def _ivfpq_oracle() -> str:
    """IVF coarse quantizer (unrolled Lloyd, k={k}) + PQ fine quantizer
    composed: candidates = probed clusters' members, ranked by ADC."""
    from iceberg_catalog_postgres_spark.llm.similarity import (
        _IVF_DIST_SQL,
        _IVF_K,
        _NPROBE,
        _ivf_iter_ctes,
    )

    parts = [
        "WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)",
        f"c0 AS (SELECT CAST(vec_id AS INT) AS cluster, e AS c FROM v WHERE vec_id < {_IVF_K})",
        _ivf_iter_ctes(1, "c0").strip(),
        _ivf_iter_ctes(2, "c1").strip(),
        f"""d3 AS (
      SELECT v.vec_id, c.cluster, {_IVF_DIST_SQL} AS dist FROM v, c2 c
    ),
    a3 AS (
      SELECT vec_id, cluster FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cluster ASC) AS rn
        FROM d3
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, cluster FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cluster ASC) AS rn
        FROM d3 WHERE vec_id < {N_QUERIES}
      ) WHERE rn <= {_NPROBE}
    )""",
        *_pq_ctes(),
        f"""cand AS (
      SELECT p.query_id, a.vec_id AS neighbor_id
      FROM probes p JOIN a3 a ON a.cluster = p.cluster AND a.vec_id <> p.query_id
    ),
    top_cte AS (
      SELECT query_id, neighbor_id FROM (
        SELECT c.query_id, c.neighbor_id,
               row_number() OVER (PARTITION BY c.query_id ORDER BY e.est ASC, c.neighbor_id ASC) AS rk
        FROM cand c JOIN est e ON e.query_id = c.query_id AND e.neighbor_id = c.neighbor_id
      ) WHERE rk <= {TOP_K}
    )""",
        _BRUTE_L2_CTE + "\n    " + _RECALL_SELECT,
    ]
    return ",\n    ".join(parts)


@register(
    "sim_ann_ivfpq_recall",
    oracle=_ivfpq_oracle(),
    tags=("llm", "similarity", "ivf", "pq", "evaluation"),
)
def sim_ann_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + PQ composed — the production large-scale ANN shape (FAISS
    IVFPQ): the coarse quantizer (certified in ``sim_ivf_kmeans_build``)
    restricts each query to its probed clusters' members, and the fine
    quantizer (certified in ``sim_ann_pq_adc_recall``) ranks those
    candidates from CODES alone via the query's ADC lookup table. Emits
    recall@5 vs exact L2 — the end-to-end quality number the two index
    halves exist to trade against cost.

    Scale: the probe cuts the candidate set to ~nprobe/k of the corpus
    (and becomes partition pruning when the codes are written PARTITIONED
    BY cluster — ``catalog_ann_ivf_partitioned_probe`` certifies exactly
    that layout); ADC then never touches a full-precision vector. Memory
    per 10^9 vectors: 4 GB of codes vs 256 GB of floats. The whole
    composed pipeline — both quantizers, the probe, the ADC ranking —
    hash-matches one DuckDB oracle.
    """
    from iceberg_catalog_postgres_spark.llm.similarity import (
        _NPROBE,
        _ivf_assign,
        _ivf_final_centroids,
    )

    e = _load_vectors(spark, sf_dir)

    # coarse quantizer: assignments + per-query probe list
    cents = _ivf_final_centroids(e)
    assigned = _ivf_assign(e, cents).select(
        F.col("vec_id").alias("neighbor_id"), "cluster"
    )
    qd = _ivf_assign(e.filter(F.col("vec_id") < N_QUERIES), cents)
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

    # fine quantizer: codes + ADC estimates
    books = _build_books(e)
    codes = _encode(e, books)
    est = _adc_est(spark, e, books, codes)

    cand = F.broadcast(probes).join(
        assigned,
        (F.col("probe_cluster") == F.col("cluster"))
        & (F.col("query_id") != F.col("neighbor_id")),
    ).select("query_id", "neighbor_id")
    w = Window.partitionBy("query_id").orderBy(F.col("est").asc(), F.col("neighbor_id").asc())
    top = (
        cand.join(est, ["query_id", "neighbor_id"])
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id")
    )
    return _recall_vs_brute(e, top)
