"""IVFADC with RESIDUAL encoding — the actual FAISS IVFADC design.

The plain IVFPQ in ``pq.py`` quantizes raw vectors; real IVFADC encodes each
vector's RESIDUAL against its coarse centroid (x_r = x - c[assign(x)]) and
searches with per-(query, probed-cluster) lookup tables over the residual
codebooks. On clustered real-world embeddings residuals concentrate the
distribution so the same codebook budget (M=4 x K=16 here) spends its
centroids on a tighter cloud — that is why FAISS's IVFADC is the
production default. Honest measurement note: the fixture embeddings are
near-isotropic synthetic vectors, where the coarse centroids sit close to
the origin and residual ~ original — measured recall here is on par with
the non-residual composition (0.30 vs 0.32 at sf0.01), not above it; the
machinery (not a recall win at fixture scale) is what this query
certifies. ``tests/test_ann_residual.py`` pins exactness of every stage
(oracle) and that residual recall stays within noise of IVFPQ.

Distance correctness: for a candidate x in probed cluster c,
||q - x|| = ||(q - c) - (x - c)|| — both sides relative to the SAME
centroid — so ranking by ADC over residuals estimates the true L2 exactly
as well as the residual quantization allows; ground truth stays exact L2
on the ORIGINAL vectors.

Everything replays under one DuckDB oracle: the coarse Lloyd build and the
per-subspace residual codebook builds reuse the suffix-parameterized CTE
generators from ann_scale (same determinism pins: round-6 centroid
coordinates, left-to-right fp64 folds, (dist, id)-ascending tie-breaks);
the query residuals, LUT distances, and candidate ranking are fresh CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.llm.ann_scale import _ivf_iter, _pq_iter
from iceberg_catalog_postgres_spark.llm.pq import (
    K_PQ,
    M_SUB,
    SUB_DIM,
    _BRUTE_L2_CTE,
    _RECALL_SELECT,
    _codebook,
    _load_vectors,
    _recall_vs_brute,
    _sq_dist_cols,
)
from iceberg_catalog_postgres_spark.llm.similarity import (
    N_QUERIES,
    TOP_K,
    _IVF_K,
    _ivf_assign,
    _ivf_final_centroids,
)
from iceberg_catalog_postgres_spark.registry import register

_NPROBE = 2
DIM = 64


def _ivfadc_oracle() -> str:
    sfx = "rr"
    parts = [
        "WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)",
        f"ci_{sfx}_0 AS (SELECT CAST(vec_id AS INT) AS cluster, e AS c FROM v WHERE vec_id < {_IVF_K})",
        _ivf_iter(sfx, 1, f"ci_{sfx}_0", "v").strip(),
        _ivf_iter(sfx, 2, f"ci_{sfx}_1", "v").strip(),
        f"""di_{sfx}_3 AS (
      SELECT t.vec_id, c.cluster,
             list_sum(list_transform(range(1, {DIM + 1}),
               i -> (t.e[i] - c.c[i]) * (t.e[i] - c.c[i]))) AS dist
      FROM v t, ci_{sfx}_2 c
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
    vres AS (
      SELECT a.vec_id,
             list_transform(range(1, {DIM + 1}), i -> t.e[i] - c.c[i]) AS e
      FROM ai_{sfx}_3 a JOIN v t USING (vec_id)
      JOIN ci_{sfx}_2 c ON c.cluster = a.cluster
    )""",
    ]
    # residual PQ codebooks + encodings, per subspace
    for m in range(M_SUB):
        lo, hi = m * SUB_DIM + 1, (m + 1) * SUB_DIM
        parts.append(f"sp_{sfx}_{m} AS (SELECT vec_id, e[{lo}:{hi}] AS s FROM vres)")
        parts.append(
            f"cp_{sfx}_{m}_0 AS (SELECT CAST(vec_id AS INT) AS code, s AS c"
            f" FROM sp_{sfx}_{m} WHERE vec_id < {K_PQ})"
        )
        parts.append(_pq_iter(sfx, m, 1, f"cp_{sfx}_{m}_0").strip())
        parts.append(_pq_iter(sfx, m, 2, f"cp_{sfx}_{m}_1").strip())
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
    # query residual per probed cluster
    parts.append(
        f"""qres_{sfx} AS (
      SELECT p.query_id, p.cluster,
             list_transform(range(1, {DIM + 1}), i -> qv.e[i] - cc.c[i]) AS qr
      FROM probes_{sfx} p
      JOIN v qv ON qv.vec_id = p.query_id
      JOIN ci_{sfx}_2 cc ON cc.cluster = p.cluster
    )"""
    )
    sub_dists = []
    joins = []
    for m in range(M_SUB):
        lo = m * SUB_DIM
        joins.append(f"JOIN enc_{sfx}_{m} e{m} ON e{m}.vec_id = a.vec_id")
        joins.append(f"JOIN cp_{sfx}_{m}_2 b{m} ON b{m}.code = e{m}.code")
        sub_dists.append(
            f"list_sum(list_transform(range(1, {SUB_DIM + 1}),"
            f" i -> (q.qr[{lo} + i] - b{m}.c[i]) * (q.qr[{lo} + i] - b{m}.c[i])))"
        )
    parts.append(
        f"""est_{sfx} AS (
      SELECT q.query_id, a.vec_id AS neighbor_id,
             round({" + ".join(sub_dists)}, 6) AS est
      FROM qres_{sfx} q
      JOIN ai_{sfx}_3 a ON a.cluster = q.cluster AND a.vec_id <> q.query_id
      {" ".join(joins)}
    ),
    top_cte AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY est ASC, neighbor_id ASC) AS rk
        FROM est_{sfx}
      ) WHERE rk <= {TOP_K}
    )"""
    )
    parts.append(_BRUTE_L2_CTE + "\n    " + _RECALL_SELECT)
    return ",\n    ".join(parts)


def _centroid_sql(cents) -> str:
    """cluster -> centroid literal array, as ONE SQL expression string
    (r18): the old when-chain built k x dim F.lit Columns — ~512 py4j
    calls of pure driver time per plan build. element_at over a literal
    array-of-arrays selects the same centroid for the same cluster id
    (ids are dense 0..k-1 by construction); repr() literals parse to the
    same doubles."""
    arrays = ",".join(
        "array(" + ",".join(repr(float(x)) + "D" for x in ce) + ")"
        for _, ce in cents
    )
    return f"element_at(array({arrays}), CAST(cluster + 1 AS INT))"


@register(
    "sim_ann_ivfadc_residual_recall",
    oracle=_ivfadc_oracle(),
    tags=("llm", "similarity", "ivf", "pq", "residual", "evaluation"),
)
def sim_ann_ivfadc_residual_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True IVFADC: coarse quantizer + PQ over RESIDUALS + per-probe query
    LUTs; recall@{k} vs exact L2 on the original vectors.

    Plan shape at 100 TB: identical to the non-residual IVFPQ — broadcast
    centroids for the map-side coarse assign, one zip_with subtraction for
    residuals (no extra shuffle), per-subspace codebooks on the driver
    (O(M*K*dim)), codes-only corpus state, and N_QUERIES*nprobe LUTs
    (M*K doubles each) broadcast against the candidate join. The residual
    subtraction is the entire marginal cost of the recall gain.
    """
    e = _load_vectors(spark, sf_dir)
    cents = _ivf_final_centroids(e)
    assigned = _ivf_assign(e, cents).select("vec_id", "e", "cluster")
    res = assigned.select(
        "vec_id",
        "cluster",
        F.expr(f"zip_with(e, {_centroid_sql(cents)}, (a, b) -> a - b)").alias("r"),
    )
    # The M_SUB residual codebooks are independent Lloyd's builds — run
    # them from a driver thread pool exactly like pq._build_books (r18;
    # this was the one sequential codebook loop left after r17): wall time
    # drops from the SUM of 4 x 3 blocking collects to ~the longest chain.
    from concurrent.futures import ThreadPoolExecutor

    subs = [
        res.select("vec_id", F.slice("r", m * SUB_DIM + 1, SUB_DIM).alias("s"))
        for m in range(M_SUB)
    ]
    with ThreadPoolExecutor(max_workers=M_SUB) as pool:
        books = list(pool.map(_codebook, subs))
    codes = res.select("vec_id", "cluster", "r")
    for m in range(M_SUB):
        # per-centroid squared distances as parsed SQL strings (r18 —
        # the lambda-Column form paid ~3 py4j lambda round trips per
        # centroid at plan-BUILD time; same fold order, same doubles)
        darr = F.array(
            *_sq_dist_cols(books[m], src=f"slice(r, {m * SUB_DIM + 1}, {SUB_DIM})")
        )
        codes = codes.withColumn(f"code{m}", F.array_position(darr, F.array_min(darr)) - 1)
    codes = codes.select("vec_id", "cluster", *[f"code{m}" for m in range(M_SUB)])

    # probes: nprobe nearest coarse centroids per query
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
    ).select("query_id", F.col("p.cluster").alias("cluster"))

    # per-(query, probed cluster) residual LUTs, driver-side (bounded:
    # N_QUERIES * nprobe * M * K doubles)
    qrows = {
        r["vec_id"]: r["e"]
        for r in e.filter(F.col("vec_id") < N_QUERIES).collect()
    }
    cent_by_id = {ci: ce for ci, (_, ce) in enumerate(cents)}
    lut_rows = []
    for p in probes.collect():
        qid, cl = p["query_id"], p["cluster"]
        qr = [qrows[qid][i] - cent_by_id[cl][i] for i in range(DIM)]
        luts = []
        for m in range(M_SUB):
            qs = qr[m * SUB_DIM : (m + 1) * SUB_DIM]
            luts.append(
                {
                    code: sum((qs[i] - c[i]) * (qs[i] - c[i]) for i in range(SUB_DIM))
                    for code, c in enumerate(books[m])
                }
            )
        lut_rows.append((qid, cl, *luts))
    lut_schema = "query_id long, cluster int, " + ", ".join(
        f"lut{m} map<int,double>" for m in range(M_SUB)
    )
    luts_df = spark.createDataFrame(lut_rows, lut_schema)

    est_expr = F.col("lut0")[F.col("code0")]
    for m in range(1, M_SUB):
        est_expr = est_expr + F.col(f"lut{m}")[F.col(f"code{m}")]
    est = (
        F.broadcast(luts_df)
        .join(codes, "cluster")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(est_expr, 6).alias("est"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("est").asc(), F.col("neighbor_id").asc()
    )
    top = (
        est.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id")
    )
    return _recall_vs_brute(e, top)
