"""Similarity search over the ``embeddings`` fixture (array<float>, dim=64):
brute-force cosine top-k (baseline), LSH-bucketed ANN (scale path), blocked
pair mining, and a distributed k-means/IVF build (rows-only).

Float determinism note: all dot products fold left-to-right in float64 after
an explicit element cast, so Spark's ``aggregate`` and DuckDB's ``list_sum``
produce bitwise-identical sums; rankings tie-break on vec_id after rounding,
making top-k reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.registry import load, load_parallel, register

N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 5


def _vec(col: str):
    return F.transform(F.col(col), lambda x: x.cast("double"))


from iceberg_catalog_postgres_spark.exprs import col_ref_sql as _col_ref_sql


def _dot(a, b):
    """Dot product folded left-to-right in float64. Built as ONE parsed SQL
    expression when both args render as SQL (r17 — the lambda-Column form
    paid ~3 py4j lambda round trips per build); falls back to the
    lambda-Column form otherwise. Identical evaluation either way."""
    sa, sb = _col_ref_sql(a), _col_ref_sql(b)
    if sa is not None and sb is not None:
        return F.expr(
            f"aggregate(zip_with({sa}, {sb}, (x, y) -> x * y), 0.0D, "
            f"(acc, x) -> acc + x)"
        )
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(col):
    """L2 norm of an array column — fold squares left-to-right in float64,
    the same element order as ``_dot``, so precomputing it per row is
    bit-identical to folding it per pair. Parsed-SQL build (r17) with the
    same fallback as ``_dot``."""
    src = _col_ref_sql(F.col(col) if isinstance(col, str) else col)
    if src is not None:
        return F.expr(
            f"sqrt(aggregate(transform({src}, x -> x * x), 0.0D, "
            f"(a, x) -> a + x))"
        )
    c = F.col(col) if isinstance(col, str) else col
    return F.sqrt(
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )


_DOT_SQL = "list_sum(list_transform(range(1, 65), i -> qa.e[i] * db.e[i]))"
_NORM_SQL = "sqrt(list_sum(list_transform({v}.e, x -> x * x)))"


@register(
    "sim_cosine_topk_brute",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    pairs AS (
      SELECT qa.vec_id AS query_id, db.vec_id AS neighbor_id,
             round({_DOT_SQL} / ({_NORM_SQL.format(v='qa')} * {_NORM_SQL.format(v='db')}), 6) AS cosine
      FROM (SELECT * FROM v WHERE vec_id < {N_QUERIES}) qa
      JOIN v db ON qa.vec_id <> db.vec_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rk
      FROM pairs
    )
    SELECT query_id, neighbor_id, cosine, rk FROM ranked WHERE rk <= {TOP_K}
    """,
    tags=("llm", "similarity", "bench"),
)
def sim_cosine_topk_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: the exact baseline every ANN variant is
    measured against.

    Scale: queries (small) are broadcast against the corpus — the corpus is
    scanned once, never shuffled. Top-k per query via window row_number with
    rank-limit pushdown. Cost is O(|corpus| * |queries| * dim) FLOPs spread
    across partitions; for large query sets, switch to the LSH variant.

    Uses plain ``load`` (no fixture repartition): the per-pair math is tiny
    at bench scale, so the repartition shuffle cost exceeded its parallelism
    gain (r2 bench regression, measured 6-rep: ~1.2-6.5 s with repartition
    vs a stable ~0.9-1.1 s without). At 100 TB the scan parallelism comes
    from row-group splits for free — the repartition was never the scale
    path.
    """
    e = load(spark, sf_dir, "embeddings").select("vec_id", _vec("embedding").alias("e"))
    # Norms are per-ROW quantities: compute them once per vector BEFORE the
    # pair join instead of re-folding the 64-element array twice per PAIR
    # (r17, guide §2.3/§1.2 — same expression over the same input, so the
    # doubles, and therefore the rounded cosines, are bit-identical; the
    # per-pair work drops from 3 array folds to 1). At |Q| queries this
    # saves 2|Q| array folds per corpus row.
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"), _norm("e").alias("qn")
    )
    corpus = e.select(
        F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ne"), _norm("e").alias("nn")
    )
    cos = F.round(_dot(F.col("qe"), F.col("ne")) / (F.col("qn") * F.col("nn")), 6)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        F.broadcast(q)
        .join(corpus, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
    )


from iceberg_catalog_postgres_spark.llm.lsh_planes import bucket_col as _bucket_col
from iceberg_catalog_postgres_spark.llm.lsh_planes import bucket_sql as _bucket_sql


@register(
    "sim_ann_lsh_bucketed",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    sig AS (
      SELECT vec_id, e,
             {_bucket_sql("v.e", 0, 4)} AS bucket
      FROM v
    ),
    pairs AS (
      SELECT qa.vec_id AS query_id, db.vec_id AS neighbor_id,
             round({_DOT_SQL} / ({_NORM_SQL.format(v='qa')} * {_NORM_SQL.format(v='db')}), 6) AS cosine
      FROM (SELECT * FROM sig WHERE vec_id < {N_QUERIES}) qa
      JOIN sig db ON qa.bucket = db.bucket AND qa.vec_id <> db.vec_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rk
      FROM pairs
    )
    SELECT query_id, neighbor_id, cosine, rk FROM ranked WHERE rk <= {TOP_K}
    """,
    tags=("llm", "similarity", "lsh"),
)
def sim_ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via random-hyperplane LSH: 4 sign bits -> 16 buckets; candidates
    only within the query's bucket, then exact cosine re-rank.

    Scale: THE scale path. The corpus is hashed once (map-only), the
    candidate join is an equi-join on bucket id (keyed shuffle, no broadcast
    of the corpus), and exact scoring touches ~1/16 of the data per query.
    Recall tuning = more tables (OR of several band sets) or multi-probe;
    the hyperplanes are md5-derived literal +-1 vectors (lsh_planes.py) so
    the DuckDB oracle reproduces them exactly and Catalyst constant-folds them.
    """
    e = load_parallel(spark, sf_dir, "embeddings").select("vec_id", _vec("embedding").alias("e"))

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
    # per-row norms precomputed before the pair join (r17) — bit-identical
    cos = F.round(_dot(F.col("qe"), F.col("ne")) / (F.col("qn") * F.col("nn")), 6)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        q.join(corpus, (F.col("qb") == F.col("nb")) & (F.col("query_id") != F.col("neighbor_id")))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
    )


_PROBE_MASKS = (0, 1, 2, 4, 8)  # own bucket + each single-bit flip (4 planes)


@register(
    "sim_ann_lsh_multiprobe",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    sig AS (
      SELECT vec_id, e,
             {_bucket_sql("v.e", 0, 4)} AS bucket
      FROM v
    ),
    pairs AS (
      SELECT qa.vec_id AS query_id, db.vec_id AS neighbor_id,
             round({_DOT_SQL} / ({_NORM_SQL.format(v='qa')} * {_NORM_SQL.format(v='db')}), 6) AS cosine
      FROM (SELECT * FROM sig WHERE vec_id < {N_QUERIES}) qa
      JOIN sig db
        ON bit_count(xor(qa.bucket, db.bucket)) <= 1 AND qa.vec_id <> db.vec_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rk
      FROM pairs
    )
    SELECT query_id, neighbor_id, cosine, rk FROM ranked WHERE rk <= {TOP_K}
    """,
    tags=("llm", "similarity", "lsh"),
)
def sim_ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe sign-LSH ANN: each query searches its own bucket PLUS the
    4 buckets one bit-flip away (the most likely homes of a near neighbor
    that fell on the other side of exactly one hyperplane). Probing 5/16
    buckets recovers most of the recall that multiple independent hash
    tables buy, without building or storing extra tables: measured at
    sf0.01 by ``sim_ann_multiprobe_recall``, mean recall@5 goes 0.18
    (single-probe) -> 0.62 (multi-probe) — above the 4-table OR's 0.58
    (``sim_ann_multitable_lsh``) at 1/4 the stored signatures.

    Scale: the corpus is hashed and stored ONCE (vs ``sim_ann_multitable_lsh``
    which materializes 4 signatures); only the query side fans out 5x, and
    queries are the small side. The probe fan-out is an explode of literal
    XOR masks, so the candidate join stays a pure equi-join on bucket id —
    the oracle's bit_count(xor) <= 1 theta-join is the same predicate, but
    expressing it as the probe-explode equi-join is exactly the rewrite that
    keeps the Spark plan shuffle-keyed (a theta-join would be BNLJ).
    """
    e = load(spark, sf_dir, "embeddings").select("vec_id", _vec("embedding").alias("e"))
    sig = e.withColumn("bucket", _bucket_col("e", 0, 4))
    q = sig.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        _norm("e").alias("qn"),
        F.explode(
            F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in _PROBE_MASKS])
        ).alias("pb"),
    )
    corpus = sig.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("e").alias("ne"),
        F.col("bucket").alias("nb"),
        _norm("e").alias("nn"),
    )
    # per-row norms precomputed before the pair join (r17) — bit-identical
    cos = F.round(_dot(F.col("qe"), F.col("ne")) / (F.col("qn") * F.col("nn")), 6)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        q.join(corpus, (F.col("pb") == F.col("nb")) & (F.col("query_id") != F.col("neighbor_id")))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
    )


_LABEL_LSH_TABLE = 9
_LABEL_LSH_PLANES = 2


@register(
    "sim_label_blocked_pairs",
    oracle=f"""
    WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    sig AS (
      SELECT vec_id, label, e,
             {_bucket_sql("e", _LABEL_LSH_TABLE, _LABEL_LSH_PLANES)} AS bucket
      FROM v
    )
    SELECT qa.label AS label, count(*) AS n_close_pairs
    FROM sig qa JOIN sig db
      ON qa.label = db.label AND qa.bucket = db.bucket AND qa.vec_id < db.vec_id
    WHERE {_DOT_SQL} / ({_NORM_SQL.format(v='qa')} * {_NORM_SQL.format(v='db')}) > 0.35
    GROUP BY qa.label
    """,
    tags=("llm", "similarity"),
)
def sim_label_blocked_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup mining: count high-cosine pairs within each
    (label, sign-LSH bucket) block — the embedding-cosine near-dup dedup
    strategy with LSH nested INSIDE the label block.

    Scale: label alone has small constant cardinality, so label-only
    blocking is still O(n^2 / L) — quadratic in corpus size. Nesting the
    deterministic sign-LSH bucket (same md5-derived hyperplanes as the
    other LSH operators, table 9, 2 planes = 4 buckets) into the join key
    divides the pair space by another ~4x and keeps dividing as planes are
    added — that, not the label, is what bounds the join at 100 TB. Recall
    trade: a high-cosine pair whose signs split across a plane is missed
    (collision probability (1 - theta/pi)^planes); production recovers
    recall with multiple OR'd hash tables — same plan shape, one union
    (see ``sim_ann_multitable_lsh``). The oracle mirrors the bucket
    exactly, so the nested blocking itself is what gets certified.
    """
    v = load_parallel(spark, sf_dir, "embeddings").select("vec_id", "label", _vec("embedding").alias("e"))
    sig = v.withColumn("bucket", _bucket_col("e", _LABEL_LSH_TABLE, _LABEL_LSH_PLANES))
    a = sig.select(
        F.col("vec_id").alias("va"),
        F.col("label"),
        F.col("e").alias("ea"),
        F.col("bucket").alias("ba"),
        _norm("e").alias("na"),
    )
    b = sig.select(
        F.col("vec_id").alias("vb"),
        F.col("label").alias("lb"),
        F.col("e").alias("eb"),
        F.col("bucket").alias("bb"),
        _norm("e").alias("nb_"),
    )
    # per-row norms precomputed before the pair join (r17) — bit-identical
    cos = _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb_"))
    return (
        a.join(
            b,
            (F.col("label") == F.col("lb")) & (F.col("ba") == F.col("bb")) & (F.col("va") < F.col("vb")),
        )
        .filter(cos > 0.35)
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_close_pairs"))
    )


_IVF_K = 8
_IVF_DIM = 64
_IVF_DIST_SQL = (
    f"list_sum(list_transform(range(1, {_IVF_DIM + 1}), i -> (v.e[i] - c.c[i]) * (v.e[i] - c.c[i])))"
)


def _ivf_iter_ctes(it: int, prev_c: str) -> str:
    """One unrolled Lloyd iteration as DuckDB CTEs: assign (argmin with the
    same dist-asc, cluster-asc tie-break Spark's array_position gives), then
    per-dim mean rounded to 6 decimals (matching the Spark side's rounding),
    then dense-renumber clusters exactly as the Spark side's sorted-list
    re-index does."""
    return f"""
    d{it} AS (
      SELECT v.vec_id, c.cluster, {_IVF_DIST_SQL} AS dist FROM v, {prev_c} c
    ),
    a{it} AS (
      SELECT vec_id, cluster, dist FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cluster ASC) AS rn
        FROM d{it}
      ) WHERE rn = 1
    ),
    m{it} AS (
      SELECT a.cluster, t.dim, round(avg(v.e[t.dim]), 6) AS mval
      FROM a{it} a JOIN v USING (vec_id) CROSS JOIN range(1, {_IVF_DIM + 1}) t(dim)
      GROUP BY a.cluster, t.dim
    ),
    g{it} AS (SELECT cluster, list(mval ORDER BY dim) AS c FROM m{it} GROUP BY cluster),
    c{it} AS (SELECT CAST(dense_rank() OVER (ORDER BY cluster) - 1 AS INT) AS cluster, c FROM g{it})"""


_IVF_ORACLE = f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    c0 AS (SELECT CAST(vec_id AS INT) AS cluster, e AS c FROM v WHERE vec_id < {_IVF_K}),
    {_ivf_iter_ctes(1, 'c0')},
    {_ivf_iter_ctes(2, 'c1')},
    d3 AS (
      SELECT v.vec_id, c.cluster, {_IVF_DIST_SQL} AS dist FROM v, c2 c
    ),
    a3 AS (
      SELECT vec_id, cluster, dist FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cluster ASC) AS rn
        FROM d3
      ) WHERE rn = 1
    )
    SELECT CAST(cluster AS BIGINT) AS cluster,
           count(*) AS n_vectors,
           round(avg(sqrt(dist)), 6) AS mean_dist
    FROM a3 GROUP BY cluster ORDER BY cluster
"""


def _ivf_assign(df: DataFrame, cents: list) -> DataFrame:
    """Map-side cluster assignment: per-centroid squared distances as
    literal-array folds (d0..d{k-1} columns) + argmin. No shuffle; the
    centroids travel inside the plan as constants (k*dim doubles). Built
    as SQL expression strings (r17): the lambda-Column form paid ~3 py4j
    lambda round trips per centroid to CONSTRUCT the plan — seconds of
    driver time per assignment at k=16 — while expr() parses the same
    functions JVM-side in one call; evaluation (fold order, doubles) is
    identical."""
    dist_cols = [
        F.expr(
            "aggregate(zip_with(e, array("
            + ",".join(repr(float(x)) + "D" for x in ce)
            + "), (a, b) -> (a - b) * (a - b)), 0.0D, (acc, x) -> acc + x)"
        ).alias(f"d{ci}")
        for ci, (_, ce) in enumerate(cents)
    ]
    with_d = df.select("vec_id", "e", *dist_cols)
    arr = F.array(*[F.col(f"d{ci}") for ci in range(len(cents))])
    return with_d.withColumn("cluster", F.array_position(arr, F.array_min(arr)) - 1)


def _ivf_final_centroids(v: DataFrame, k: int = _IVF_K) -> list:
    """The deterministic 2-update Lloyd's loop shared by the IVF build and
    the IVF probe search (both must agree with the same unrolled oracle
    CTEs). Driver state is O(k*dim) only."""
    # k rows only — sorted by vec_id: collect() order is partition/row
    # order, not guaranteed id-ascending, and cluster ids are positional in
    # this list — an unsorted read order would silently permute cluster
    # identity vs the oracle's c0 = vec_id.
    centroids = sorted(
        (r["vec_id"], r["e"]) for r in v.filter(F.col("vec_id") < k).collect()
    )
    for _ in range(2):  # 2 centroid updates; the 3rd iteration only re-assigns
        assigned = _ivf_assign(v, centroids)
        new_cents = (
            assigned.groupBy("cluster")
            # round(…, 6) pins the coordinate to the same decimal DuckDB's
            # round(avg(…), 6) lands on, absorbing partial-agg order drift
            .agg(*[F.round(F.avg(F.element_at(F.col("e"), i + 1)), 6).alias(f"c{i}") for i in range(_IVF_DIM)])
            .collect()
        )
        centroids = [
            (int(r["cluster"]), [r[f"c{i}"] for i in range(_IVF_DIM)])
            for r in sorted(new_cents, key=lambda r: r["cluster"])
        ]
    return centroids


@register("sim_ivf_kmeans_build", oracle=_IVF_ORACLE, tags=("llm", "similarity", "ivf"))
def sim_ivf_kmeans_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index build: distributed Lloyd's k-means (k=8, 3 iterations,
    deterministic init = vectors 0..7), returning cluster sizes + mean
    within-cluster distance — the coarse quantizer an IVF-ANN search probes.

    Oracle: the 3 deterministic Lloyd iterations unroll into DuckDB CTE
    stages (assign = row_number argmin over the per-centroid distances with
    the same tie-break, update = per-dim AVG). Cross-engine fp determinism is
    pinned by (a) folding every distance left-to-right in fp64 on both sides
    (Spark ``aggregate`` ≡ DuckDB ``list_sum``, same trick the cosine oracles
    use) and (b) rounding each updated centroid coordinate to 6 decimals on
    BOTH sides, which absorbs the engines' differing partial-agg summation
    orders (~1e-13 relative drift) before it can perturb the next assignment.

    Scale: each iteration = one broadcast of k centroids (k*dim doubles, KB)
    + one map-side argmin + one groupBy(cluster) avg — no corpus shuffle at
    all until the final small agg. The driver holds only k centroids.
    """
    v = load(spark, sf_dir, "embeddings").select("vec_id", _vec("embedding").alias("e"))
    centroids = _ivf_final_centroids(v)
    assigned = _ivf_assign(v, centroids)

    arr = F.array(*[F.col(f"d{ci}") for ci in range(len(centroids))])
    return (
        assigned.withColumn("min_d", F.array_min(arr))
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg(F.sqrt(F.col("min_d"))), 6).alias("mean_dist"),
        )
        .orderBy("cluster")
    )


_NPROBE = 2

_IVF_PROBE_ORACLE = f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    c0 AS (SELECT CAST(vec_id AS INT) AS cluster, e AS c FROM v WHERE vec_id < {_IVF_K}),
    {_ivf_iter_ctes(1, 'c0')},
    {_ivf_iter_ctes(2, 'c1')},
    d3 AS (
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
    ),
    pairs AS (
      SELECT p.query_id, db.vec_id AS neighbor_id,
             round({_DOT_SQL} / ({_NORM_SQL.format(v='qa')} * {_NORM_SQL.format(v='db')}), 6) AS cosine
      FROM probes p
      JOIN a3 a ON a.cluster = p.cluster AND a.vec_id <> p.query_id
      JOIN v qa ON qa.vec_id = p.query_id
      JOIN v db ON db.vec_id = a.vec_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rk
      FROM pairs
    )
    SELECT query_id, neighbor_id, cosine, rk FROM ranked WHERE rk <= {TOP_K}
"""


@register("sim_ann_ivf_probe", oracle=_IVF_PROBE_ORACLE, tags=("llm", "similarity", "ivf"))
def sim_ann_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe search — the SEARCH half of the IVF index whose build is
    ``sim_ivf_kmeans_build``: each query probes its nprobe={_NPROBE} nearest
    coarse centroids and scores exact cosine only against corpus vectors
    ASSIGNED to those clusters, then top-{TOP_K} re-rank. This is the
    standard IVF-flat ANN query path (coarse quantize -> probe -> re-rank).

    Oracle: the same unrolled 3-iteration Lloyd CTEs as the build (identical
    fp pinning), then probe selection and candidate scoring replayed in SQL
    — so the certified artifact is the full build+search pipeline.

    Scale: centroids are plan literals (k*dim doubles); probe selection is
    a map-side sort of k distances per query; the candidate join is an
    equi-join on cluster id — a keyed shuffle touching ~nprobe/k of the
    corpus per query, the IVF speedup. Driver state stays O(k*dim). At
    production scale the assigned corpus is WRITTEN PARTITIONED BY cluster
    (the inverted file), turning the probe join into partition pruning.
    """
    v = load(spark, sf_dir, "embeddings").select("vec_id", _vec("embedding").alias("e"))
    cents = _ivf_final_centroids(v)
    assigned = _ivf_assign(v, cents).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("e").alias("ne"),
        "cluster",
        _norm("e").alias("nn"),
    )

    qd = _ivf_assign(v.filter(F.col("vec_id") < N_QUERIES), cents)
    # nprobe nearest centroids per query: array_sort over (dist, cluster)
    # structs sorts by dist then cluster — the same asc/asc tie-break the
    # oracle's row_number uses, on bitwise-identical distances.
    dist_structs = F.array(
        *[
            F.struct(F.col(f"d{ci}").alias("dist"), F.lit(ci).alias("cluster"))
            for ci in range(len(cents))
        ]
    )
    q = qd.select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        _norm("e").alias("qn"),
        F.explode(F.slice(F.array_sort(dist_structs), 1, _NPROBE)).alias("p"),
    ).select("query_id", "qe", "qn", F.col("p.cluster").alias("probe_cluster"))

    # per-row norms precomputed before the pair join (r17) — bit-identical
    cos = F.round(_dot(F.col("qe"), F.col("ne")) / (F.col("qn") * F.col("nn")), 6)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        F.broadcast(q)
        .join(
            assigned,
            (F.col("probe_cluster") == F.col("cluster")) & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
    )


sim_ann_ivf_probe.__doc__ = sim_ann_ivf_probe.__doc__.replace("{_NPROBE}", str(_NPROBE)).replace(
    "{TOP_K}", str(TOP_K)
)


@register(
    "embed_diversity_label",
    oracle="""
    WITH v AS (SELECT label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    u AS (
      SELECT label,
             list_transform(e, x -> x / sqrt(list_sum(list_transform(e, y -> y * y)))) AS ue
      FROM v
    ),
    ex AS (
      SELECT label, t.dim, ue[t.dim] AS val
      FROM u CROSS JOIN range(1, 65) t(dim)
    ),
    s AS (SELECT label, dim, sum(val) AS sv FROM ex GROUP BY label, dim),
    agg AS (SELECT label, sum(sv * sv) AS sumsq FROM s GROUP BY label),
    n AS (SELECT label, count(*) AS n_vectors FROM v GROUP BY label)
    SELECT label, n_vectors,
           round((sumsq - n_vectors) / (n_vectors * (n_vectors - 1.0)), 6) AS mean_pairwise_cosine
    FROM agg JOIN n USING (label) ORDER BY label
    """,
    tags=("llm", "similarity", "diversity"),
)
def embed_diversity_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus diversity metric: mean pairwise cosine similarity within each
    label block, in O(n·dim) instead of O(n²·dim).

    The identity: for unit vectors u_i, sum over all ordered pairs i≠j of
    cos(u_i,u_j) equals ||Σu_i||² − n, so the mean pairwise cosine is
    (||Σu||² − n) / (n(n−1)). High values flag near-duplicate-dense or
    mode-collapsed slices of a training corpus without enumerating pairs.

    Scale: THE reason this operator exists — the naive pairwise form is a
    within-label self-join (O(n²) rows); this form is one posexplode + two
    keyed aggregations (shuffle on (label, dim) then label), linear in the
    corpus and embarrassingly partial-aggregable. fp determinism vs the
    oracle: per-row normalization folds identically on both engines; the
    cross-row sums commute up to ~1e-13, absorbed by round(…, 6).
    """
    v = load(spark, sf_dir, "embeddings").select("label", _vec("embedding").alias("e"))
    norm_sq = F.aggregate(F.transform(F.col("e"), lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    u = v.select("label", F.transform(F.col("e"), lambda x: x / F.sqrt(norm_sq)).alias("ue"))
    ex = u.select("label", F.posexplode("ue").alias("dim", "val"))
    s = ex.groupBy("label", "dim").agg(F.sum("val").alias("sv"))
    agg = s.groupBy("label").agg(F.sum(F.col("sv") * F.col("sv")).alias("sumsq"))
    n = v.groupBy("label").agg(F.count(F.lit(1)).alias("n_vectors"))
    return (
        agg.join(n, "label")
        .select(
            "label",
            "n_vectors",
            F.round(
                (F.col("sumsq") - F.col("n_vectors"))
                / (F.col("n_vectors") * (F.col("n_vectors") - F.lit(1.0))),
                6,
            ).alias("mean_pairwise_cosine"),
        )
        .orderBy("label")
    )
