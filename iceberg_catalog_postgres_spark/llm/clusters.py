"""Duplicate-cluster resolution: near-dup PAIRS -> connected components ->
one keeper per cluster. The step that turns pairwise similarity output into
an actual deduplicated corpus.

Connected components via iterative min-label propagation (a bounded number
of large-star rounds), all in DataFrame ops — no driver-side graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.registry import register


def connected_components(edges: DataFrame, max_iters: int = 10) -> DataFrame:
    """Min-label propagation over undirected edges (doc_a, doc_b) ->
    (doc_id, component) where component = min doc_id reachable.

    Each round every node adopts the smallest label among itself and its
    neighbors; converges in O(diameter) rounds (dup clusters are near-
    cliques, so 2-3 rounds in practice; max_iters bounds pathological
    chains).

    Scale: each round is one groupBy(node).min(label) over the edge list —
    a keyed shuffle of |E| rows; no adjacency ever materializes on the
    driver. localCheckpoint every round truncates the growing lineage so
    the plan doesn't deepen linearly with iterations (SURVEY §7: avoid
    driver-side state, keep iterations executor-bound).
    """
    sym = edges.selectExpr("doc_a AS src", "doc_b AS dst").unionByName(
        edges.selectExpr("doc_b AS src", "doc_a AS dst")
    )
    labels = (
        sym.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("component", F.col("doc_id"))
    )
    for _ in range(max_iters):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.doc_id)
            .groupBy(F.col("src").alias("doc_id"))
            .agg(F.min("component").alias("nbr_min"))
        )
        # ONE materialization per round (r17): the changed flag rides the
        # label-update projection into the eager checkpoint, so the
        # convergence check is a scan of the checkpointed blocks — before,
        # the round ran the update pipeline twice (once under a
        # new-vs-old join for the changed count, once for the checkpoint).
        cand = (
            labels.join(neighbor_min, "doc_id", "left_outer")
            .select(
                "doc_id",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("__new"),
                "component",
            )
            .select(
                "doc_id",
                F.col("__new").alias("component"),
                (F.col("__new") != F.col("component")).alias("__chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = cand.where(F.col("__chg")).limit(1).count()
        labels = cand.drop("__chg")
        if changed == 0:
            break
    return labels


def _cluster_oracle() -> str:
    """DuckDB twin: the SAME MinHash pair SQL feeds a recursive-CTE
    transitive closure; component = min reachable doc_id — exactly what
    min-label propagation converges to. (Closure is O(n·|component|) rows —
    fine for an oracle at sf0.01; the Spark side stays iterative/bounded.)"""
    from iceberg_catalog_postgres_spark.llm.dedup import _minhash_oracle

    return f"""
    WITH RECURSIVE pairs AS (
      {_minhash_oracle()}
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach AS (
      SELECT src, src AS dst FROM (SELECT DISTINCT src FROM edges)
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    labels AS (SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY src)
    SELECT CAST(component AS BIGINT)  AS component,
           count(*)                   AS cluster_size,
           min(doc_id)                AS keeper_doc_id,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS members
    FROM labels GROUP BY component
    """


@register("dedup_cluster_resolution", oracle=_cluster_oracle(), tags=("llm", "dedup", "clusters"))
def dedup_cluster_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup resolution: MinHash-LSH pairs -> connected
    components -> keeper (min doc_id) per cluster -> cluster roster.

    Oracle-checked (round-2 upgrade from rows-only): DuckDB recomputes the
    identical pair set and resolves components via recursive-CTE transitive
    closure; additionally pinned by tests/test_clusters.py against a
    pure-Python union-find. Output: one row per cluster with size/members.
    """
    from iceberg_catalog_postgres_spark.llm.dedup import dedup_minhash_lsh

    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    comps = connected_components(pairs)
    return (
        comps.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.min("doc_id").alias("keeper_doc_id"),
            F.array_join(F.sort_array(F.collect_set("doc_id")), ",").alias("members"),
        )
        .orderBy("component")
    )
