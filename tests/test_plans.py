"""Plan-shape assertions: correctness tests prove the numbers; these prove
the PLANS are the ones that survive a 100x scale-up (SURVEY §4)."""

from __future__ import annotations

from iceberg_catalog_postgres_spark.plans.audit import plan_features
from iceberg_catalog_postgres_spark.registry import load_all

REGISTRY = load_all()


def test_q6_filters_pushed_and_pruned(spark, sf_oracle):
    """q6: all predicates reach the parquet scan; only 4 columns read."""
    df = REGISTRY["q6_forecast_revenue"].fn(spark, sf_oracle)
    f = plan_features(df)
    assert f["pushed_filters"], "predicates must reach the scan"
    # (wholestage_codegen is only visible in the post-execution AQE plan,
    # so it is reported by plan_features but not asserted here)
    assert max(f["read_schema_columns"]) <= 4, f"column pruning failed: {f['read_schema_columns']}"


def test_q5_broadcasts_dims(spark, sf_oracle):
    """q5: nation/region joins must be broadcast, never sort-merge."""
    f = plan_features(REGISTRY["q5_local_supplier_volume"].fn(spark, sf_oracle))
    assert f["broadcast_joins"] >= 2
    assert f["cartesian_products"] == 0


def test_q3_uses_top_k_not_global_sort(spark, sf_oracle):
    """q3: ORDER BY + LIMIT must plan as TakeOrderedAndProject."""
    f = plan_features(REGISTRY["q3_shipping_priority"].fn(spark, sf_oracle))
    assert f["take_ordered"]


def test_minhash_no_cartesian(spark, sf_oracle):
    """LSH candidate generation must never degrade to a cross product."""
    f = plan_features(REGISTRY["dedup_minhash_lsh"].fn(spark, sf_oracle))
    assert f["cartesian_products"] == 0


def test_partitioned_source_prunes(spark, sf_oracle):
    """Partition-column filter must become PartitionFilters (planning-time
    directory pruning), not a data filter."""
    f = plan_features(REGISTRY["source_partitioned_pruning"].fn(spark, sf_oracle))
    assert f["partition_filters"]


def test_brute_topk_broadcasts_queries(spark, sf_oracle):
    """Similarity brute force: the query side must broadcast (corpus never
    shuffles)."""
    f = plan_features(REGISTRY["sim_cosine_topk_brute"].fn(spark, sf_oracle))
    assert f["broadcast_joins"] >= 1


def test_bucketed_join_has_no_exchange_on_join_sides(spark, sf_oracle):
    """Co-bucketed tables must join without shuffling either side: at most
    the final aggregation exchange appears in the plan."""
    from iceberg_catalog_postgres_spark.plans.audit import explain_formatted

    df = REGISTRY["bucketed_colocated_join"].fn(spark, sf_oracle)
    plan = explain_formatted(df)
    import re

    # exchanges before the SortMergeJoin would mean bucketing didn't engage;
    # allow only the post-join aggregation exchange
    join_pos = plan.find("SortMergeJoin")
    assert join_pos != -1 or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
    pre_join = plan[:join_pos] if join_pos != -1 else plan
    ex_count = len(re.findall(r"\(\d+\) Exchange", plan))
    assert ex_count <= 1, f"expected <=1 exchange (final agg), got {ex_count}\n{plan[:2000]}"


def test_datasource_api_reads_all_rows_exactly_once(spark, sf_oracle):
    """Custom DataSource partition bucketing must cover every pointer row
    exactly once across partitions."""
    out = REGISTRY["source_datasource_api_pointers"].fn(spark, sf_oracle)
    rows = {(r["table_namespace"]): (r["n_tables"], r["n_with_metadata"]) for r in out.collect()}
    assert rows == {"ns_a": (2, 2), "ns_b": (3, 3)}


def test_multiprobe_lsh_is_equi_join(spark, sf_oracle):
    """Multi-probe's bit_count(xor)<=1 predicate must plan as the probe-
    explode EQUI-join (keyed shuffle or broadcast), never a BNLJ/cartesian:
    that rewrite is the entire scale argument of the operator."""
    f = plan_features(REGISTRY["sim_ann_lsh_multiprobe"].fn(spark, sf_oracle))
    assert f["cartesian_products"] == 0


def test_ivf_probe_broadcasts_queries_no_cartesian(spark, sf_oracle):
    """IVF probe search: the probe side (queries x nprobe rows) broadcasts;
    the assigned corpus is scanned, never crossed."""
    f = plan_features(REGISTRY["sim_ann_ivf_probe"].fn(spark, sf_oracle))
    assert f["broadcast_joins"] >= 1
    assert f["cartesian_products"] == 0


def test_corpus_pipeline_single_scan(spark, sf_oracle):
    """The fused corpus pipeline must read documents exactly ONCE in the
    static plan (the round-3 verdict's triple-scan defect, fixed by gating
    the dedup hash instead of filtering + eager counts)."""
    from iceberg_catalog_postgres_spark.plans.audit import explain_formatted

    df = REGISTRY["llm_corpus_pipeline"].fn(spark, sf_oracle)
    tree = explain_formatted(df).split("\n\n", 1)[0]  # operator tree only
    assert tree.count("Scan parquet") == 1, f"documents must be scanned exactly once\n{tree}"


def test_oversized_triage_single_scan_and_broadcast(spark, sf_oracle):
    """Bucket triage: one documents scan (content hash rides the band rows)
    and the oversized-key probe is a broadcast join."""
    from iceberg_catalog_postgres_spark.plans.audit import explain_formatted

    df = REGISTRY["dedup_lsh_oversized_triage"].fn(spark, sf_oracle)
    f = plan_features(df)
    assert f["broadcast_joins"] >= 1
    assert f["cartesian_products"] == 0
    # the scan subtree may appear twice pre-AQE (bands + oversized keys both
    # derive from it) but both branches hang off the same repartition
    # exchange, so runtime reuses it; what must NOT appear is a third read
    # for the content hashes (the pre-fix shape).
    tree = explain_formatted(df).split("\n\n", 1)[0]  # operator tree only
    assert tree.count("Scan parquet") <= 2, tree


def test_catalog_mor_merge_read_plan(spark, sf_oracle):
    """The catalog bench headline's READ must apply deletion vectors as a
    broadcast anti-join (never a shuffle join against the tombstones) and
    plan zero cartesian products."""
    f = plan_features(REGISTRY["catalog_mor_merge_read"].fn(spark, sf_oracle))
    assert f["broadcast_joins"] >= 1
    assert f["cartesian_products"] == 0


def test_catalog_sql_select_plan(spark, sf_oracle):
    """The SQL SELECT front-end must add zero plan cost: four reads of the
    same catalog table (current + two pinned snapshots + metadata) union
    with no cartesian product and no sort-merge join — the temp-view
    resolution reuses the same to_df scan plans the Python API produces."""
    f = plan_features(REGISTRY["catalog_sql_select"].fn(spark, sf_oracle))
    assert f["cartesian_products"] == 0
    assert f["sort_merge_joins"] == 0


def test_catalog_sql_alter_evolution_plan(spark, sf_oracle):
    """Reading a renamed+widened+defaulted table through SQL plans as the
    cohort union (no join machinery at all)."""
    f = plan_features(REGISTRY["catalog_sql_alter_evolution"].fn(spark, sf_oracle))
    assert f["cartesian_products"] == 0
    assert f["broadcast_joins"] == 0 and f["sort_merge_joins"] == 0
