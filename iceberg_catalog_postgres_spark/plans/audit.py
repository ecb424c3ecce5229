"""Physical-plan audit utilities: assert that the plans we ship are the
plans we want (pushdown reached the scan, dims actually broadcast, no
accidental cartesian products, codegen engaged).

Used by tests/test_plans.py; also handy interactively:
    from iceberg_catalog_postgres_spark.plans.audit import plan_features
    plan_features(df)  ->  {"pushed_filters": True, "broadcast_joins": 2, ...}
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def plan_features(df: DataFrame) -> dict:
    """Extract the scale-relevant features from the formatted physical plan."""
    plan = explain_formatted(df)
    return {
        "pushed_filters": bool(re.search(r"PushedFilters: \[(?!\])", plan)),
        "partition_filters": bool(re.search(r"PartitionFilters: \[(?!\])", plan)),
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan)),
        "sort_merge_joins": len(re.findall(r"SortMergeJoin", plan)),
        "shuffled_hash_joins": len(re.findall(r"ShuffledHashJoin", plan)),
        "cartesian_products": len(re.findall(r"CartesianProduct", plan)),
        "exchanges": len(re.findall(r"\bExchange\b|\bAQEShuffleRead\b", plan)),
        "wholestage_codegen": bool(re.search(r"WholeStageCodegen", plan)),
        "take_ordered": bool(re.search(r"TakeOrderedAndProject", plan)),
        "read_schema_columns": _read_schema_width(plan),
    }


def _read_schema_width(plan: str) -> list[int]:
    """Number of columns each scan actually reads (column-pruning check)."""
    widths = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        body = m.group(1).strip()
        widths.append(0 if not body else body.count(",") + 1)
    return widths
