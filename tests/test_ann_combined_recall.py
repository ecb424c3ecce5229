"""r4 brief item 6: the composed multi-table x multi-probe ANN eval must
reach the stated recall target at fixture scale (the knobs: N_TABLES=4
stored signatures, COMBINED_PROBE_MASKS=5 probes per table)."""

from __future__ import annotations

from iceberg_catalog_postgres_spark.llm.ann_multitable import sim_ann_combined_recall


def test_combined_recall_meets_target(spark, sf_oracle):
    pdf = sim_ann_combined_recall(spark, sf_oracle).toPandas()
    assert len(pdf) == 10  # one row per query vector
    mean = pdf["recall_at_k"].mean()
    assert mean >= 0.8, f"combined recall@5 {mean:.3f} below the 0.8 target"
