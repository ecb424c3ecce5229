"""SQ8 scalar-quantized ADC (r8): quality floor beyond oracle parity —
absmax int8 with full-precision queries should be near-exact for L2
ranking, at BOTH corpus scales."""

from __future__ import annotations


def test_sq8_recall_floor_both_scales(spark):
    from iceberg_catalog_postgres_spark.llm.sq8 import sim_ann_sq8_adc_recall

    rows = {r.scale_x: r for r in sim_ann_sq8_adc_recall(
        spark, "/root/testdata/sf0.001"
    ).collect()}
    assert set(rows) == {1, 2}
    for sx, r in rows.items():
        assert r.recall_at_k >= 0.9, (
            f"SQ8 recall collapsed at {sx}x: {r.recall_at_k}"
        )
        assert r.bytes_per_vec == 68
    assert rows[2].corpus_n == 2 * rows[1].corpus_n
