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


def test_ivfsq8_recall_floor_and_candidate_fraction(spark):
    """IVF+SQ8 (r9): recall floor at both scales, and the partitioner's
    scale story — candidates/query stays ~flat as the corpus doubles
    (k doubles with it), so the scanned fraction HALVES."""
    from iceberg_catalog_postgres_spark.llm.sq8 import sim_ann_ivfsq8_recall

    rows = {r.scale_x: r for r in sim_ann_ivfsq8_recall(
        spark, "/root/testdata/sf0.001"
    ).collect()}
    assert set(rows) == {1, 2}
    for sx, r in rows.items():
        # nprobe=2 IVF misses are expected; 0.8 is the measured floor with
        # margin (0.84-0.96 across sf0.001/sf0.01 at both scales)
        assert r.recall_at_k >= 0.8, (
            f"IVF+SQ8 recall collapsed at {sx}x: {r.recall_at_k}"
        )
        # the ADC never scans the whole corpus: candidate fraction < 1/2
        assert r.avg_candidates < r.corpus_n / 2
    assert rows[2].corpus_n == 2 * rows[1].corpus_n
    # flat candidates at 2x data => scan fraction halves
    assert rows[2].avg_candidates < 1.5 * rows[1].avg_candidates


def test_bq_recall_floor_and_two_stage_shape(spark):
    """BQ (r9): recall floor at both scales over the rescored two-stage
    pipeline, candidate budget fixed at 8k per query — the 8-byte/vec
    end of the quantization family."""
    from iceberg_catalog_postgres_spark.llm.bq import _RESCORE, sim_ann_bq_hamming_recall

    rows = {r.scale_x: r for r in sim_ann_bq_hamming_recall(
        spark, "/root/testdata/sf0.001"
    ).collect()}
    assert set(rows) == {1, 2}
    for sx, r in rows.items():
        # 1-bit on a near-isotropic synthetic corpus: 0.5 is the measured
        # floor with margin (0.60-0.74 across sf0.001/sf0.01, both scales)
        assert r.recall_at_k >= 0.5, f"BQ recall collapsed at {sx}x: {r.recall_at_k}"
        assert r.rescored_per_query == _RESCORE
        # the rescore budget stays a small corpus fraction (two-stage win)
        assert _RESCORE <= r.corpus_n // 10
    assert rows[2].corpus_n == 2 * rows[1].corpus_n
