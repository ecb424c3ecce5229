"""The ANN scale experiment's claims, asserted: when the corpus doubles and
the index granularity doubles with it, recall must hold (no >0.05 drop) and
the per-query candidate cost must stay sublinear (~flat, not doubled)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def scale_rows(spark):
    from iceberg_catalog_postgres_spark.llm.ann_scale import sim_ann_scale_recall

    rows = sim_ann_scale_recall(spark, SF_ORACLE).collect()
    by = {(r["method"], r["scale_x"]): r for r in rows}
    assert len(by) == 6
    return by


@pytest.mark.parametrize("method", ["lsh", "ivf", "ivfpq"])
def test_recall_holds_across_doubling(scale_rows, method):
    r1, r2 = scale_rows[(method, 1)], scale_rows[(method, 2)]
    assert r2["corpus_n"] == 2 * r1["corpus_n"]
    assert r2["recall_at_k"] >= r1["recall_at_k"] - 0.05


@pytest.mark.parametrize("method", ["lsh", "ivf", "ivfpq"])
def test_candidates_stay_sublinear(scale_rows, method):
    """Corpus x2, index granularity x2 -> candidates/query ~flat. A
    fixed-granularity index would show ~2x; anything under 1.3x certifies
    the per-query scan FRACTION halved."""
    r1, r2 = scale_rows[(method, 1)], scale_rows[(method, 2)]
    assert r2["avg_candidates"] <= 1.3 * r1["avg_candidates"]
    # and the index is really pruning: candidates are a small corpus fraction
    assert r2["avg_candidates"] < 0.3 * r2["corpus_n"]


def test_exact_rerank_methods_beat_compressed(scale_rows):
    """Sanity on the quality ordering: IVF (exact re-rank inside probed
    clusters) must dominate IVFPQ (ADC-compressed ranking of the same
    candidates) at both scales."""
    for x in (1, 2):
        assert scale_rows[("ivf", x)]["recall_at_k"] >= scale_rows[("ivfpq", x)]["recall_at_k"]
