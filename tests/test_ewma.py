"""ts_ewma_bounded semantics: the windowed fold equals the explicit
weights-normalized EWMA over the last-12 observations (pandas
ewm(adjust=True) restricted to the frame), per series, including short
leading frames."""

from __future__ import annotations

from iceberg_catalog_postgres_spark.registry import load_all
from tests.conftest import SF_SMOKE


def _expected(series: list[float], decay: float = 0.5, frame: int = 12):
    out = []
    for i in range(len(series)):
        window = series[max(0, i - frame + 1) : i + 1]
        n = len(window)
        num = sum(x * decay ** (n - 1 - j) for j, x in enumerate(window))
        den = sum(decay**k for k in range(n))
        out.append(round(num / den, 6))
    return out


def test_ewma_matches_reference_loop(spark):
    df = load_all()["ts_ewma_bounded"].fn(spark, SF_SMOKE)
    rows = df.orderBy("event_type", "bucket_start").collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    assert len(by_type) == 5
    for et, rs in by_type.items():
        series = [float(r["n_events"]) for r in rs]
        exp = _expected(series)
        got = [r["ewma"] for r in rs]
        assert got == exp, f"{et}: first diff at {next(i for i,(a,b) in enumerate(zip(got,exp)) if a!=b)}"
        # first point: EWMA of a single observation is the observation
        assert abs(rs[0]["ewma"] - series[0]) < 1e-9
