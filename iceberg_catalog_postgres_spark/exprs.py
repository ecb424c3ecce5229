"""Shared Column -> SQL-text rendering (r18, consolidating the r17
triplicates ``similarity._col_ref_sql`` / ``ann_scale._ref_sql`` /
``table._col_sql``).

Why this exists: building higher-order-function expressions (aggregate /
transform / zip_with) from lambda Columns costs ~3 py4j round trips PER
lambda at plan-build time — seconds of driver time for a 16-centroid
distance block. Rendering the input column as SQL text and parsing the
whole expression JVM-side with ``F.expr`` is one round trip. The render
itself relies on a private surface (``Column._jc.node().sql()`` on Spark 4,
``expr().sql()`` earlier), so every caller MUST keep a lambda-Column
fallback for the ``None`` case — a silently-lost render must degrade to the
slower identical-result build, never to an error (ADVICE r17).
"""

from __future__ import annotations


def col_ref_sql(c) -> str | None:
    """SQL text of a Column (strings pass through); None when the Column
    cannot be rendered — callers fall back to the lambda-Column build."""
    if isinstance(c, str):
        return c
    try:
        jc = c._jc
        try:
            return jc.node().sql()
        except Exception:
            return jc.expr().sql()
    except Exception:
        return None
