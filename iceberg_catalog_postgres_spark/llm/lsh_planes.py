"""Deterministic random-hyperplane generation for sign-LSH, shared by the
Spark implementations and their DuckDB oracles.

The planes are +-1 vectors derived from md5("t-j-i") at PLAN-BUILD time and
embedded as literal arrays — so they are (a) genuinely pseudo-random and
independent across planes/tables, (b) bit-identical in both engines, and
(c) constants the optimizer folds (the projection is one zip_with against a
literal array, no per-row hashing).

Why not an inline integer-parity formula: any LINEAR mixer mod 2 collapses
to an XOR of its inputs' parities, making every "plane" the same hyperplane
(possibly flipped) — zero diversity, which silently destroys multi-plane and
multi-table LSH. (Found empirically: multi-table recall identical to
single-table.) md5 is nonlinear; problem gone.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

DIM = 64


@lru_cache(maxsize=None)
def plane(table: int, j: int) -> tuple[int, ...]:
    """The +-1 hyperplane for (table, plane j)."""
    return tuple(
        1 if int(hashlib.md5(f"{table}-{j}-{i}".encode()).hexdigest()[0], 16) % 2 else -1
        for i in range(DIM)
    )


def bucket_col(e_sql, table: int, n_planes: int):
    """Spark Column: bucket id in [0, 2^n_planes) for the vector column
    named/expressed by ``e_sql`` (a SQL string, e.g. "e"). Built as ONE
    parsed SQL expression (r17): the per-plane lambda-Column form paid ~3
    py4j lambda round trips per plane just to construct the plan; expr()
    parses the same aggregate/zip_with functions JVM-side in one call.
    Evaluation — fold order, doubles, sign test — is identical. A Column
    argument (the pre-r17 signature) is rejected loudly."""
    from pyspark.sql import functions as F

    if not isinstance(e_sql, str):
        raise TypeError("bucket_col takes the vector column as a SQL string, e.g. 'e'")
    terms = []
    for j in range(n_planes):
        arr = ",".join(repr(float(x)) + "D" for x in plane(table, j))
        proj = (
            f"aggregate(zip_with({e_sql}, array({arr}), (a, b) -> a * b), "
            f"0.0D, (s, x) -> s + x)"
        )
        terms.append(f"(CASE WHEN {proj} > 0.0D THEN {2 ** j} ELSE 0 END)")
    return F.expr("(" + " + ".join(terms) + ")")


def bucket_sql(e_expr: str, table: int, n_planes: int) -> str:
    """DuckDB SQL expression computing the identical bucket id."""
    terms = []
    for j in range(n_planes):
        lit = "[" + ", ".join(f"{float(x)}" for x in plane(table, j)) + "]"
        proj = (
            f"list_sum(list_transform(range(1, {DIM + 1}), "
            f"i -> {e_expr}[i] * ({lit})[i]))"
        )
        terms.append(f"(CASE WHEN {proj} > 0 THEN {2**j} ELSE 0 END)")
    return " + ".join(terms)
