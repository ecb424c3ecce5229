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


def bucket_col(e_col, table: int, n_planes: int):
    """Spark Column: bucket id in [0, 2^n_planes) for vector column e_col."""
    from pyspark.sql import functions as F

    total = F.lit(0)
    for j in range(n_planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane(table, j)])
        proj = F.aggregate(
            F.zip_with(e_col, lit_plane, lambda a, b: a * b), F.lit(0.0), lambda s, x: s + x
        )
        total = total + F.when(proj > 0, F.lit(2**j)).otherwise(F.lit(0))
    return total


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
