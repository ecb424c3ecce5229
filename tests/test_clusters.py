"""Connected-components correctness: the distributed min-label propagation
must produce exactly the components a pure-Python union-find computes on the
same edge list."""

from __future__ import annotations

from iceberg_catalog_postgres_spark.llm.clusters import connected_components
from iceberg_catalog_postgres_spark.registry import load_all

REGISTRY = load_all()


def _union_find(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_components_match_union_find(spark, sf_oracle):
    pairs_df = REGISTRY["dedup_minhash_lsh"].fn(spark, sf_oracle).select("doc_a", "doc_b")
    edges = [(r["doc_a"], r["doc_b"]) for r in pairs_df.collect()]
    assert edges, "fixture should contain near-dup pairs"

    expected = _union_find(edges)
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(pairs_df).collect()
    }
    assert got == expected


def test_synthetic_chain_converges(spark):
    """A 6-node path graph — worst case for label propagation (diameter 5)."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11)], "doc_a long, doc_b long"
    )
    got = {r["doc_id"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1, 10: 10, 11: 10}
