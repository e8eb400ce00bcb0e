"""Property test: connected_components (both paths) vs a reference
union-find on random graphs — the chain/ring/hub unit tests pin known
shapes; this pins arbitrary ones (SURVEY §5.4 property-test strategy)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from bucket_to_bigquery_spark.operators.graph import connected_components


def _union_find(n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = {i: i for i in range(n_nodes)}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component id = min member id
    comp: dict[int, list[int]] = {}
    for i in range(n_nodes):
        comp.setdefault(find(i), []).append(i)
    return {i: min(members) for members in comp.values() for i in members}


edge_lists = st.lists(
    st.tuples(st.integers(0, 24), st.integers(0, 24)),
    min_size=0, max_size=40,
)


@settings(max_examples=6, deadline=None)
@given(edge_lists)
def test_cc_matches_union_find_on_random_graphs(spark, edges):
    n = 25
    expected = _union_find(n, edges)
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["node"])
    if edges:
        e = spark.createDataFrame(edges, ["src", "dst"])
    else:
        e = spark.createDataFrame([], "src long, dst long")
    for kwargs in ({}, {"skew_safe": True}):
        got = {
            r["node"]: r["cluster_id"]
            for r in connected_components(e, nodes=nodes, **kwargs).collect()
        }
        assert got == expected, (kwargs, sorted(edges)[:10])
