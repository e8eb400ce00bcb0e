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


def _persistent_rdd_ids(spark) -> set[int]:
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())


def test_cc_default_retain_is_fully_reclaimable(spark):
    """retain='cache' (default): after the result is consumed, one
    clearCache() reclaims EVERYTHING the call persisted — no checkpoint
    blocks survive it (VERDICT r6 'wrong' #2: pre-r7 each CC call leaked
    one clearCache-immune localCheckpoint RDD for the session's life)."""
    edges = [(1, 2), (2, 3), (10, 11)]
    for kwargs in ({}, {"skew_safe": True}):
        spark.catalog.clearCache()
        for rid in _persistent_rdd_ids(spark):  # isolate from other tests
            rdd = spark.sparkContext._jsc.getPersistentRDDs().get(rid)
            if rdd is not None:
                rdd.unpersist(False)
        e = spark.createDataFrame(edges, ["src", "dst"])
        labels = connected_components(e, **kwargs)
        got = {r["node"]: r["cluster_id"] for r in labels.collect()}
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}, kwargs
        # the cached copy is visible to the SQL cache manager...
        assert labels.storageLevel.useMemory or labels.storageLevel.useDisk
        # ...and a plain clearCache reclaims the whole call
        spark.catalog.clearCache()
        assert _persistent_rdd_ids(spark) == set(), kwargs
        # after reclaim the frame is dead-or-correct: its checkpoint
        # inputs were freed at publish, so a re-collect either raises
        # CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND or — because unpersist is
        # asynchronous and blocks may linger — still serves the SAME
        # labels. What it may never do is silently recompute
        # wrong/partial labels.
        try:
            again = {r["node"]: r["cluster_id"] for r in labels.collect()}
        except Exception as ex:  # noqa: BLE001 — the expected dead path
            assert "CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND" in str(ex), kwargs
        else:
            assert again == got, kwargs


def test_cc_retain_checkpoint_keeps_blocks(spark):
    """retain='checkpoint' preserves the pre-r7 contract: the final
    labels stay materialized as localCheckpoint blocks (executor-loss
    safe), re-collectable after clearCache, reclaimed only by an
    sc-level sweep."""
    spark.catalog.clearCache()
    e = spark.createDataFrame([(1, 2)], ["src", "dst"])
    labels = connected_components(e, retain="checkpoint")
    got = {r["node"]: r["cluster_id"] for r in labels.collect()}
    assert got == {1: 1, 2: 1}
    spark.catalog.clearCache()
    # blocks survive the SQL-cache clear and the frame stays live
    assert {r["node"] for r in labels.collect()} == {1, 2}
    leftover = _persistent_rdd_ids(spark)
    assert leftover, "checkpoint mode should retain final-label blocks"
    for rid in leftover:  # sc-level sweep (what bench.py does)
        rdd = spark.sparkContext._jsc.getPersistentRDDs().get(rid)
        if rdd is not None:
            rdd.unpersist(False)
