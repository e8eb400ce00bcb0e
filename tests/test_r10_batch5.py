"""Behavioral + plan pins for the fifth r10 batch (graphs.py /
linkage.py) beyond the automatic oracle-parity rows.

The PageRank pin replays all five iterations in pure-Python integer
arithmetic — the scaled-int contract means the engine result must match
the replay EXACTLY, not approximately; the triangle pin recounts by
brute force over the edge set.
"""

from __future__ import annotations

import re
from collections import defaultdict
from itertools import combinations

from bucket_to_bigquery_spark.queries import all_queries
from bucket_to_bigquery_spark.queries.registry import tables

QUERIES = all_queries()


def _run(name, spark, sf_dir):
    return QUERIES[name].builder(spark, sf_dir)


def _plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name].builder(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def _undirected_edges(spark, sf_dir):
    """The q78-family graph, re-derived independently: part pairs
    co-ordered in >= 2 distinct orders."""
    from bucket_to_bigquery_spark.queries.graphs import _MIN_COOC

    rows = (
        tables(spark, sf_dir)["lineitem"]
        .select("l_orderkey", "l_partkey").distinct().collect()
    )
    baskets = defaultdict(set)
    for r in rows:
        baskets[r.l_orderkey].add(r.l_partkey)
    cooc: dict[tuple, int] = defaultdict(int)
    for parts in baskets.values():
        for u, v in combinations(sorted(parts), 2):
            cooc[(u, v)] += 1
    return {e for e, c in cooc.items() if c >= _MIN_COOC}


# ---------------------------------------------------------------------------
# q78 — integer-contract PageRank
# ---------------------------------------------------------------------------


def test_q78_matches_integer_replay(spark, sf_dir):
    """Replay all 5 iterations in Python ints: the scaled-int contract
    promises EXACT equality with the engine, per node."""
    from bucket_to_bigquery_spark.queries.graphs import _ITERS, _S

    und = _undirected_edges(spark, sf_dir)
    out_edges = defaultdict(list)
    for u, v in und:
        out_edges[u].append(v)
        out_edges[v].append(u)
    deg = {n: len(vs) for n, vs in out_edges.items()}
    n_nodes = len(deg)
    r = {n: _S // n_nodes for n in deg}
    base = (15 * _S) // (100 * n_nodes)
    for _ in range(_ITERS):
        s: dict = defaultdict(int)
        for u, vs in out_edges.items():
            c = r[u] // deg[u]
            for v in vs:
                s[v] += c
        r = {n: base + (85 * s[n]) // 100 for n in deg}

    got = _run("q78_pagerank", spark, sf_dir).collect()
    assert len(got) == n_nodes
    for row in got:
        assert row.deg == deg[row.part], row
        assert row.pr_e12 == r[row.part], row


def test_q78_mass_conservation_bound(spark, sf_dir):
    """Total mass stays within the floor-leak bound: each division
    leaks < 1 unit, bounded per round by (#directed edges + #nodes);
    the damping base re-injects 0.15 exactly. Sanity: sum in
    ((1-leak)·S, S], every rank >= the base term."""
    from bucket_to_bigquery_spark.queries.graphs import _ITERS, _S

    got = _run("q78_pagerank", spark, sf_dir).collect()
    n_nodes = len(got)
    n_directed = sum(r.deg for r in got)
    total = sum(r.pr_e12 for r in got)
    leak_bound = _ITERS * (n_directed + 2 * n_nodes + 100)
    assert _S - leak_bound <= total <= _S, (total, leak_bound)
    base = (15 * _S) // (100 * n_nodes)
    assert all(r.pr_e12 >= base for r in got)


def test_q78_iteration_constant_size_plan(spark, sf_dir):
    """r16 shape: each iteration localCheckpoints its ranks, so the
    returned frame is a CONSTANT-SIZE read of the final checkpoint
    (Scan ExistingRDD) instead of the old 5-deep unrolled
    nested-broadcast plan — no per-iteration self-join re-run, no
    cartesian, no SMJ can appear in the final plan by construction."""
    plan = _plan(spark, sf_dir, "q78_pagerank")
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    # constant-size: one scan + order-by, nothing iterative left
    assert plan.count("Exchange") <= 2


# ---------------------------------------------------------------------------
# q78b — triangle count
# ---------------------------------------------------------------------------


def test_q78b_matches_bruteforce(spark, sf_dir):
    """Recount triangles/wedges by brute force over the independently
    re-derived edge set; gcc_e6 must reproduce by integer division."""
    und = _undirected_edges(spark, sf_dir)
    adj = defaultdict(set)
    for u, v in und:
        adj[u].add(v)
        adj[v].add(u)
    # count each triangle once: canonical edge (u<v) + common neighbor w>v
    tri = sum(1 for u, v in und for w in (adj[u] & adj[v]) if w > v)
    wedges = sum(d * (d - 1) // 2 for d in (len(s) for s in adj.values()))
    row = _run("q78b_triangle_count", spark, sf_dir).collect()
    assert len(row) == 1
    r = row[0]
    assert r.n_nodes == len(adj)
    assert r.n_edges == len(und)
    assert r.n_wedges == wedges
    assert r.n_triangles == tri
    assert r.gcc_e6 == (3 * tri * 1_000_000) // wedges


# ---------------------------------------------------------------------------
# q79 — sorted-neighborhood linkage
# ---------------------------------------------------------------------------


def test_q79_finds_all_adjacent_exact_duplicates(spark, sf_dir):
    """Completeness at the guarantee boundary: every same-name pair
    that sits within lead-2 of each other in its block's sort order
    MUST be emitted with dist 0; and emitted pairs reproduce under an
    independent neighbor walk."""
    from bucket_to_bigquery_spark.queries.linkage import _LEADS, _MAX_DIST

    parts = tables(spark, sf_dir)["part"].select("p_partkey", "p_name").collect()
    blocks = defaultdict(list)
    for r in parts:
        blocks[r.p_name.split(" ")[1]].append((r.p_name, r.p_partkey))
    expect = {}
    for rows in blocks.values():
        rows.sort()
        for i, (name_a, pk_a) in enumerate(rows):
            for j in _LEADS:
                if i + j < len(rows):
                    name_b, pk_b = rows[i + j]
                    d = _levenshtein(name_a, name_b)
                    if d <= _MAX_DIST:
                        expect[(pk_a, pk_b)] = d
    got = {(r.part_a, r.part_b): r.dist
           for r in _run("q79_sorted_neighborhood_linkage", spark, sf_dir).collect()}
    assert got == expect
    assert any(d == 0 for d in got.values())  # exact dups exist in corpus


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_q79_single_block_shuffle_one_window(spark, sf_dir):
    """Blocking is the scale story: exactly ONE hash exchange (the
    block key) and ONE window pass — the per-lead UNION formulation
    that replays the window lineage per branch is the regression this
    pin guards. No single-partition global sort window, no joins."""
    plan = _plan(spark, sf_dir, "q79_sorted_neighborhood_linkage")
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    assert plan.count("Window [") == 1, plan
    assert "Join" not in plan
