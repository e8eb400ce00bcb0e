"""STAGED r17+ surface (built late r13, NOT registered — GATE_r13.md's
round-17 note budgets the slot) — q146: BFS hop distance over the
co-purchase part graph — multi-source breadth-first search from the
seed parts (p_partkey < 5) over edges "parts co-occur in ≥ 2 orders",
reporting every reachable part's exact hop count within 4 hops. The
shortest-path primitive the graph family lacks (q78 PageRank scores
global importance; q78b counts triangles; q132 labels components —
none yields DISTANCES).

Cross-paradigm verification (the q132 precedent): Spark runs the
ITERATIVE frontier-expansion loop (4 bounded join rounds, first-visit
= minimum hop by the BFS invariant); the DuckDB oracle computes the
same function as a RECURSIVE CTE over (node, hop) pairs reduced by
min(hop). Hash equality pins the iterative distributed algorithm
against the recursive SQL fixpoint.

Reference parity: n/a — no analytics surface in the reference;
declared engine surface (SURVEY §2.C extension when registered).

Determinism: edges are exact support counts (≥ 2) over distinct
(order, part) incidences; hop counts are exact integers; the result
is seed-set → min-hop, independent of traversal order. Ordered by
p_partkey.

Scale design (100 TB): edges come from the per-basket self-join
(Σ C(L,2), basket-bounded — the q138 shape), built ONCE and cached;
each BFS round is one equi-join of the CURRENT FRONTIER (not the
graph) against the edge frame plus an anti-join against the visited
set — the standard distributed BFS where per-round cost tracks
frontier size, with the hop bound (4) capping the rounds. The
recursive CTE is ORACLE-side only (test scale): its worst case
enumerates every (node, hop) pair, which is exactly the
single-machine formulation the distributed loop exists to replace.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query, tables

_MIN_SUPPORT = 2
_MAX_HOPS = 4
_SEED_KEY_BOUND = 5  # seed set: p_partkey < 5 (a KEY bound, not a count)

_Q146_ORACLE = (
    "WITH RECURSIVE items AS (SELECT DISTINCT l_orderkey AS o, "
    "l_partkey AS p FROM lineitem), "
    "pairs AS (SELECT a.p AS pa, b.p AS pb, "
    "CAST(count(*) AS BIGINT) AS c FROM items a "
    "JOIN items b ON a.o = b.o AND a.p < b.p GROUP BY a.p, b.p), "
    f"ed AS (SELECT pa AS a, pb AS b FROM pairs WHERE c >= {_MIN_SUPPORT} "
    f"UNION ALL SELECT pb, pa FROM pairs WHERE c >= {_MIN_SUPPORT}), "
    "bfs(node, h) AS (SELECT p_partkey, 0 FROM part "
    f"WHERE p_partkey < {_SEED_KEY_BOUND} "
    "UNION SELECT e.b, bfs.h + 1 FROM bfs JOIN ed e ON e.a = bfs.node "
    f"WHERE bfs.h < {_MAX_HOPS}) "
    "SELECT node AS p_partkey, CAST(min(h) AS BIGINT) AS hops "
    "FROM bfs GROUP BY node ORDER BY p_partkey"
)

_Q146_DESCRIPTION = (
    "Q146: multi-source BFS hop distance over the co-purchase part "
    "graph (edges = co-occur in >= 2 orders, seeds = p_partkey < 5, "
    "bound 4 hops) — the distances primitive next to q78/q78b/q132. "
    "Spark runs the iterative frontier-expansion loop (per-round cost "
    "tracks the frontier, basket-bounded edge build cached once); the "
    "oracle recomputes the same min-hop function as a recursive CTE — "
    "an iterative distributed traversal hash-pinned against a "
    "recursive SQL fixpoint (the q132 cross-paradigm discipline). "
    "Exact integer supports and hops, traversal-order-independent."
)


def q146(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    li, part = t["lineitem"], t["part"]
    items = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    pairs = (
        items.alias("a")
        .join(items.alias("b"),
              (F.col("a.o") == F.col("b.o"))
              & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("pa"), F.col("b.p").alias("pb"))
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= _MIN_SUPPORT)
        .cache()  # two consumers (both union orientations) — the
        # q138 review precedent: uncached, the basket self-join +
        # support aggregate would execute once per branch
    )
    # one edge build, consumed once per BFS round -> cache
    edges = pairs.select(
        F.col("pa").alias("a"), F.col("pb").alias("b")
    ).unionAll(
        pairs.select(F.col("pb").alias("a"), F.col("pa").alias("b"))
    ).cache()
    seeds = part.where(F.col("p_partkey") < _SEED_KEY_BOUND).select(
        F.col("p_partkey").alias("node"))
    visited = seeds.withColumn("hops", F.lit(0).cast("long")).cache()
    frontier = seeds
    for h in range(1, _MAX_HOPS + 1):
        nxt = (
            frontier.join(edges, frontier.node == edges.a)
            .select(F.col("b").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .withColumn("hops", F.lit(h).cast("long"))
            .cache()  # consumed twice: union into visited + next round
        )
        visited = visited.unionAll(nxt).cache()
        frontier = nxt
    return visited.select(
        F.col("node").alias("p_partkey"), "hops").orderBy("p_partkey")


STAGED = {
    "q146_bfs_hops": (q146, _Q146_ORACLE, _Q146_DESCRIPTION,
                      ("graphs", "relational")),
}


def register() -> None:
    """r17+ registration seam — see joins_ext.register for the pattern."""
    for name, (fn, oracle, desc, tags) in STAGED.items():
        query(name, oracle=oracle, description=desc, tags=tags)(fn)


__all__ = ["q146", "STAGED", "register"]
