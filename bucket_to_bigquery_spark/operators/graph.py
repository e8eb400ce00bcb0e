"""Distributed connected components — the cluster-assignment stage of a
dedup pipeline (SURVEY §2.C Q46; BASELINE north star).

Pair-finding (exact groups, Jaccard pairs, LSH candidates — operators/
dedup.py) yields EDGES; an actual dedup pass needs the transitive closure:
every document assigned a cluster id so one canonical survivor per cluster
can be kept. This is min-label propagation:

    label(v) ← min(label(v), min over neighbors u of label(u))

iterated to fixpoint, accelerated by pointer jumping (``lbl(v) ←
lbl(lbl(v))``) so the round count is O(log diameter) rather than
O(diameter). Each round is two shuffles (edge join + min-aggregate, then
the label self-join); near-dup clusters are near-cliques, so 2-3 rounds
converge even at corpus scale, and a pathological chain still converges
logarithmically. Labels only ever decrease and are bounded below by the
component minimum, so the fixpoint is exact, not approximate.

Scale notes (100 TB):
- lineage is truncated every iteration with ``localCheckpoint`` — without
  it the iterated join/agg plan doubles per round and the optimizer
  re-derives the whole prefix each action (on a cluster, checkpoint to
  reliable storage instead);
- convergence is detected with a SCALAR aggregate per round (count of
  changed labels), never by collecting labels to the driver;
- pointer jumping keeps rounds logarithmic in the diameter; if label-key
  skew ever dominates (one giant component funneling the min-aggregate),
  pass ``skew_safe=True`` to switch to star-contraction (alternating
  large-star/small-star, Kiveris et al., "Connected Components in
  MapReduce and Beyond", SoCC'14): O(log² n) rounds with per-round
  aggregation keys that stay balanced because every operation regroups
  edges by LOCAL node neighborhoods — the giant component never funnels
  through its minimum's key until the final (by-then tiny) star. Both
  paths return identical labels (asserted in tests).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

logger = logging.getLogger(__name__)


def _checkpoint(df: DataFrame) -> tuple[DataFrame, list[int]]:
    """``localCheckpoint(eager=True)`` plus the ids of the RDDs it persisted.

    ``DataFrame.unpersist`` on a checkpointed frame is a NO-OP: the blocks
    belong to an internal RDD the SQL cache manager never tracks, so an
    iterative algorithm would leak one RDD's blocks per round — and the
    leak survives ``spark.catalog.clearCache()`` for the life of the
    session (measured: the r4 driver bench ran its late ML queries 2-3×
    their isolated time under the accumulated block/GC pressure). Diff the
    context's persistent-RDD map around the checkpoint call so the caller
    can later free exactly those blocks. Single-threaded callers only: a
    concurrent checkpoint in another thread would land in the diff.
    """
    sc = df.sparkSession.sparkContext
    before = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    out = df.localCheckpoint(eager=True)
    after = sc._jsc.getPersistentRDDs().keySet().toArray()
    return out, [i for i in after if i not in before]


def _free(df: DataFrame, rdd_ids: list[int]) -> None:
    """Drop checkpoint blocks by RDD id. Irrecoverable (a localCheckpoint
    has no lineage to rebuild from) — call only after every consumer of
    the checkpointed frame has itself been eagerly materialized."""
    jmap = df.sparkSession.sparkContext._jsc.getPersistentRDDs()
    for i in rdd_ids:
        rdd = jmap.get(i)
        if rdd is not None:
            rdd.unpersist(False)


def _publish(result: DataFrame, inputs: list[tuple[DataFrame, list[int]]],
             retain: str) -> DataFrame:
    """Hand the final result of an iterative computation to the caller.

    ``retain="cache"`` (default): eagerly copy ``result`` into the SQL
    cache (``persist(MEMORY_AND_DISK)`` + count) and free the
    localCheckpoint blocks it was computed from. The session-hygiene
    mode (VERDICT r6 "wrong" #2): checkpoint blocks are invisible to the
    SQL cache manager, so a long-lived session composing many dedup runs
    would otherwise accumulate one unfreeable-by-``clearCache()`` RDD
    per call. The published frame is a normal cached Dataset — the
    caller's ``df.unpersist()`` (or a session ``clearCache()``) reclaims
    it. MEMORY_AND_DISK spills instead of evicting, so recomputation is
    never needed on a healthy session; the trades (pinned in tests) are
    that a published frame is dead-or-correct once reclaimed —
    re-collecting after ``clearCache()`` raises
    CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND once the freed blocks actually
    drop (unpersist is asynchronous, so a fast re-read may still serve
    the same labels; it can never serve different ones). Rebuild by
    calling the operator again; consumers must finish before
    session-level cache sweeps. Losing an executor after the checkpoint
    blocks are freed likewise loses cached partitions irrecoverably —
    single-process local mode can't hit that; a 1000-executor run
    should pass ``retain="checkpoint"`` (and checkpoint to reliable
    storage, module docstring).

    ``retain="checkpoint"``: the pre-r7 behavior — return the lazy plan
    over the final checkpointed frame, blocks retained for the life of
    the session (or an sc-level sweep).
    """
    if retain == "checkpoint":
        return result
    if retain != "cache":
        raise ValueError(f"retain must be 'cache' or 'checkpoint', got {retain!r}")
    out = result.persist(StorageLevel.MEMORY_AND_DISK)
    out.count()  # eager: the cache copy must exist before inputs are freed
    for df, ids in inputs:
        _free(df, ids)
    return out


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    node_col: str = "node",
    max_iterations: int = 25,
    skew_safe: bool = False,
    nodes_unique: bool = False,
    edges_unique: bool = False,
    retain: str = "cache",
) -> DataFrame:
    """Assign every node its connected component's minimum node id.

    Parameters
    ----------
    edges:
        Undirected edge list (each pair once is enough — it is
        symmetrized here). Node ids must be orderable (the component id
        is the component's MIN id).
    nodes:
        Optional node universe (one column ``node_col``). Nodes with no
        edges become singleton clusters. Defaults to the ids appearing
        in ``edges``.
    skew_safe:
        ``True`` switches to star-contraction (see module docstring) —
        same result, balanced aggregation keys when one giant component
        would otherwise funnel the min-aggregate.
    nodes_unique:
        ``True`` asserts ``nodes`` already has one row per node, skipping
        a distinct shuffle (e.g. a primary-key column).
    edges_unique:
        ``True`` asserts each undirected edge appears exactly once with
        ``src != dst`` (e.g. pair-miner output with ``id_a < id_b``),
        skipping the distinct on the symmetrized edge set.
    retain:
        How the final labels are held: ``"cache"`` (default) publishes
        them into the SQL cache and frees every checkpoint block —
        ``df.unpersist()`` / ``clearCache()`` fully reclaim the call;
        ``"checkpoint"`` keeps the final localCheckpoint blocks (the
        executor-loss-safe mode for reliability-critical cluster runs).
        See :func:`_publish`.

    Returns ``(node, cluster_id)`` — one row per node.
    """
    if retain not in ("cache", "checkpoint"):
        # fail before the iteration, not after it (``_publish`` is only
        # reached once the whole fixpoint has already been computed)
        raise ValueError(f"retain must be 'cache' or 'checkpoint', got {retain!r}")
    if max_iterations < 1:
        # below 1 the seed labels are never re-checkpointed, so they
        # still read the edge-set checkpoint blocks the publish step
        # frees — the result would be dead-on-arrival, not "unconverged"
        raise ValueError(f"max_iterations must be >= 1, got {max_iterations}")
    if skew_safe:
        return _star_contraction(
            edges, src, dst, nodes, node_col, max_iterations, retain
        )
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    sym = e.unionAll(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
    if not edges_unique:
        sym = sym.distinct()
    # Edges drive a join per iteration: materialize once, reuse each round.
    sym, sym_ids = _checkpoint(sym)

    # Seed labels with min(self, min neighbor) — exactly what round one of
    # identity-seeded propagation would compute, but as ONE aggregate on
    # the edge set instead of a join + aggregate + convergence check (for
    # the near-clique graphs dedup produces, this converges next round).
    nbr_min = sym.groupBy("s").agg(F.min("d").alias("m"))
    if nodes is None:
        labels = nbr_min.select(
            F.col("s").alias("node"), F.least("s", "m").alias("lbl")
        )
    else:
        u = nodes.select(F.col(node_col).alias("node"))
        if not nodes_unique:
            u = u.distinct()
        labels = u.join(
            nbr_min.withColumnRenamed("s", "node"), "node", "left"
        ).select(
            "node",
            F.least(F.col("node"), F.coalesce("m", F.col("node"))).alias("lbl"),
        )
    # no checkpoint for the seed: its lineage is one aggregate off the
    # already-checkpointed edge set — truncation starts paying from the
    # first iterated round (stepped) onward
    labels_ids: list[int] = []

    converged = False
    for _ in range(max_iterations):
        # neighbor messages: every node hears its neighbors' current labels
        msgs = (
            sym.join(labels, sym["d"] == labels["node"])
            .select(F.col("s").alias("node"), "lbl")
        )
        # new label = min(own, neighbors') — one shuffle on node id with
        # map-side partial min
        stepped, stepped_ids = _checkpoint(
            labels.unionAll(msgs)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
        )
        # convergence check BEFORE the pointer jump: if the min-propagate
        # step changed nothing, the jump can't either (it only reads
        # labels the step just produced), so the final confirming round
        # skips the jump join entirely. isEmpty short-circuits at the
        # first differing row instead of counting them all.
        converged = (
            stepped.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.lbl") != F.col("o.lbl"))
            .isEmpty()
        )
        _free(labels, labels_ids)  # stepped is materialized; old round safe
        if converged:
            labels, labels_ids = stepped, stepped_ids
            break
        # pointer jumping: lbl(v) ← min(lbl(v), lbl(lbl(v))). Plain
        # propagation moves the component minimum ONE hop per round
        # (O(diameter) rounds — a 30-node chain needs 30 shuffles); the
        # jump halves every label-chain each round, making total rounds
        # O(log diameter). Every label value is itself a node id, so the
        # self-join is total.
        jump = stepped.select(
            F.col("node").alias("lbl"), F.col("lbl").alias("lbl2")
        )
        labels, labels_ids = _checkpoint(
            stepped.join(jump, "lbl")
            .select("node", F.least("lbl", "lbl2").alias("lbl"))
        )
        _free(stepped, stepped_ids)
    if not converged:
        logger.warning(
            "connected_components: max_iterations=%d exhausted before "
            "convergence — labels may not be component minima",
            max_iterations,
        )
    _free(sym, sym_ids)
    return _publish(
        labels.select("node", F.col("lbl").alias("cluster_id")),
        [(labels, labels_ids)],
        retain,
    )


def _star_contraction(
    edges: DataFrame,
    src: str,
    dst: str,
    nodes: DataFrame | None,
    node_col: str,
    max_iterations: int,
    retain: str = "cache",
) -> DataFrame:
    """Alternating large-star/small-star contraction (Kiveris et al.,
    SoCC'14, Algorithm 2 "Two-Phase").

    Each round transforms the edge set (all edges kept oriented
    ``u > v``):

    - **large-star**: group the SYMMETRIC neighborhood of every node
      ``s``; with ``m = min(Γ(s) ∪ {s})``, re-attach every larger
      neighbor ``d > s`` directly to ``m``. Long chains halve; every
      aggregation key is a single node's (local) neighborhood.
    - **small-star**: group by the larger endpoint ``u``; with
      ``m = min`` of its smaller neighbors, re-attach ``u`` and all its
      smaller neighbors to ``m``.

    The edge set converges to stars centered at each component's minimum
    in O(log² n) rounds; convergence is detected with a scalar
    symmetric-difference count, never a driver collect. Labels then read
    straight off the final stars.
    """
    e, e_ids = _checkpoint(
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("u"),
            F.least(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )

    converged = False
    for _ in range(max_iterations):
        sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        sym = sym.select(F.col("u").alias("s"), F.col("v").alias("d"))
        # large-star: m(s) = min over the full neighborhood (self included)
        mins = (
            sym.groupBy("s")
            .agg(F.min("d").alias("mn"))
            .select("s", F.least(F.col("s"), F.col("mn")).alias("m"))
        )
        large = (
            sym.join(mins, "s")
            .where(F.col("d") > F.col("s"))
            .select(F.col("d").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star over (u > v) edges: m(u) = min smaller neighbor
        smins = large.groupBy("u").agg(F.min("v").alias("m"))
        small, small_ids = _checkpoint(
            large.join(smins, "u")
            .where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionAll(smins.select(F.col("u"), F.col("m").alias("v")))
            .distinct()
        )
        changed = (
            small.exceptAll(e).select(F.lit(1)).unionAll(
                e.exceptAll(small).select(F.lit(1))
            ).limit(1).count()
        )
        _free(e, e_ids)
        e, e_ids = small, small_ids
        if changed == 0:
            converged = True
            break
    if not converged:
        logger.warning(
            "connected_components(skew_safe=True): max_iterations=%d "
            "exhausted before star-contraction converged — labels read off "
            "a non-star edge set may not be component minima",
            max_iterations,
        )

    # final stars: every non-root points at its component minimum
    non_roots = e.groupBy("u").agg(F.min("v").alias("cluster_id")).select(
        F.col("u").alias("node"), "cluster_id"
    )
    if nodes is None:
        universe = (
            edges.select(F.col(src).alias("node"))
            .unionAll(edges.select(F.col(dst).alias("node")))
            .distinct()
        )
    else:
        universe = nodes.select(F.col(node_col).alias("node")).distinct()
    roots = universe.join(non_roots, "node", "left_anti").select(
        "node", F.col("node").alias("cluster_id")
    )
    return _publish(non_roots.unionAll(roots), [(e, e_ids)], retain)
