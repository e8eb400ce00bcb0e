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
  the next step is star-contraction (alternating large-star/small-star,
  Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14) with O(log² n) rounds and provably balanced keys. Dedup
  graphs do not need it; the seam to add it is this function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    node_col: str = "node",
    max_iterations: int = 25,
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

    Returns ``(node, cluster_id)`` — one row per node.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    sym = e.unionAll(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
    # Edges drive a join per iteration: materialize once, reuse each round.
    sym = sym.distinct().localCheckpoint(eager=True)

    if nodes is None:
        labels = sym.select(F.col("s").alias("node")).distinct()
    else:
        labels = nodes.select(F.col(node_col).alias("node")).distinct()
    labels = labels.select("node", F.col("node").alias("lbl"))
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iterations):
        # neighbor messages: every node hears its neighbors' current labels
        msgs = (
            sym.join(labels, sym["d"] == labels["node"])
            .select(F.col("s").alias("node"), "lbl")
        )
        # new label = min(own, neighbors') — one shuffle on node id with
        # map-side partial min
        stepped = (
            labels.unionAll(msgs)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
        )
        # pointer jumping: lbl(v) ← min(lbl(v), lbl(lbl(v))). Plain
        # propagation moves the component minimum ONE hop per round
        # (O(diameter) rounds — a 30-node chain needs 30 shuffles); the
        # jump halves every label-chain each round, making total rounds
        # O(log diameter). Every label value is itself a node id, so the
        # self-join is total.
        jump = stepped.select(
            F.col("node").alias("lbl"), F.col("lbl").alias("lbl2")
        )
        new_labels = (
            stepped.join(jump, "lbl")
            .select("node", F.least("lbl", "lbl2").alias("lbl"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels.select("node", F.col("lbl").alias("cluster_id"))
