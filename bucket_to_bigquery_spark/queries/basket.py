"""New r10 surface (fourth batch) — q76: frequent co-occurring item
pairs — the market-basket / co-occurrence-mining primitive (at
training-data scale the same shape mines co-occurring domains, tags, or
near-dup cluster overlaps; here it mines part pairs that ship together
in an order).

Reference parity: n/a — no analytics surface in the reference; declared
engine surface (SURVEY §2.C extension, registered r10).

The operation: baskets are orders, items the DISTINCT parts on an
order's lineitems. Items below an absolute support floor are pruned
(the a-priori downward-closure step: an infrequent item cannot appear
in a frequent pair), surviving items self-join within the basket under
``part_a < part_b``, and the global top-100 pairs by co-occurrence
count are emitted with each side's support and the lift
``n_baskets·P(ab) / (P(a)·P(b))`` as a scaled integer.

Determinism: every count is an exact integer aggregate; lift is one
double expression in identical operand order on both engines rounded
to e6 (the q49k contract); the top-100 cut orders by (count DESC,
part_a, part_b) — a total order, so the boundary is unambiguous.

Scale design (100 TB): the support prune is the load-bearing step — the
pair fan-out is quadratic per basket ONLY over surviving items, and the
frequent-item set is vocabulary-bounded, so it rides a broadcast join
(no shuffle of the basket stream to apply the prune; plan-pinned). The
self-join shuffles both sides once on the basket key (SMJ co-partitioned
on l_orderkey), the pair count is one map-side-combined aggregation on
(part_a, part_b), and the global top-100 is TakeOrdered (partial top-k
per partition, never a full sort — plan-pinned). Baskets here are
bounded (TPC-H ≤ 7 lines); at warehouse scale a per-basket item cap
would precede the self-join, same plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query, tables

_MIN_ITEM_SUPPORT = 5  # absolute basket-count floor for a single item
_TOPN = 100

_LIFT_FMT = (
    "CAST(round(((CAST({pn} AS DOUBLE) * CAST({nb} AS DOUBLE)) "
    "/ (CAST({ca} AS DOUBLE) * CAST({cb} AS DOUBLE))) * 1e6) AS BIGINT)"
)

_Q76_ORACLE = (
    "WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), "
    "stats AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) "
    "AS n_baskets FROM items), "
    "freq AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt FROM items "
    f"GROUP BY l_partkey HAVING count(*) >= {_MIN_ITEM_SUPPORT}), "
    "fitems AS (SELECT i.l_orderkey, i.l_partkey, f.cnt FROM items i "
    "JOIN freq f USING (l_partkey)), "
    "pairs AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, "
    "a.cnt AS cnt_a, b.cnt AS cnt_b, CAST(count(*) AS BIGINT) AS pair_support "
    "FROM fitems a JOIN fitems b ON a.l_orderkey = b.l_orderkey "
    "AND a.l_partkey < b.l_partkey "
    "GROUP BY a.l_partkey, b.l_partkey, a.cnt, b.cnt) "
    "SELECT part_a, part_b, pair_support, cnt_a AS support_a, "
    "cnt_b AS support_b, "
    + _LIFT_FMT.format(pn="pair_support", nb="n_baskets",
                       ca="cnt_a", cb="cnt_b")
    + " AS lift_e6 FROM pairs CROSS JOIN stats "
    f"ORDER BY pair_support DESC, part_a, part_b LIMIT {_TOPN}"
)

_Q76_DESCRIPTION = (
    "Q76: top-100 co-occurring part pairs within orders — a-priori "
    "support prune (absolute floor 5) applied via a vocabulary-bounded "
    "broadcast BEFORE the quadratic per-basket self-join; the join "
    "shuffles once on the basket key, the pair count map-side combines "
    "on (part_a, part_b), and the top-100 is TakeOrdered under the "
    "total order (count DESC, part_a, part_b) — both plan-pinned. "
    "Counts exact ints; lift is one identical-operand-order double "
    "rounded to e6 (the q49k contract)."
)


@query("q76_frequent_pairs", oracle=_Q76_ORACLE,
       description=_Q76_DESCRIPTION, tags=("relational", "mining"))
def q76(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables(spark, sf_dir)["lineitem"]
    # the distinct is a shuffle and items feeds FOUR consumers (stats,
    # freq, both self-join sides) — cache the narrow 2-int-column frame
    items = li.select("l_orderkey", "l_partkey").distinct().cache()
    stats = items.agg(
        F.count_distinct("l_orderkey").cast("long").alias("n_baskets")
    )
    freq = (
        items.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .where(F.col("cnt") >= _MIN_ITEM_SUPPORT)
    )
    fitems = items.join(F.broadcast(freq), "l_partkey")
    a = fitems.select(
        F.col("l_orderkey"),
        F.col("l_partkey").alias("part_a"), F.col("cnt").alias("cnt_a"),
    )
    b = fitems.select(
        F.col("l_orderkey"),
        F.col("l_partkey").alias("part_b"), F.col("cnt").alias("cnt_b"),
    )
    pairs = (
        a.join(b, on=[a.l_orderkey == b.l_orderkey,
                      a.part_a < b.part_b])
        .groupBy("part_a", "part_b", "cnt_a", "cnt_b")
        .agg(F.count(F.lit(1)).cast("long").alias("pair_support"))
    )
    lift = F.expr(_LIFT_FMT.format(
        pn="pair_support", nb="n_baskets", ca="cnt_a", cb="cnt_b",
    )).alias("lift_e6")
    return (
        pairs.crossJoin(F.broadcast(stats))
        .select(
            "part_a", "part_b", "pair_support",
            F.col("cnt_a").alias("support_a"),
            F.col("cnt_b").alias("support_b"),
            lift,
        )
        .orderBy(F.col("pair_support").desc(), "part_a", "part_b")
        .limit(_TOPN)
    )


__all__ = ["q76"]
