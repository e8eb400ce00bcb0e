"""STAGED r20 surface (built in r14, NOT registered — GATE_r14.md's
round-20 note budgets the slot) — q162: exact equi-DEPTH histogram
boundaries of the order-value distribution — the optimizer-statistics
primitive (what a cost-based optimizer's column statistics actually
store) next to the equi-WIDTH q49b and the fixed-band q65: 19 interior
bin edges splitting the corpus into 20 equal-count bins, each edge the
SMALLEST value whose cumulative count reaches the bin's target rank
(the q129 disc rank rule generalized from quartiles to B bins).

Reference parity: the readme's partition-pruning claim
(readme.md:38-41) is the reference's only optimizer-statistics
surface; declared engine surface (SURVEY §2.C extension when
registered).

Determinism: values enter as exact cents (the q65/q129/q136
integer-domain discipline); target ranks are ceiling divisions
(i·n + B − 1) div B… exactly: ceil(i*n/B) = (i*n + B - 1) div B on
positive integers; each edge is the unique cents whose cumulative
range [cum−c+1, cum] contains its target — a pure integer predicate,
no interpolation, no engine round-off. ORDER BY the unique bin index.

Scale design (100 TB): count-compress FIRST to the (cents, c) domain
frame (one map-side-combined shuffle, corpus-size-independent), then
the q131/q136 two-level segmented scan for cumulative counts ($10k
bands in parallel + a |bands|-row carry) — never a global window over
distinct values; edge selection is a broadcast of the 19-row target
frame against the compressed domain. The oracle uses the direct
global-window formulation — the same integer function, which is what
the hash compare pins (the q136 precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import query, tables

_BINS = 20
_SEG_CENTS = 1_000_000  # $10k bands (the q136 segmentation)

_Q162_ORACLE = (
    "WITH src AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) "
    "AS cents FROM orders), "
    "cc AS (SELECT cents, CAST(COUNT(*) AS BIGINT) AS c FROM src "
    "GROUP BY cents), "
    "run AS (SELECT cents, c, "
    "CAST(SUM(c) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) "
    "AS BIGINT) AS cum, CAST(SUM(c) OVER () AS BIGINT) AS n FROM cc), "
    f"targets AS (SELECT unnest(range(1, {_BINS})) AS bin_idx), "
    "edges AS (SELECT bin_idx, "
    f"(bin_idx * n + {_BINS - 1}) // {_BINS} AS target_rank, cents "
    "FROM run, targets "
    f"WHERE cum - c < (bin_idx * n + {_BINS - 1}) // {_BINS} "
    f"AND (bin_idx * n + {_BINS - 1}) // {_BINS} <= cum) "
    "SELECT CAST(bin_idx AS BIGINT) AS bin_idx, "
    "CAST(target_rank AS BIGINT) AS target_rank, "
    "CAST(cents AS BIGINT) AS edge_cents FROM edges ORDER BY bin_idx"
)

_Q162_DESCRIPTION = (
    "Q162: exact equi-depth histogram boundaries of order value — 19 "
    "interior edges splitting the corpus into 20 equal-count bins, "
    "each edge the smallest cents whose cumulative range contains the "
    "ceiling-div target rank (the q129 disc rule at B bins) — the "
    "CBO column-statistics primitive next to equi-width q49b. "
    "Scale-correct: count-compress to the cents domain, the "
    "q131/q136 two-level segmented scan for cumulates (never a "
    "global window over distinct values), broadcast 19-row target "
    "join; the oracle's direct global cumulate pins the same "
    "integer function."
)


def q162(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables(spark, sf_dir)["orders"]
    src = o.select(
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias("cents"))
    # (1) count-compress: domain-bounded (cents, c) frame; two
    # consumers (within-segment windows + per-segment totals) -> cache
    cc = (
        src.groupBy("cents")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .withColumn("seg", F.expr(f"cents div {_SEG_CENTS}"))
        .cache()
    )
    # (2) within-segment prefix sums — parallel across price bands
    w_in = Window.partitionBy("seg").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, 0)
    within = cc.select(
        "cents", "c", "seg", F.sum("c").over(w_in).alias("c_in"))
    # (3) cross-segment carry on the |bands|-row totals frame
    seg_tot = cc.groupBy("seg").agg(F.sum("c").alias("tc")).cache()
    w_carry = Window.orderBy("seg").rowsBetween(
        Window.unboundedPreceding, -1)
    carry = seg_tot.select(
        "seg", F.coalesce(F.sum("tc").over(w_carry), F.lit(0)).alias("pre"))
    tot = seg_tot.agg(F.sum("tc").cast("long").alias("n"))
    run = (
        within.join(F.broadcast(carry), "seg")
        .crossJoin(F.broadcast(tot))
        .select(
            "cents", "c", "n",
            (F.col("c_in") + F.col("pre")).cast("long").alias("cum"),
        )
    )
    targets = spark.range(1, _BINS).select(
        F.col("id").cast("long").alias("bin_idx"))
    return (
        run.crossJoin(F.broadcast(targets))
        .where(
            (F.col("cum") - F.col("c")
             < F.expr(f"(bin_idx * n + {_BINS - 1}) div {_BINS}"))
            & (F.expr(f"(bin_idx * n + {_BINS - 1}) div {_BINS}")
               <= F.col("cum"))
        )
        .select(
            "bin_idx",
            F.expr(f"cast((bin_idx * n + {_BINS - 1}) div {_BINS} "
                   "as bigint)").alias("target_rank"),
            F.col("cents").alias("edge_cents"),
        )
        .orderBy("bin_idx")
    )


STAGED = {
    "q162_equidepth_histogram": (q162, _Q162_ORACLE, _Q162_DESCRIPTION,
                                 ("stats", "engine")),
}


def register() -> None:
    """r20 registration seam — see joins_ext.register for the pattern."""
    for name, (fn, oracle, desc, tags) in STAGED.items():
        query(name, oracle=oracle, description=desc, tags=tags)(fn)


__all__ = ["q162", "STAGED", "register"]
