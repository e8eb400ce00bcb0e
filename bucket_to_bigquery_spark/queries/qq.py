"""STAGED r20 surface (built late r14, NOT registered — GATE_r14.md's
round-20 note budgets the slot) — q168: quantile–quantile drift table
between the early and late halves of the order stream — the
LOCATION-of-drift companion to the q136 KS statistic (one number:
"did it drift?") and the q96 PSI (fixed reference bins): per decile,
both periods' exact equi-depth edges (the q162 rule applied within
each period) and the integer cents shift between them — which reads
directly as "the top decile moved $132, the median didn't", the
question a drift triage actually asks.

Reference parity: n/a — no analytics surface in the reference;
declared engine surface (SURVEY §2.C extension when registered).

Determinism: values enter as exact cents; each period's decile edge
is the smallest cents whose within-period cumulative range contains
the ceiling-div target rank (the q129/q162 disc rule); the shift is
a plain integer difference. ORDER BY the unique decile key.

Scale design (100 TB): one scan count-compresses to the (period,
cents) domain frame; the q131/q136/q162 two-level segmented scan
runs with (period, band)-partitioned windows — both periods cumulate
in parallel, never a global window over distinct values; edge
selection joins a broadcast 9-row target frame per period and the
final pivot joins two 9-row frames. The oracle uses the direct
period-partitioned global window — the same integer function, which
is what the hash compare pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import query, tables

_PIVOT = "1998-01-01"
_BINS = 10
_SEG_CENTS = 1_000_000  # $10k bands (the q136/q162 segmentation)

_Q168_ORACLE = (
    "WITH src AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) "
    "AS cents, CAST(o_orderdate < TIMESTAMP '" + _PIVOT + "' AS INT) "
    "AS early FROM orders), "
    "cc AS (SELECT early, cents, CAST(COUNT(*) AS BIGINT) AS c "
    "FROM src GROUP BY early, cents), "
    "run AS (SELECT early, cents, c, "
    "CAST(SUM(c) OVER (PARTITION BY early ORDER BY cents "
    "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum, "
    "CAST(SUM(c) OVER (PARTITION BY early) AS BIGINT) AS n FROM cc), "
    f"targets AS (SELECT unnest(range(1, {_BINS})) AS decile), "
    "edges AS (SELECT early, decile, cents FROM run, targets "
    f"WHERE cum - c < (decile * n + {_BINS - 1}) // {_BINS} "
    f"AND (decile * n + {_BINS - 1}) // {_BINS} <= cum) "
    "SELECT CAST(e.decile AS BIGINT) AS decile, "
    "CAST(e.cents AS BIGINT) AS early_cents, "
    "CAST(l.cents AS BIGINT) AS late_cents, "
    "CAST(l.cents - e.cents AS BIGINT) AS shift_cents "
    "FROM edges e JOIN edges l ON e.decile = l.decile "
    "AND e.early = 1 AND l.early = 0 ORDER BY decile"
)

_Q168_DESCRIPTION = (
    "Q168: quantile-quantile drift table — per decile, both periods' "
    "exact within-period equi-depth edges (ceiling-div disc rule on "
    "exact cents, the q129/q162 convention) and the integer shift "
    "between them: the location-of-drift companion to the q136 KS "
    "number and q96's fixed bins. Scale-correct: count-compress to "
    "the (period, cents) domain, (period, band)-partitioned "
    "segmented-scan cumulates (both periods in parallel, never a "
    "global window over distinct values), broadcast 9-row targets, "
    "9x9 final pivot join; the oracle's direct period-partitioned "
    "window pins the same integer function."
)


def q168(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables(spark, sf_dir)["orders"]
    src = o.select(
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias("cents"),
        (F.col("o_orderdate") < F.lit(_PIVOT).cast("timestamp"))
        .cast("int").alias("early"),
    )
    cc = (
        src.groupBy("early", "cents")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .withColumn("seg", F.expr(f"cents div {_SEG_CENTS}"))
        # two consumers (within-band windows + per-band totals) -> cache
        .cache()
    )
    w_in = Window.partitionBy("early", "seg").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, 0)
    within = cc.select(
        "early", "cents", "c", "seg",
        F.sum("c").over(w_in).alias("c_in"))
    seg_tot = cc.groupBy("early", "seg").agg(
        F.sum("c").alias("tc")).cache()
    w_carry = Window.partitionBy("early").orderBy("seg").rowsBetween(
        Window.unboundedPreceding, -1)
    carry = seg_tot.select(
        "early", "seg",
        F.coalesce(F.sum("tc").over(w_carry), F.lit(0)).alias("pre"))
    tot = seg_tot.groupBy("early").agg(F.sum("tc").cast("long").alias("n"))
    run = (
        within.join(F.broadcast(carry), ["early", "seg"])
        .join(F.broadcast(tot), "early")
        .select(
            "early", "cents", "c", "n",
            (F.col("c_in") + F.col("pre")).cast("long").alias("cum"),
        )
    )
    targets = spark.range(1, _BINS).select(
        F.col("id").cast("long").alias("decile"))
    edges = (
        run.crossJoin(F.broadcast(targets))
        .where(
            (F.col("cum") - F.col("c")
             < F.expr(f"(decile * n + {_BINS - 1}) div {_BINS}"))
            & (F.expr(f"(decile * n + {_BINS - 1}) div {_BINS}")
               <= F.col("cum"))
        )
        .select("early", "decile", "cents")
        # two consumers (the early and late sides of the pivot join)
        .cache()
    )
    e = edges.where(F.col("early") == 1).select(
        "decile", F.col("cents").alias("early_cents"))
    l = edges.where(F.col("early") == 0).select(
        "decile", F.col("cents").alias("late_cents"))
    return (
        e.join(l, "decile")
        .select(
            "decile", "early_cents", "late_cents",
            (F.col("late_cents") - F.col("early_cents")).cast("long")
            .alias("shift_cents"),
        )
        .orderBy("decile")
    )


STAGED = {
    "q168_qq_drift": (q168, _Q168_ORACLE, _Q168_DESCRIPTION,
                      ("stats", "governance")),
}


def register() -> None:
    """r20 registration seam — see joins_ext.register for the pattern."""
    for name, (fn, oracle, desc, tags) in STAGED.items():
        query(name, oracle=oracle, description=desc, tags=tags)(fn)


__all__ = ["q168", "STAGED", "register"]
