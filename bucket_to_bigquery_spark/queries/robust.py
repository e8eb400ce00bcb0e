"""STAGED r17 surface (built late r13, NOT registered — GATE_r13.md's
round-17 note budgets the slot) — q137: robust (median/MAD) outlier
audit of order value per market segment — the robust-statistics twin
of q84's mean/σ daily anomalies: median and median-absolute-deviation
are breakdown-point-0.5 estimators, so a contaminated tail cannot
drag the fence the way it drags a z-score, which is exactly why
large-corpus quality pipelines fence on MAD.

Reference parity: n/a — no analytics surface in the reference;
declared engine surface (SURVEY §2.C extension when registered).

Determinism: pure integer arithmetic end to end — values enter as
exact cents (round(price·100), the q65/q129 domain discipline), both
medians are percentile_disc under the shared explicit rank rule
"smallest value whose cumulative count ≥ (n+1) div 2" (the integer
form of ceil(n/2), replicated literally in both engines — the q129
convention), and the fence test `dev > 3·mad` compares integers.

Scale design (100 TB): never sorts or windows the fact table. One
fact-join pass count-compresses to the (segment, cents) frame —
bounded by |segments| × the distinct-cents DOMAIN (≤5·10⁷ for a
≤$500k price domain), corpus-size-independent — and the SECOND pass
(deviations) is derived from that compressed frame by a broadcast
join with the 5-row medians frame, never from raw rows. Both
cumulates run segment-partitioned over compressed frames; for an
unbounded value domain the q136 band-segmented scan drops in (same
integer function, documented seam). The orders⋈customer leg stays a
plain equi-join: customer is SF-proportional, not a broadcastable
dim (the tpch_ext discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import query, tables

_FENCE = 3  # the classic 3-MAD fence

_Q137_ORACLE = (
    "WITH src AS (SELECT c_mktsegment AS segment, "
    "CAST(round(o_totalprice * 100) AS BIGINT) AS x "
    "FROM orders JOIN customer ON o_custkey = c_custkey), "
    "cc AS (SELECT segment, x, CAST(count(*) AS BIGINT) AS c "
    "FROM src GROUP BY segment, x), "
    "cum AS (SELECT segment, x, c, "
    "CAST(sum(c) OVER (PARTITION BY segment ORDER BY x) AS BIGINT) "
    "AS cum_c, "
    "CAST(sum(c) OVER (PARTITION BY segment) AS BIGINT) AS n FROM cc), "
    "med AS (SELECT segment, "
    "CAST(min(CASE WHEN cum_c >= (n + 1) // 2 THEN x END) AS BIGINT) "
    "AS med, CAST(any_value(n) AS BIGINT) AS n FROM cum "
    "GROUP BY segment), "
    "dev AS (SELECT cc.segment, abs(cc.x - med.med) AS d, "
    "CAST(sum(cc.c) AS BIGINT) AS c FROM cc JOIN med "
    "ON cc.segment = med.segment GROUP BY cc.segment, abs(cc.x - med.med)), "
    "dcum AS (SELECT segment, d, c, "
    "CAST(sum(c) OVER (PARTITION BY segment ORDER BY d) AS BIGINT) "
    "AS cum_c, "
    "CAST(sum(c) OVER (PARTITION BY segment) AS BIGINT) AS n FROM dev), "
    "mad AS (SELECT segment, "
    "CAST(min(CASE WHEN cum_c >= (n + 1) // 2 THEN d END) AS BIGINT) "
    "AS mad FROM dcum GROUP BY segment), "
    "outs AS (SELECT dev.segment, "
    "CAST(coalesce(sum(CASE WHEN dev.d > "
    f"{_FENCE} * mad.mad THEN dev.c END), 0) AS BIGINT) AS n_outliers, "
    "CAST(max(dev.d) AS BIGINT) AS max_dev "
    "FROM dev JOIN mad ON dev.segment = mad.segment GROUP BY dev.segment) "
    "SELECT med.segment, med.n AS n_orders, med.med AS med_cents, "
    "mad.mad AS mad_cents, outs.n_outliers, outs.max_dev AS max_dev_cents "
    "FROM med JOIN mad ON med.segment = mad.segment "
    "JOIN outs ON med.segment = outs.segment ORDER BY med.segment"
)

_Q137_DESCRIPTION = (
    "Q137: robust median/MAD outlier audit of order value per market "
    "segment — breakdown-0.5 fences (dev > 3*MAD) next to q84's "
    "mean/sigma family. Integer-exact: cents domain, both medians by "
    "the shared disc rank rule (smallest value with cum count >= "
    "(n+1) div 2), integer fence compare. Scale-correct: one fact-join "
    "pass count-compresses to the domain-bounded (segment, cents) "
    "frame; the deviation distribution derives from THAT frame via a "
    "broadcast of the 5-row medians — the fact table is never sorted, "
    "windowed, or re-scanned."
)


def q137(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    src = (
        t["orders"]
        .join(t["customer"],
              F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.expr("cast(round(o_totalprice * 100) as bigint)").alias("x"),
        )
    )
    # one fact pass -> domain-bounded compressed frame; two consumers
    # (median cumulate + deviation rebuild) -> cache
    cc = src.groupBy("segment", "x").agg(
        F.count(F.lit(1)).cast("long").alias("c")).cache()
    wseg = Window.partitionBy("segment")
    cum = cc.select(
        "segment", "x", "c",
        F.sum("c").over(wseg.orderBy("x")).cast("long").alias("cum_c"),
        F.sum("c").over(wseg).cast("long").alias("n"),
    )
    med = cum.groupBy("segment").agg(
        F.min(
            F.when(F.col("cum_c") >= F.expr("(n + 1) div 2"), F.col("x"))
        ).cast("long").alias("med"),
        F.first("n").cast("long").alias("n"),
    )
    # deviations from the COMPRESSED frame (broadcast 5-row medians);
    # two consumers (MAD cumulate + fence aggregate) -> cache
    dev = (
        cc.join(F.broadcast(med.select("segment", "med")), "segment")
        .groupBy("segment", F.abs(F.col("x") - F.col("med")).alias("d"))
        .agg(F.sum("c").cast("long").alias("c"))
        .cache()
    )
    dcum = dev.select(
        "segment", "d", "c",
        F.sum("c").over(wseg.orderBy("d")).cast("long").alias("cum_c"),
        F.sum("c").over(wseg).cast("long").alias("n"),
    )
    mad = dcum.groupBy("segment").agg(
        F.min(
            F.when(F.col("cum_c") >= F.expr("(n + 1) div 2"), F.col("d"))
        ).cast("long").alias("mad"),
    )
    outs = (
        dev.join(F.broadcast(mad), "segment")
        .groupBy("segment")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("d") > _FENCE * F.col("mad"),
                             F.col("c"))),
                F.lit(0),
            ).cast("long").alias("n_outliers"),
            F.max("d").cast("long").alias("max_dev_cents"),
        )
    )
    return (
        med.join(F.broadcast(mad), "segment")
        .join(F.broadcast(outs), "segment")
        .select(
            "segment",
            F.col("n").alias("n_orders"),
            F.col("med").alias("med_cents"),
            F.col("mad").alias("mad_cents"),
            "n_outliers",
            "max_dev_cents",
        )
        .orderBy("segment")
    )


STAGED = {
    "q137_mad_outliers": (q137, _Q137_ORACLE, _Q137_DESCRIPTION,
                          ("stats", "quality")),
}


def register() -> None:
    """r17 registration seam — see joins_ext.register for the pattern."""
    for name, (fn, oracle, desc, tags) in STAGED.items():
        query(name, oracle=oracle, description=desc, tags=tags)(fn)


__all__ = ["q137", "STAGED", "register"]
