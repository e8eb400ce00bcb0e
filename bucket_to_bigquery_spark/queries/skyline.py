"""New r10 surface (sixth batch) — q82: skyline (Pareto frontier) of
orders — the maximal-vector operator (Börzsönyi/Kossmann/Stocker, ICDE
2001): orders not dominated on (earlier ``o_orderdate``, higher
``o_totalprice``); the multi-objective shortlist primitive ("best
trade-offs", here: no later order got at least the same price for less
recency — the same shape shortlists model checkpoints on loss × cost).

Domination: a dominates b iff date_a <= date_b AND price_a >= price_b
AND at least one strict. Comparison-only semantics — no arithmetic at
all, so cross-engine parity is trivially exact.

Scale design (100 TB): the naive formulation is the quadratic NOT
EXISTS self-join; the windowed one sorts the WHOLE fact table into one
partition — both scale bugs. This plan reduces the frontier test to
per-date thresholds: (1) one map-side-combined aggregation to per-date
max price (output bounded by |distinct dates| — the date dimension,
NOT the fact cardinality); (2) a running max + lag over that tiny
frame (its single-partition window is over thousands of rows, by
construction, and is the only single-partition step); (3) one broadcast
join back to the facts with a row-local verdict:

    survive  ⇔  price > best_lt(date)          (kills strict-date dominators)
              ∧ price = dmax(date)             (kills same-date dominators)

Equal (date, price) rows never dominate each other (no strict field),
so ties all survive — both engines agree by construction. Facts are
read once, never re-sorted, never self-joined (plan-pinned: no
CartesianProduct, threshold join is broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import query, tables

_Q82_ORACLE = (
    "WITH dmax AS (SELECT o_orderdate AS d, max(o_totalprice) AS dmax "
    "FROM orders GROUP BY o_orderdate), "
    "thresh AS (SELECT d, dmax, "
    "max(dmax) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND "
    "1 PRECEDING) AS best_lt FROM dmax) "
    "SELECT o.o_orderkey AS orderkey, o.o_orderdate AS orderdate, "
    "o.o_totalprice AS totalprice "
    "FROM orders o JOIN thresh t ON o.o_orderdate = t.d "
    "WHERE (t.best_lt IS NULL OR o.o_totalprice > t.best_lt) "
    "AND o.o_totalprice = t.dmax "
    "ORDER BY orderkey"
)

_Q82_DESCRIPTION = (
    "Q82: skyline / Pareto frontier of orders on (earlier date, higher "
    "price) — reduced to per-date thresholds: map-side-combined per-"
    "date max (bounded by the date dimension), running-max + lag over "
    "that tiny frame (the ONLY single-partition window, thousands of "
    "rows by construction), broadcast join back, row-local verdict. "
    "Facts read once — never globally sorted, never self-joined "
    "(plan-pinned). Comparison-only: bit-exact without rounding."
)


@query("q82_skyline_orders", oracle=_Q82_ORACLE,
       description=_Q82_DESCRIPTION, tags=("relational", "analytics"))
def q82(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tables(spark, sf_dir)["orders"]
    dmax = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.max("o_totalprice").alias("dmax")
    )
    w_lt = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
    thresh = dmax.select(
        "d", "dmax", F.max("dmax").over(w_lt).alias("best_lt")
    )
    return (
        orders.join(F.broadcast(thresh), orders.o_orderdate == thresh.d)
        .where(
            (F.col("best_lt").isNull()
             | (F.col("o_totalprice") > F.col("best_lt")))
            & (F.col("o_totalprice") == F.col("dmax"))
        )
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_totalprice").alias("totalprice"),
        )
        .orderBy("orderkey")
    )


__all__ = ["q82"]
