"""New r10 surface (eighth batch) — q87: week-over-week revenue deltas
— weekly revenue with previous-week comparison and percent change (the
time-series reporting primitive every warehouse dashboard runs; the
same shape tracks corpus growth per ingest week at training-data
scale).

Reference parity: n/a — no analytics surface in the reference; declared
engine surface (SURVEY §2.C extension, registered r10).

Weeks are integer indexes (``epoch_us // (7·86400e6)`` — the q64/q84
lesson: integer epoch math, no engine week-truncation conventions; the
epoch anchor is a Thursday, irrelevant for deltas). Revenue sums as
DECIMAL(30,6) (the dsum contract — order-independent), the delta is a
DECIMAL subtraction (exact), and the percent change is ONE double
division scaled to round(x·1e6) from the two already-exact aggregates.
``lag`` over the week sequence: the first week's delta is NULL (no
baseline), not 0 — left semantics. The comparison baseline is the
previous OBSERVED week, not the previous calendar week — a gapped
calendar (empty weeks) compares across the gap, and the ``weeks_gap``
column exposes exactly how far back the baseline sits (1 = truly
adjacent) so a consumer can filter or reweight gapped rows instead of
mistaking them for adjacent-week changes.

Scale design (100 TB): one map-side-combined aggregation from the
order stream to the per-week frame — bounded by the calendar, not the
facts (the q82/q84 date-dimension argument); the lag window over that
tiny frame is the only single-partition step. Facts are read once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import query, tables

_WEEK_US = 7 * 86_400_000_000

_PCT_FMT = (
    "CAST(round(((CAST({cur} AS DOUBLE) - CAST({prev} AS DOUBLE)) / "
    "CAST({prev} AS DOUBLE)) * 1e6) AS BIGINT)"
)

_Q87_ORACLE = (
    f"WITH weekly AS (SELECT epoch_us(o_orderdate) // {_WEEK_US} AS week_idx, "
    "CAST(count(*) AS BIGINT) AS n_orders, "
    "sum(CAST(o_totalprice AS DECIMAL(30,6))) AS revenue "
    "FROM orders GROUP BY 1), "
    "seq AS (SELECT week_idx, n_orders, revenue, "
    "lag(revenue) OVER (ORDER BY week_idx) AS prev_revenue, "
    "week_idx - lag(week_idx) OVER (ORDER BY week_idx) AS weeks_gap "
    "FROM weekly) "
    "SELECT week_idx, n_orders, CAST(revenue AS DOUBLE) AS revenue, "
    "CAST(prev_revenue AS DOUBLE) AS prev_revenue, "
    "CAST(weeks_gap AS BIGINT) AS weeks_gap, "
    "CAST(revenue - prev_revenue AS DOUBLE) AS delta, "
    + _PCT_FMT.format(cur="revenue", prev="prev_revenue")
    + " AS pct_change_e6 FROM seq ORDER BY week_idx"
)

_Q87_DESCRIPTION = (
    "Q87: week-over-week revenue deltas — integer week indexes (epoch "
    "div, no engine week conventions), DECIMAL dsum revenue (exact, "
    "order-independent), exact DECIMAL delta, percent change as one "
    "double division scaled to e6; first week NULL (no baseline). One "
    "map-side-combined shuffle to the calendar-bounded week frame; the "
    "lag window over that tiny frame is the only single-partition step "
    "(plan-pinned)."
)


@query("q87_weekly_revenue_delta", oracle=_Q87_ORACLE,
       description=_Q87_DESCRIPTION, tags=("relational", "analytics"))
def q87(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tables(spark, sf_dir)["orders"]
    weekly = (
        orders.select(
            F.expr(f"unix_micros(o_orderdate) div {_WEEK_US}")
            .alias("week_idx"),
            "o_totalprice",
        )
        .groupBy("week_idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(30,6)"))
            .alias("revenue"),
        )
    )
    w = Window.orderBy("week_idx")
    seq = weekly.select(
        "week_idx", "n_orders", "revenue",
        F.lag("revenue").over(w).alias("prev_revenue"),
        (F.col("week_idx") - F.lag("week_idx").over(w)).cast("long")
        .alias("weeks_gap"),
    )
    return seq.select(
        "week_idx", "n_orders",
        F.col("revenue").cast("double").alias("revenue"),
        F.col("prev_revenue").cast("double").alias("prev_revenue"),
        "weeks_gap",
        (F.col("revenue") - F.col("prev_revenue")).cast("double")
        .alias("delta"),
        F.expr(_PCT_FMT.format(cur="revenue", prev="prev_revenue"))
        .alias("pct_change_e6"),
    ).orderBy("week_idx")
