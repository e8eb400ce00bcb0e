"""New r10 surface (sixth batch) — q81: exponential time-decay scoring
— each user's activity summarized as an exponentially-decayed sum of
event values anchored at that user's LAST event (half-life feature
engineering: the "recent activity" signal every ranking / churn /
freshness model consumes; the same shape scores document freshness at
corpus scale).

Reference parity: n/a — no analytics surface in the reference; declared
engine surface (SURVEY §2.C extension, registered r10).

    decayed(u) = Σ_i value_i · exp(-(t_last(u) - t_i) / τ),   τ = 1 day

Determinism (the q49k contract): ages are exact ``unix_micros``
integers; each event's term ``value · exp(-age/τ)`` is ONE double
expression in identical operand order (the only libm call sits inside
the rounding), scaled to round(x·1e6); the per-user total is the
order-independent BIGINT sum.

Scale design (100 TB): one hash exchange on user_id — the anchor
``max(ts)`` is a window over the same partitioning the final group-by
needs, so AQE reuses the exchange (the q63 sessionization shape:
plan-pinned single hash exchange). Per-row work is O(1); no join, no
second pass. The window frame is the full partition but the aggregate
(max) is O(1) state — not a running buffer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import query, tables

_TAU_US = 86_400_000_000  # 1 day in microseconds

_TERM_FMT = (
    "CAST(round(CAST({v} AS DOUBLE) * exp(-(CAST({age} AS DOUBLE) "
    f"/ {float(_TAU_US)})) * 1e6) AS BIGINT)"
)

_Q81_ORACLE = (
    "WITH anchored AS (SELECT user_id, value, "
    "epoch_us(max(ts) OVER (PARTITION BY user_id)) - epoch_us(ts) AS age_us "
    "FROM events), "
    "terms AS (SELECT user_id, "
    + _TERM_FMT.format(v="value", age="age_us")
    + " AS t_e6 FROM anchored) "
    "SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, "
    "CAST(sum(t_e6) AS BIGINT) AS decayed_value_e6 "
    "FROM terms GROUP BY user_id ORDER BY user_id"
)

_Q81_DESCRIPTION = (
    "Q81: per-user exponentially-decayed activity (tau = 1 day) "
    "anchored at the user's last event — ages are exact unix_micros "
    "ints, each term value*exp(-age/tau) one identical-operand-order "
    "double scaled to e6, the total an order-free BIGINT sum (the q49k "
    "contract). The max(ts) anchor window shares the group-by's user_id "
    "partitioning, so the whole query is ONE hash exchange "
    "(plan-pinned, the q63 shape)."
)


@query("q81_time_decay_score", oracle=_Q81_ORACLE,
       description=_Q81_DESCRIPTION, tags=("events", "analytics"))
def q81(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id")
    age = (
        F.unix_micros(F.max("ts").over(w)) - F.unix_micros(F.col("ts"))
    ).alias("age_us")
    return (
        ev.select("user_id", "value", age)
        .select(
            "user_id",
            F.expr(_TERM_FMT.format(v="value", age="age_us")).alias("t_e6"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("t_e6").cast("long").alias("decayed_value_e6"),
        )
        .orderBy("user_id")
    )


__all__ = ["q81"]
