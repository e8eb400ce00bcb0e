"""New r10 surface — q63/q63b: event sessionization and funnel analysis
over the ``events`` stream table (batch analytics twins of the q38
streaming session windows).

Reference parity: n/a — the 589-LoC loader has no analytics surface;
these are part of the declared engine's event-analytics capability
(SURVEY §2.C extension, registered r10).

q63 — gap-based sessionization: the canonical batch formulation (the
same semantics Structured Streaming's ``session_window`` applies
incrementally in q38): per user, a new session starts when the gap to
the previous event exceeds ``_GAP_US``; sessions aggregate to
(n_events, start, end, duration).

Scale design (100 TB): ONE shuffle. The lag/flag/cumsum windows and the
final (user_id, session_idx) aggregation all share the ``user_id``
hash partitioning — Catalyst satisfies the group-by's clustered
distribution from the window's exchange (pinned in
tests/test_plan_shapes.py: exactly one shuffle exchange in the plan).
Timestamps compare as ``unix_micros`` integers — no float time
arithmetic anywhere, so both engines agree exactly.

q63b — ordered funnel (view → click → purchase): per user, the earliest
view, the earliest click AFTER that view, the earliest purchase AFTER
that click; one output row per stage with the surviving user count.
Stage frames join on ``user_id`` (the same key every stage aggregates
on, so AQE reuses the partitioning; no broadcast needed — at warehouse
scale the per-user frames are proportional to the user population).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import query, tables

_GAP_US = 6 * 3600 * 1_000_000  # 6 h session gap, in exact integer micros

_Q63_ORACLE = (
    "WITH flagged AS (SELECT user_id, ts, event_id, "
    "CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w IS NULL "
    f"OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {_GAP_US} "
    "THEN 1 ELSE 0 END AS new_session FROM events "
    "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
    "sessioned AS (SELECT user_id, ts, "
    "CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx FROM flagged) "
    "SELECT user_id, session_idx, CAST(count(*) AS BIGINT) AS n_events, "
    "min(ts) AS session_start, max(ts) AS session_end, "
    "epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us "
    "FROM sessioned GROUP BY user_id, session_idx "
    "ORDER BY user_id, session_idx"
)

_Q63_DESCRIPTION = (
    "Q63: gap-based sessionization of the events stream (batch twin of "
    "q38's streaming session_window) — a 6 h inactivity gap starts a new "
    "session; sessions roll up to event count, start/end, and an exact "
    "integer-microsecond duration. One shuffle total: the lag/cumsum "
    "windows and the (user, session) aggregation all reuse the user_id "
    "partitioning (plan-pinned). Time compares as unix_micros integers — "
    "no float time arithmetic."
)


@query("q63_sessionization", oracle=_Q63_ORACLE,
       description=_Q63_DESCRIPTION, tags=("events",))
def q63(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    flagged = ev.select(
        "user_id", "ts", "event_id",
        F.when(gap.isNull() | (gap > _GAP_US), F.lit(1))
        .otherwise(F.lit(0))
        .alias("new_session"),
    )
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessioned = flagged.select(
        "user_id", "ts",
        F.sum("new_session").over(cum).cast("long").alias("session_idx"),
    )
    return (
        sessioned.groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
            .alias("duration_us"),
        )
        .orderBy("user_id", "session_idx")
    )


_STAGES = (("view", 1), ("click", 2), ("purchase", 3))

_Q63B_ORACLE = (
    "WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events "
    "WHERE event_type = 'view' GROUP BY user_id), "
    "s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e "
    "JOIN s1 ON e.user_id = s1.user_id "
    "WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id), "
    "s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e "
    "JOIN s2 ON e.user_id = s2.user_id "
    "WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id) "
    "SELECT * FROM ("
    "SELECT 1 AS stage, 'view' AS stage_name, "
    "CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users "
    "UNION ALL SELECT 2, 'click', CAST((SELECT count(*) FROM s2) AS BIGINT) "
    "UNION ALL SELECT 3, 'purchase', CAST((SELECT count(*) FROM s3) AS BIGINT)"
    ") ORDER BY stage"
)

_Q63B_DESCRIPTION = (
    "Q63b: ordered conversion funnel view → click → purchase — each stage "
    "keeps users whose stage event strictly follows their previous "
    "stage's earliest qualifying event (min-ts chaining, the standard "
    "funnel definition that a naive per-type count gets wrong). Every "
    "stage joins and aggregates on user_id, so the exchange is reused "
    "stage to stage; output is one row per stage with survivor counts."
)


@query("q63b_event_funnel", oracle=_Q63B_ORACLE,
       description=_Q63B_DESCRIPTION, tags=("events",))
def q63b(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]

    def stage_frame(prev: DataFrame | None, etype: str, tcol: str) -> DataFrame:
        f = ev.where(F.col("event_type") == etype)
        if prev is not None:
            prev_t = prev.columns[-1]
            f = f.join(prev, "user_id").where(F.col("ts") > F.col(prev_t))
        return f.groupBy("user_id").agg(F.min("ts").alias(tcol))

    s1 = stage_frame(None, "view", "t1")
    s2 = stage_frame(s1, "click", "t2")
    s3 = stage_frame(s2, "purchase", "t3")
    rows = None
    for (name, idx), frame in zip(_STAGES, (s1, s2, s3)):
        r = frame.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
            F.lit(idx).alias("stage"),
            F.lit(name).alias("stage_name"),
            "n_users",
        )
        rows = r if rows is None else rows.unionAll(r)
    return rows.orderBy("stage")


__all__ = ["q63", "q63b"]
