"""New r10 surface — q64: weekly retention cohorts over ``events``.

Reference parity: n/a (no analytics surface in the 589-LoC loader);
part of the declared engine's event-analytics capability (registered
r10, with q63/q63b).

The operation: the standard retention triangle — users cohort by the
week of their FIRST event; each (cohort_week, week_offset) cell counts
the distinct cohort members active offset weeks later. Week indexes are
exact integers from a fixed epoch (``floor(days_since_epoch / 7)``) so
both engines bucket identically — never ``date_trunc('week')``, whose
week-start convention is an engine-config trap.

Scale design (100 TB): three hash shuffles, all on bounded frames. The
(user, week) activity frame dedups first (map-side combine on a pair of
small integers — the raw event volume never reaches the join); the
per-user cohort week aggregates on the same ``user_id`` key the join
consumes, so the exchange is reused (AQE); the final cell count groups
a frame bounded by |users| × |weeks|, not by |events|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query, tables

_EPOCH = "2024-01-01"  # week index 0 starts here (events span Jan 2024)

_WEEK_SQL = f"CAST(floor(date_diff('day', DATE '{_EPOCH}', CAST(ts AS DATE)) / 7) AS BIGINT)"

_Q64_ORACLE = (
    f"WITH activity AS (SELECT DISTINCT user_id, {_WEEK_SQL} AS week "
    "FROM events), "
    "cohorts AS (SELECT user_id, min(week) AS cohort_week FROM activity "
    "GROUP BY user_id) "
    "SELECT c.cohort_week, a.week - c.cohort_week AS week_offset, "
    "CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users "
    "FROM activity a JOIN cohorts c ON a.user_id = c.user_id "
    "GROUP BY c.cohort_week, week_offset ORDER BY cohort_week, week_offset"
)

_Q64_DESCRIPTION = (
    "Q64: weekly retention cohorts — users cohort by first-activity "
    "week; each (cohort_week, week_offset) cell counts distinct cohort "
    "members active that many weeks later (the retention triangle). "
    "Week indexes are exact integer day-diffs from a fixed epoch, never "
    "date_trunc('week') — week-start conventions differ across engines. "
    "The (user, week) frame dedups before anything joins, so event "
    "volume never reaches the join; cohort agg and join share the "
    "user_id exchange."
)


@query("q64_retention_cohorts", oracle=_Q64_ORACLE,
       description=_Q64_DESCRIPTION, tags=("events",))
def q64(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    week = F.floor(
        F.datediff(F.col("ts").cast("date"), F.lit(_EPOCH).cast("date")) / 7
    ).cast("long")
    activity = ev.select("user_id", week.alias("week")).distinct()
    cohorts = activity.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        activity.join(cohorts, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count_distinct(F.col("user_id")).cast("long").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


__all__ = ["q64"]
