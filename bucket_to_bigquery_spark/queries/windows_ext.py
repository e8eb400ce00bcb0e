"""New r10 surface — q68: per-window top-k over the events stream (batch).

Reference parity: n/a; the batch twin of a windowed-leaderboard job
(q36's tumbling windows + q26's top-k-per-group, composed): for every
1-hour tumbling window, the 3 most active users with their event
counts.

Scale design (100 TB): the (window, user) pre-aggregation collapses raw
event volume BEFORE the rank window sees it — the ranking partitions by
window over a frame bounded by |windows| × |active users/window|, never
by |events|, and WindowGroupLimit pushes the rank<=3 filter into each
partition ahead of the final exchange. Hour bucketing is
``date_trunc``, exact in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import query, tables

_TOPK = 3

_Q68_ORACLE = (
    "WITH per_user AS (SELECT date_trunc('hour', ts) AS window_start, "
    "user_id, CAST(count(*) AS BIGINT) AS n_events FROM events "
    "GROUP BY window_start, user_id), "
    "ranked AS (SELECT window_start, user_id, n_events, "
    "CAST(row_number() OVER (PARTITION BY window_start "
    "ORDER BY n_events DESC, user_id ASC) AS BIGINT) AS rank FROM per_user) "
    f"SELECT window_start, rank, user_id, n_events FROM ranked "
    f"WHERE rank <= {_TOPK} ORDER BY window_start, rank"
)

_Q68_DESCRIPTION = (
    "Q68: hourly activity leaderboard — top-3 users by event count per "
    "1-hour tumbling window (rank ties break by user_id). The (window, "
    "user) pre-aggregation collapses event volume before ranking; the "
    "rank window partitions by window over the bounded aggregate frame "
    "with WindowGroupLimit pushing rank<=3 ahead of the exchange "
    "(plan-pinned)."
)


@query("q68_windowed_topk", oracle=_Q68_ORACLE,
       description=_Q68_DESCRIPTION, tags=("events",))
def q68(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    per_user = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("window_start"), "user_id"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    w = Window.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col("user_id").asc()
    )
    return (
        per_user.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= _TOPK)
        .select("window_start", "rank", "user_id", "n_events")
        .orderBy("window_start", "rank")
    )


__all__ = ["q68"]
