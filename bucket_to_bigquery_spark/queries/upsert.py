"""New r10 surface (third batch) — q74: changelog upsert — compact an
append-only keyed changelog to its latest state per key (the
merge-on-read "current snapshot" primitive of every lakehouse table
format, and the companion of q70's SCD-2 FULL-history fold: q70 keeps
every version, q74 keeps exactly the last one).

Reference parity: n/a — the reference appends rows and never updates
(BucketToBigQuery.js:361-365); compacting its append log to
latest-per-key is the standard downstream read repair. Declared engine
surface (SURVEY §2.C extension, registered r10).

The operation: over ``events`` keyed by ``user_id``, keep each key's
newest row under the total order ``(ts, event_id)``, carrying the
latest event's payload plus the key's total change count (so a reader
can distinguish a fresh key from a heavily-churned one).

Scale design (100 TB): latest-row selection is ``max`` over the
``(ts, event_id, payload...)`` STRUCT — struct comparison is
field-order lexicographic and ``(ts, event_id)`` is a total order, so
the max IS the newest row, and because it is an algebraic aggregate
the map side combines each input partition down to ONE candidate per
key before the exchange: the shuffle moves ~|keys| rows, not
|changelog| rows. This beats the window formulation (row_number = 1 +
count-over-partition): the churn count's full-partition frame would
force every row through the shuffle, where partial counts merge for
free. One hash exchange, no Window operator (both plan-pinned). The
DuckDB oracle states the same result relationally (row_number = 1) —
value parity, independent plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query, tables

_Q74_ORACLE = (
    "WITH ranked AS (SELECT user_id, ts, event_id, event_type, value, "
    "row_number() OVER w AS rn, CAST(count(*) OVER "
    "(PARTITION BY user_id) AS BIGINT) AS n_changes FROM events "
    "WINDOW w AS (PARTITION BY user_id ORDER BY ts DESC, event_id DESC)) "
    "SELECT user_id, ts AS latest_ts, event_id AS latest_event_id, "
    "event_type AS latest_type, value AS latest_value, n_changes "
    "FROM ranked WHERE rn = 1 ORDER BY user_id"
)

_Q74_DESCRIPTION = (
    "Q74: changelog upsert — compact the append-only events log to its "
    "newest row per user_id (the lakehouse merge-on-read snapshot; "
    "q70's SCD-2 keeps all versions, this keeps the last). Latest-row "
    "selection is max() over the (ts, event_id, payload) struct: an "
    "algebraic aggregate whose map-side combine reduces every input "
    "partition to one candidate per key BEFORE the exchange — the "
    "shuffle carries ~|keys| rows, not |changelog| rows, and the churn "
    "count merges as partial counts in the same aggregation. One hash "
    "exchange, no Window operator (plan-pinned)."
)


@query("q74_changelog_upsert", oracle=_Q74_ORACLE,
       description=_Q74_DESCRIPTION, tags=("events", "maintenance"))
def q74(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    latest = F.max(
        F.struct("ts", "event_id", "event_type", "value")
    ).alias("latest")
    return (
        ev.groupBy("user_id")
        .agg(latest, F.count(F.lit(1)).cast("long").alias("n_changes"))
        .select(
            "user_id",
            F.col("latest.ts").alias("latest_ts"),
            F.col("latest.event_id").alias("latest_event_id"),
            F.col("latest.event_type").alias("latest_type"),
            F.col("latest.value").alias("latest_value"),
            "n_changes",
        )
        .orderBy("user_id")
    )


__all__ = ["q74"]
