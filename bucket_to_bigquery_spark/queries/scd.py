"""New r10 surface — q70: SCD Type-2 dimension build from the events
stream (the warehouse CDC shape: an append-only event log folded into
versioned dimension rows with validity intervals).

Reference parity: n/a — the 589-LoC loader appends rows and delegates
querying (BucketToBigQuery.js:361-365); building a slowly-changing
dimension from the loaded log is exactly the downstream query its users
run in the warehouse, so it belongs to the declared engine surface
(SURVEY §2.C extension, registered r10).

The operation: per ``user_id``, ordered by ``(ts, event_id)``, the
user's ``event_type`` is the tracked attribute; every change of value
opens a NEW VERSION. Versions roll up to classic SCD-2 rows —
``(user_id, version, status, valid_from, valid_to, is_current,
n_events)`` — where ``valid_to`` is the next version's ``valid_from``
(NULL on the current row). This is run-length encoding of an attribute
stream plus interval stitching: the same lag/flag/cumsum skeleton as
q63's gap sessionization, but keyed on VALUE CHANGE rather than time
gap, plus a second window (``lead``) to close each interval.

Scale design (100 TB): ONE hash shuffle. The change-flag window, the
cumulative version number, the (user_id, version) rollup, and the
interval-closing ``lead`` all share the ``user_id`` hash partitioning —
Catalyst satisfies every downstream requirement from the first
exchange (pinned in tests/test_plan_shapes.py). State per key is one
row per VERSION, not per event — the rollup happens before the second
window, so the lead sees the already-collapsed frame. No floats
anywhere: ordering and intervals compare as timestamps/integers, so
Spark and the DuckDB oracle agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import query, tables

_Q70_ORACLE = (
    "WITH flagged AS (SELECT user_id, ts, event_id, event_type, "
    "CASE WHEN lag(event_type) OVER w IS NULL "
    "OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg "
    "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
    "versioned AS (SELECT user_id, ts, event_type, "
    "CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version FROM flagged), "
    "runs AS (SELECT user_id, version, min(event_type) AS status, "
    "min(ts) AS valid_from, CAST(count(*) AS BIGINT) AS n_events "
    "FROM versioned GROUP BY user_id, version) "
    "SELECT user_id, version, status, valid_from, "
    "lead(valid_from) OVER wv AS valid_to, "
    "lead(valid_from) OVER wv IS NULL AS is_current, n_events "
    "FROM runs WINDOW wv AS (PARTITION BY user_id ORDER BY version) "
    "ORDER BY user_id, version"
)

_Q70_DESCRIPTION = (
    "Q70: SCD Type-2 dimension build — fold the append-only events log "
    "into versioned dimension rows: per user, each change of event_type "
    "opens a new version; versions carry (status, valid_from, valid_to, "
    "is_current, n_events) with valid_to stitched from the next "
    "version's valid_from (NULL = current). Run-length encoding + "
    "interval stitching in one user_id shuffle (plan-pinned): the "
    "change-flag lag, the cumulative version sum, the version rollup, "
    "and the closing lead all reuse the same hash partitioning."
)


@query("q70_scd2_dimension", oracle=_Q70_ORACLE,
       description=_Q70_DESCRIPTION, tags=("events",))
def q70(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    flagged = ev.select(
        "user_id", "ts", "event_id", "event_type",
        F.when(prev.isNull() | (prev != F.col("event_type")), F.lit(1))
        .otherwise(F.lit(0))
        .alias("chg"),
    )
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    versioned = flagged.select(
        "user_id", "ts", "event_type",
        F.sum("chg").over(cum).cast("long").alias("version"),
    )
    runs = versioned.groupBy("user_id", "version").agg(
        F.min("event_type").alias("status"),
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    nxt = F.lead("valid_from").over(wv)
    return runs.select(
        "user_id", "version", "status", "valid_from",
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
        "n_events",
    ).orderBy("user_id", "version")


__all__ = ["q70"]
