"""New r10 surface (fourth batch) — q77: last-touch attribution — join
each conversion (``purchase``) to the most recent preceding touch
(``click``/``view``) by the same user, in one pass over the event log
(the marketing-attribution / credit-assignment primitive; the same
shape labels any event stream with "state at the time of X").

Reference parity: n/a — no analytics surface in the reference; declared
engine surface (SURVEY §2.C extension, registered r10).

The operation is a per-key as-of lookup expressed as a running window,
not a join: ``last(touch_payload IGNORE NULLS)`` over (user, ORDER BY
ts, event_id, ROWS UNBOUNDED PRECEDING..CURRENT) carries the newest
touch forward past every row; filtering to purchases afterwards yields
exactly "the last touch at or before each conversion". Unattributed
purchases (no prior touch) survive with NULLs — left semantics.
``event_id`` breaks timestamp ties, so the frame is a total order and
both engines see identical window contents (DuckDB mirrors with
``last_value(... IGNORE NULLS)`` over the same frame). Latency is an
exact integer (``unix_micros`` difference) — no float time.

Scale design (100 TB): ONE hash exchange on user_id + one in-partition
sort — the window formulation replaces the naive per-conversion as-of
join (which would shuffle touches AND conversions, then range-match)
with a single linear pass; the running ``last`` is O(1) state per row.
The purchase filter cannot push below the window (earlier touches must
be seen) but projection pruning keeps the sorted stream narrow. At
warehouse scale the event log is already bucketed by user_id, making
the exchange a no-op (the q63 sessionization note applies verbatim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import query, tables

_TOUCH = ("click", "view")
_CONVERT = "purchase"

# one definition: the oracle interpolates the SAME constants the Spark
# builder uses, so editing _TOUCH/_CONVERT can never desynchronize them
_TOUCH_SQL = ", ".join(f"'{t}'" for t in _TOUCH)

_Q77_ORACLE = (
    "WITH attributed AS (SELECT user_id, event_id, ts, event_type, "
    f"last_value(CASE WHEN event_type IN ({_TOUCH_SQL}) THEN event_id END "
    "IGNORE NULLS) OVER w AS touch_event_id, "
    f"last_value(CASE WHEN event_type IN ({_TOUCH_SQL}) THEN event_type END "
    "IGNORE NULLS) OVER w AS touch_type, "
    f"last_value(CASE WHEN event_type IN ({_TOUCH_SQL}) THEN ts END "
    "IGNORE NULLS) OVER w AS touch_ts "
    "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) "
    "SELECT user_id, event_id AS purchase_id, ts AS purchase_ts, "
    "touch_event_id, touch_type, touch_ts, "
    "epoch_us(ts) - epoch_us(touch_ts) AS us_to_convert, "
    "touch_event_id IS NOT NULL AS attributed "
    f"FROM attributed WHERE event_type = '{_CONVERT}' ORDER BY purchase_id"
)

_Q77_DESCRIPTION = (
    "Q77: last-touch attribution — each purchase joined to the newest "
    "preceding click/view by the same user via a running last(touch "
    "IGNORE NULLS) window over (user, ts, event_id), NOT a per-"
    "conversion as-of join: one hash exchange on user_id + one sort, "
    "O(1) running state (plan-pinned). event_id breaks ts ties so the "
    "frame is a total order on both engines; unattributed purchases "
    "keep NULLs (left semantics); latency is exact unix_micros ints."
)


@query("q77_last_touch_attribution", oracle=_Q77_ORACLE,
       description=_Q77_DESCRIPTION, tags=("events", "analytics"))
def q77(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_touch = F.col("event_type").isin(*_TOUCH)

    def carry(col: str):
        return F.last(F.when(is_touch, F.col(col)), ignorenulls=True).over(w)

    return (
        ev.select(
            "user_id", "event_id", "ts", "event_type",
            carry("event_id").alias("touch_event_id"),
            carry("event_type").alias("touch_type"),
            carry("ts").alias("touch_ts"),
        )
        .where(F.col("event_type") == _CONVERT)
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            "touch_event_id", "touch_type", "touch_ts",
            (F.unix_micros("ts") - F.unix_micros("touch_ts"))
            .alias("us_to_convert"),
            F.col("touch_event_id").isNotNull().alias("attributed"),
        )
        .orderBy("purchase_id")
    )


__all__ = ["q77"]
