"""New r10 surface (seventh batch) — q84: daily volume anomaly
detection — z-score each day's event count against the corpus of days
and flag |z| >= 2 (the freshness/monitoring primitive: every ingest
pipeline alarms on exactly this before a bad backfill or a dead source
poisons downstream aggregates).

Reference parity: n/a — the reference loads on a scheduler tick and
never inspects volume (readme.md:19-20); this is the monitoring op a
production deployment adds first. Declared engine surface (SURVEY §2.C
extension, registered r10).

Days are integer indexes (``unix_micros // 86_400_000_000`` — the q64
lesson: engine date-truncation conventions differ, integer epoch math
does not). Mean and variance derive from EXACT integer sums (Σc, Σc²,
n) in one identical-operand-order double expression per day:

    z = (c - Σc/n) / sqrt((Σc² - (Σc)²/n) / n)

scaled to round(z·1e6) — population variance, biased, deterministic.

Scale design (100 TB): one map-side-combined aggregation to per-day
counts (output bounded by the date dimension); the moment sums are a
1-row aggregate over that tiny frame, broadcast back as a cross — the
event stream is read once and shuffles only day-count partials. The
per-day frame is cached for its two consumers (the q80 lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query, tables

_DAY_US = 86_400_000_000
_Z_FLAG_E6 = 2_000_000  # |z| >= 2.0

# one identical-operand-order double expression; {c}/{s}/{s2}/{n} are
# the day count and the exact integer moment sums. Zero variance (one
# day, or all days identical — exactly the inputs a volume monitor must
# survive) is guarded to z=0: unguarded, Spark's ANSI mode throws
# DIVIDE_BY_ZERO where DuckDB returns NULL. The guard tests the SAME
# double variance expression both engines compute, so it is
# deterministic (<= 0. also absorbs a negative cancellation epsilon).
_VAR_FMT = (
    "((CAST({s2} AS DOUBLE) - (CAST({s} AS DOUBLE) * CAST({s} AS DOUBLE)) "
    "/ CAST({n} AS DOUBLE)) / CAST({n} AS DOUBLE))"
)
_Z_FMT = (
    "CASE WHEN " + _VAR_FMT + " <= 0.0 THEN CAST(0 AS BIGINT) ELSE "
    "CAST(round(((CAST({c} AS DOUBLE) - (CAST({s} AS DOUBLE) / "
    "CAST({n} AS DOUBLE))) / sqrt(" + _VAR_FMT + ")) * 1e6) AS BIGINT) END"
)

_Q84_ORACLE = (
    f"WITH days AS (SELECT epoch_us(ts) // {_DAY_US} AS day_idx, "
    "CAST(count(*) AS BIGINT) AS n_events FROM events GROUP BY 1), "
    "mom AS (SELECT CAST(count(*) AS BIGINT) AS n, "
    "CAST(sum(n_events) AS BIGINT) AS s, "
    "CAST(sum(n_events * n_events) AS BIGINT) AS s2 FROM days) "
    "SELECT day_idx, n_events, "
    + _Z_FMT.format(c="n_events", s="s", s2="s2", n="n")
    + " AS z_e6, "
    + "abs(" + _Z_FMT.format(c="n_events", s="s", s2="s2", n="n")
    + f") >= {_Z_FLAG_E6} AS is_anomaly "
    "FROM days CROSS JOIN mom ORDER BY day_idx"
)

_Q84_DESCRIPTION = (
    "Q84: daily event-volume anomaly flags — integer day indexes "
    "(epoch_us div 86400e6, no engine date-truncation conventions), "
    "z-scores from EXACT integer moment sums in one identical-operand-"
    "order double scaled to e6, |z| >= 2 flagged. One map-side-combined "
    "shuffle to the date-dimension-bounded day frame (cached for its "
    "two consumers); moments are a 1-row broadcast cross."
)


@query("q84_daily_anomalies", oracle=_Q84_ORACLE,
       description=_Q84_DESCRIPTION, tags=("events", "monitoring"))
def q84(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    days = (
        # integer division end-to-end (Spark `div` truncates, DuckDB `//`
        # floors — identical on the non-negative epoch domain)
        ev.select(
            F.expr(f"unix_micros(ts) div {_DAY_US}").alias("day_idx")
        )
        .groupBy("day_idx")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .cache()  # two consumers: moments + the z projection (q80 lesson)
    )
    mom = days.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("n_events").cast("long").alias("s"),
        F.sum(F.expr("n_events * n_events")).cast("long").alias("s2"),
    )
    z = _Z_FMT.format(c="n_events", s="s", s2="s2", n="n")
    return (
        days.crossJoin(F.broadcast(mom))
        .selectExpr(
            "day_idx", "n_events",
            z + " AS z_e6",
            f"abs({z}) >= {_Z_FLAG_E6} AS is_anomaly",
        )
        .orderBy("day_idx")
    )


__all__ = ["q84"]
