"""STAGED r17+ surface (built late r13, NOT registered — GATE_r13.md's
round-17 note budgets the slot) — q147: discrete Kaplan–Meier
survival curve of SESSION durations — the survival-analysis operator
the event-analytics family lacks (q63 builds the sessions; q64
counts cohort retention; survival estimates the session-end process
itself): each q63-contract session's duration is whole minutes
between its first and last event; a session whose last event lies
within the 6 h session gap of the observation cutoff could still be
OPEN, so it is RIGHT-CENSORED (its duration is a lower bound, it
leaves the risk set without an end event); the curve reports, at
every observed completed duration: the at-risk count, completions,
the discrete hazard, and the running log-survival Σ ln(1 − d/n).
(First cut used user LIFETIMES — degenerate on this corpus: every
user's last event sits within 2 days of the cutoff, so a 7-day churn
horizon censored 100% and the curve was empty at every SF; the q116
staging precedent, re-keyed before registration.)

Reference parity: n/a — no analytics surface in the reference;
declared engine surface (SURVEY §2.C extension when registered).

Determinism: sessionization is the q63 contract restated (6 h gap,
(ts, event_id) tie order, integer micros — MODULE_DEPS records the
sessions.py edge); durations and the censor rule are pure integer-µs
arithmetic (cutoff = max event time, derived in-query); risk-set
accounting is exact BIGINT cumulates;
hazard_e6 = d·1e6 div n (the truncating division the convention pin
covers); the log-survival term ln((n−d)/n) is transcendental, so it
follows the q98 contract — each term e12-rounded BEFORE the integer
running sum. When a duration exhausts its risk set (d = n, survival
hits exactly 0) the log is undefined: that row and every later row
report km_log_e12 NULL via an explicit exhaustion flag carried by
the cumulate (NULL-skipping SUM would silently resurrect the curve).
Ordered by duration.

Scale design (100 TB): ONE user-partitioned sessionization window
+ one per-session combine (the q63 shape — the only fact-scale
exchanges), then a count-compress to the (duration, ended, censored)
frame — bounded by the session-length domain in MINUTES,
corpus-size-independent — and every cumulate/window runs on that
tiny frame (the q129/q136 count-compress discipline). The cutoff
(max event time ≡ max session end) reduces from the cached session
frame — one fact pass total — and broadcasts as 1 row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import query, tables

_US_PER_MIN = 60_000_000
_GAP_US = 6 * 3600 * 1_000_000  # the q63 session gap; also the censor horizon

# q98 contract: the transcendental term rounds to an e12 BIGINT per
# row, BEFORE the integer running sum (fixed operand order)
_TERM_E12 = (
    "CAST(round(ln(CAST(n_risk - n_churned AS DOUBLE) / "
    "CAST(n_risk AS DOUBLE)) * 1e12) AS BIGINT)"
)

_Q147_ORACLE = (
    "WITH cutoff AS (SELECT max(epoch_us(ts)) AS cut FROM events), "
    "flagged AS (SELECT user_id, ts, event_id, "
    "CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w IS NULL "
    f"OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {_GAP_US} "
    "THEN 1 ELSE 0 END AS new_session FROM events "
    "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
    "sessioned AS (SELECT user_id, epoch_us(ts) AS us, "
    "CAST(sum(new_session) OVER (PARTITION BY user_id "
    "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) "
    "AS si FROM flagged), "
    "sess AS (SELECT user_id, si, min(us) AS s, max(us) AS e "
    "FROM sessioned GROUP BY user_id, si), "
    "lives AS (SELECT "
    f"(e - s) // {_US_PER_MIN} AS dur, "
    f"CASE WHEN cut - e < {_GAP_US} "
    "THEN 1 ELSE 0 END AS censored FROM sess, cutoff), "
    "cc AS (SELECT dur, CAST(sum(1 - censored) AS BIGINT) AS n_churned, "
    "CAST(count(*) AS BIGINT) AS n_leaving FROM lives GROUP BY dur), "
    "risk AS (SELECT dur, n_churned, "
    "CAST((SELECT count(*) FROM lives) - "
    "coalesce(sum(n_leaving) OVER (ORDER BY dur "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) "
    "AS n_risk FROM cc), "
    "terms AS (SELECT dur, n_churned, n_risk, "
    "CASE WHEN n_churned >= n_risk THEN 1 ELSE 0 END AS exhausted, "
    "CASE WHEN n_churned > 0 AND n_churned < n_risk THEN "
    + _TERM_E12 + " ELSE 0 END AS term FROM risk), "
    "curve AS (SELECT dur, n_churned, n_risk, "
    "CAST(max(exhausted) OVER (ORDER BY dur "
    "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS dead, "
    "CAST(sum(term) OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING) "
    "AS BIGINT) AS km_log FROM terms) "
    "SELECT dur AS dur_min, n_risk, n_churned, "
    "CAST(n_churned * 1000000 // n_risk AS BIGINT) AS hazard_e6, "
    "CASE WHEN dead = 1 THEN NULL ELSE km_log END AS km_log_e12 "
    "FROM curve WHERE n_churned > 0 ORDER BY dur_min"
)

_Q147_DESCRIPTION = (
    "Q147: discrete Kaplan-Meier survival of q63-contract SESSION "
    "durations (whole minutes first->last event; a session ending "
    "within the 6h gap of the corpus cutoff could still be open -> "
    "right-censored, leaves the risk set without an end event) — per "
    "observed completed duration: at-risk count, completions, "
    "hazard_e6 (truncating div), and "
    "running log-survival with each ln((n-d)/n) term e12-rounded "
    "before the integer sum (the q98 contract); an explicit "
    "exhaustion flag NULLs the curve at and after survival 0 "
    "(NULL-skipping SUM would resurrect it). One q63-shape "
    "sessionization + per-session combine, then everything on the "
    "minute-domain-bounded compressed frame (the q129/q136 "
    "discipline)."
)


def q147(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    us = F.expr("unix_micros(ts)")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("us") - F.lag("us").over(wu)
    sessioned = (
        ev.select("user_id", "ts", "event_id", us.alias("us"))
        .withColumn(
            "new_session",
            F.when(gap.isNull() | (gap > _GAP_US), F.lit(1)).otherwise(0),
        )
        .withColumn(
            "si",
            F.sum("new_session").over(
                wu.rowsBetween(Window.unboundedPreceding, 0)
            ).cast("long"),
        )
    )
    # cache: two consumers (the cutoff reduce + the lives projection);
    # cutoff = max event time = max session END, so it derives from the
    # |sessions|-bounded frame — never a second fact-table scan (review
    # finding: the first cut re-scanned events for the max)
    sess = sessioned.groupBy("user_id", "si").agg(
        F.min("us").alias("s"), F.max("us").alias("e")).cache()
    cutoff = sess.agg(F.max("e").alias("cut"))
    lives = sess.crossJoin(F.broadcast(cutoff)).select(
        F.expr(f"(e - s) div {_US_PER_MIN}").alias("dur"),
        F.when(F.col("cut") - F.col("e") < _GAP_US, 1)
        .otherwise(0).alias("censored"),
    )
    # two consumers (duration compress + total count) -> cache; the
    # frame is |sessions|-sized, the compress output minute-bounded
    lives = lives.cache()
    total = lives.agg(F.count(F.lit(1)).alias("n_total"))
    cc = lives.groupBy("dur").agg(
        F.sum(F.lit(1) - F.col("censored")).cast("long")
        .alias("n_churned"),
        F.count(F.lit(1)).cast("long").alias("n_leaving"),
    )
    w_prev = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, -1)
    risk = (
        cc.crossJoin(F.broadcast(total))
        .select(
            "dur", "n_churned",
            (
                F.col("n_total")
                - F.coalesce(F.sum("n_leaving").over(w_prev), F.lit(0))
            ).cast("long").alias("n_risk"),
        )
    )
    terms = risk.select(
        "dur", "n_churned", "n_risk",
        F.when(F.col("n_churned") >= F.col("n_risk"), 1).otherwise(0)
        .alias("exhausted"),
        F.when(
            (F.col("n_churned") > 0)
            & (F.col("n_churned") < F.col("n_risk")),
            F.expr(_TERM_E12),
        ).otherwise(F.lit(0)).alias("term"),
    )
    w_cum = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, 0)
    curve = terms.select(
        "dur", "n_churned", "n_risk",
        F.max("exhausted").over(w_cum).cast("long").alias("dead"),
        F.sum("term").over(w_cum).cast("long").alias("km_log"),
    )
    return (
        curve.where(F.col("n_churned") > 0)
        .select(
            F.col("dur").alias("dur_min"),
            "n_risk", "n_churned",
            F.expr("n_churned * 1000000 div n_risk").cast("long")
            .alias("hazard_e6"),
            F.when(F.col("dead") == 1, F.lit(None).cast("long"))
            .otherwise(F.col("km_log")).alias("km_log_e12"),
        )
        .orderBy("dur_min")
    )


STAGED = {
    "q147_survival_curve": (q147, _Q147_ORACLE, _Q147_DESCRIPTION,
                            ("events", "stats")),
}


def register() -> None:
    """r17+ registration seam — see joins_ext.register for the pattern."""
    for name, (fn, oracle, desc, tags) in STAGED.items():
        query(name, oracle=oracle, description=desc, tags=tags)(fn)


__all__ = ["q147", "STAGED", "register"]
