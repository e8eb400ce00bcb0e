"""New r10 surface (eighth batch) — q85: first-order Markov transition
estimation over the event stream — per-user event sequences yield the
(state → next state) count matrix and row-normalized transition
probabilities (the sequence-modeling primitive: next-action prediction
features, funnel leak detection, and bot detection all start from this
matrix; over documents the same shape estimates token bigram chains —
q49m's LM is the text twin).

Reference parity: n/a — no analytics surface in the reference; declared
engine surface (SURVEY §2.C extension, registered r10).

Transitions are consecutive (by ``ts``, ``event_id``-tie-broken) event
pairs WITHIN a user — sequences never cross users. Probabilities are
``count / row_total`` as one identical-operand-order double scaled to
round(x·1e6) from exact integer counts (the q49k contract without the
transcendental: a single division).

Scale design (100 TB): one hash exchange on user_id for the lag window
(O(1) running state), then one map-side-combined aggregation to the
(state, next) matrix — output bounded by |event types|², so the
row-total join is a broadcast over a tiny frame. The event stream is
read once and never re-partitions after the user exchange (the count
matrix shuffle moves |types|²-bounded partials).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import query, tables

_P_FMT = (
    "CAST(round((CAST({c} AS DOUBLE) / CAST({t} AS DOUBLE)) * 1e6) "
    "AS BIGINT)"
)

_Q85_ORACLE = (
    "WITH seq AS (SELECT user_id, event_type AS state, "
    "lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
    "AS next_state FROM events), "
    "trans AS (SELECT state, next_state, CAST(count(*) AS BIGINT) AS n "
    "FROM seq WHERE next_state IS NOT NULL GROUP BY state, next_state), "
    "tot AS (SELECT state, CAST(sum(n) AS BIGINT) AS row_total FROM trans "
    "GROUP BY state) "
    "SELECT t.state, t.next_state, t.n, tot.row_total, "
    + _P_FMT.format(c="t.n", t="tot.row_total")
    + " AS p_e6 FROM trans t JOIN tot USING (state) "
    "ORDER BY state, next_state"
)

_Q85_DESCRIPTION = (
    "Q85: first-order Markov transition matrix over per-user event "
    "sequences — lead window (one user_id exchange, O(1) state), then "
    "one map-side-combined aggregation to the |types|^2-bounded count "
    "matrix; row totals broadcast back over the tiny frame. "
    "Probabilities are exact-int counts through one division scaled to "
    "e6 (plan-pinned on the single fact exchange)."
)


@query("q85_markov_transitions", oracle=_Q85_ORACLE,
       description=_Q85_DESCRIPTION, tags=("events", "analytics"))
def q85(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            F.col("event_type").alias("state"),
            F.lead("event_type").over(w).alias("next_state"),
        )
        .where(F.col("next_state").isNotNull())
        .groupBy("state", "next_state")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        # |types|²-bounded; two consumers (row totals + the join left
        # side) — cached so the event stream provably reads once
        # rather than relying on exchange reuse (the q80 lesson)
        .cache()
    )
    tot = trans.groupBy("state").agg(
        F.sum("n").cast("long").alias("row_total")
    )
    return (
        trans.join(F.broadcast(tot), "state")
        .select(
            "state", "next_state", "n", "row_total",
            F.expr(_P_FMT.format(c="n", t="row_total")).alias("p_e6"),
        )
        .orderBy("state", "next_state")
    )


__all__ = ["q85"]
