"""New r10 surface — q65: exact-vs-sketched quantiles per event type.

Reference parity: n/a (no analytics surface in the reference); the
declared engine's distribution-statistics capability (registered r10).

The q19 pattern (tolerance-made-hashable) applied to quantiles: the
entry emits the EXACT interpolated percentiles as round(x·1e6) BIGINTs
(Spark ``percentile`` and DuckDB ``quantile_cont`` implement the same
lower + d·(upper−lower) interpolation; the raw doubles measured
bit-identical on this corpus, but the e6 integer contract stops the
hash from depending on the last ulp of that arithmetic — ADVICE r10
#3, landed r12) next to an
``approx_ok`` boolean gating Spark's mergeable quantile sketch
(``approx_percentile``, GK summary). The gate is RANK-based, not
value-based: the sketch value must lie between the exact quantiles at
p ± 0.02 — scale-free (a value band fails on sparse tails at small n,
where adjacent order statistics sit far apart), and implied by GK's
rank guarantee (ε = 1/accuracy = 0.001 ≪ 0.02, minus the
discrete-vs-interpolated off-by-one). The oracle recomputes the exact
side and asserts the boolean TRUE — a sketch drifting past the rank
band fails the hash.

Scale design (100 TB): ``approx_percentile`` is the scale path — a
bounded-memory mergeable summary with map-side partial aggregation; one
shuffle of sketch partials, never of values. The exact twin exists as
the correctness gate (Spark's exact percentile aggregates a per-group
value→count map — fine for bounded value domains, unbounded memory on
high-cardinality doubles; at warehouse scale you run the sketch and
keep this gate on samples). Same split as q48 exact-vs-ANN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query, tables

_PS = (0.5, 0.95, 0.99)
_RANK_TOL = 0.02  # approx must land between exact quantiles at p ± this
_ACC = 1000  # approx_percentile accuracy knob (1/eps); rank err <= 0.001

# exact quantiles computed at (p-tol, p, min(p+tol, 1)) per target p
_PROBES = tuple(
    (round(p - _RANK_TOL, 4), p, min(round(p + _RANK_TOL, 4), 1.0)) for p in _PS
)

_Q65_ORACLE = (
    "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
    f"CAST(round(quantile_cont(value, {_PS[0]}) * 1e6) AS BIGINT) AS p50_e6, "
    f"CAST(round(quantile_cont(value, {_PS[1]}) * 1e6) AS BIGINT) AS p95_e6, "
    f"CAST(round(quantile_cont(value, {_PS[2]}) * 1e6) AS BIGINT) AS p99_e6, "
    "TRUE AS approx_ok "
    "FROM events GROUP BY event_type ORDER BY event_type"
)

_Q65_DESCRIPTION = (
    "Q65: per-event-type value quantiles — exact interpolated p50/p95/"
    "p99 emitted as round(x*1e6) BIGINTs (ADVICE r10 #3: both engines "
    "implement the same lower + d*(upper-lower) interpolation, but raw "
    "doubles relied on the last ulp of that arithmetic agreeing; the "
    "e6 contract makes the hash robust to it, the q19/q33b pattern) "
    "beside an approx_ok boolean holding Spark's mergeable "
    "approx_percentile sketch inside the exact quantiles at p ± 0.02 "
    "(a rank band, scale-free where a value band breaks on sparse "
    "tails; the q19 tolerance-made-hashable pattern). The sketch is the "
    "100 TB path: bounded-memory partials, one shuffle of summaries, "
    "never of values; the exact twin is the correctness gate."
)


@query("q65_quantile_bands", oracle=_Q65_ORACLE,
       description=_Q65_DESCRIPTION, tags=("events", "approx"))
def q65(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    probe_ps = ", ".join(str(p) for trio in _PROBES for p in trio)
    target_ps = ", ".join(str(p) for p in _PS)
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(f"percentile(value, array({probe_ps}))").alias("exact"),
        F.expr(f"approx_percentile(value, array({target_ps}), {_ACC})").alias(
            "approx"
        ),
    )
    band_ok = F.lit(True)
    for i in range(len(_PS)):
        lo, hi = F.col("exact")[3 * i], F.col("exact")[3 * i + 2]
        a = F.col("approx")[i]
        band_ok = band_ok & (a >= lo) & (a <= hi)
    return g.select(
        "event_type",
        "n",
        F.round(F.col("exact")[1] * 1e6).cast("long").alias("p50_e6"),
        F.round(F.col("exact")[4] * 1e6).cast("long").alias("p95_e6"),
        F.round(F.col("exact")[7] * 1e6).cast("long").alias("p99_e6"),
        band_ok.alias("approx_ok"),
    ).orderBy("event_type")


__all__ = ["q65"]
