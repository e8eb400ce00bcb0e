"""STAGED r20 surface (built late r14, NOT registered — GATE_r14.md's
round-20 note budgets the slot) — q166: largest-remainder token-budget
apportionment — the REALIZATION step after q114's temperature-scaled
mixture weights: given a fixed training-token budget, split it across
sources proportionally to their character mass so the integer
allocations sum EXACTLY to the budget (Hamilton's method: floor
quotas, then one seat per largest remainder). The classic
apportionment algorithm, absent from the registry's sampling family
(q56 draws rows by weight; nothing yet emits an exact-sum integer
allocation plan).

Reference parity: n/a — no analytics surface in the reference;
declared engine surface (SURVEY §2.C extension when registered).

Determinism: quotas are exact integer division of budget * mass by
the total mass; remainders are the exact integer modulus; the bonus
seats go to the largest remainders with ties → source ASC (a total
order both engines share); an exact-sum property (Σ allocation =
budget) is pinned by the replay test. ORDER BY the unique source
key. BIGINT headroom: budget * mass ≤ 1e6 · Σchars — fine to ~9e12
total characters; past that the product moves to DECIMAL(38,0)
(documented seam, the q158 convention).

Scale design (100 TB): ONE map-side-combined aggregation to the
|sources|-row mass frame; everything after (quota, remainder rank,
bonus assignment) is windows over that domain-bounded frame. No
second fact pass, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import query, tables

_BUDGET = 1_000_000  # training tokens to apportion (character-mass proxy)

_Q166_ORACLE = (
    "WITH mass AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS chars "
    "FROM documents GROUP BY source), "
    "tot AS (SELECT CAST(SUM(chars) AS BIGINT) AS total, "
    "CAST(COUNT(*) AS BIGINT) AS n_sources FROM mass), "
    "quota AS (SELECT source, chars, total, "
    f"CAST(({_BUDGET} * chars) // total AS BIGINT) AS base, "
    f"CAST(({_BUDGET} * chars) % total AS BIGINT) AS rem "
    "FROM mass, tot), "
    "short AS (SELECT "
    f"CAST({_BUDGET} - SUM(base) AS BIGINT) AS bonus_seats FROM quota), "
    "ranked AS (SELECT source, chars, base, rem, "
    "CAST(row_number() OVER (ORDER BY rem DESC, source ASC) AS BIGINT) "
    "AS rem_rank FROM quota) "
    "SELECT source, chars, base, rem, rem_rank, "
    "CAST(base + CASE WHEN rem_rank <= bonus_seats THEN 1 ELSE 0 END "
    "AS BIGINT) AS allocation "
    "FROM ranked, short ORDER BY source"
)

_Q166_DESCRIPTION = (
    "Q166: largest-remainder (Hamilton) token-budget apportionment — "
    f"split a {_BUDGET}-token budget across sources proportionally to "
    "character mass with EXACT-SUM integer allocations: floor quotas "
    "by exact integer division, one bonus token-lot per largest "
    "remainder (ties -> source ASC). The realization step after "
    "q114's mixture weights; exact-sum pinned by replay. "
    "Scale-correct: one map-side combine to the |sources| frame; "
    "quotas/ranks/bonuses are windows over that domain-bounded frame."
)


def q166(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables(spark, sf_dir)["documents"]
    mass = d.groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("chars"))
    tot = mass.agg(
        F.sum("chars").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_sources"),
    )
    quota = mass.crossJoin(F.broadcast(tot)).select(
        "source", "chars",
        F.expr(f"cast(({_BUDGET} * chars) div total as bigint)")
        .alias("base"),
        F.expr(f"cast(({_BUDGET} * chars) % total as bigint)")
        .alias("rem"),
    # two consumers (the shortfall aggregate + the remainder ranking)
    # -> cache the |sources|-row quota frame
    ).cache()
    short = quota.agg(
        (F.lit(_BUDGET) - F.sum("base")).cast("long").alias("bonus_seats"))
    wr = Window.orderBy(F.col("rem").desc(), F.col("source").asc())
    ranked = quota.select(
        "source", "chars", "base", "rem",
        F.row_number().over(wr).cast("long").alias("rem_rank"),
    )
    return (
        ranked.crossJoin(F.broadcast(short))
        .select(
            "source", "chars", "base", "rem", "rem_rank",
            (F.col("base")
             + F.when(F.col("rem_rank") <= F.col("bonus_seats"), 1)
             .otherwise(0)).cast("long").alias("allocation"),
        )
        .orderBy("source")
    )


STAGED = {
    "q166_budget_apportionment": (q166, _Q166_ORACLE, _Q166_DESCRIPTION,
                                  ("llm", "sampling")),
}


def register() -> None:
    """r20 registration seam — see joins_ext.register for the pattern."""
    for name, (fn, oracle, desc, tags) in STAGED.items():
        query(name, oracle=oracle, description=desc, tags=tags)(fn)


__all__ = ["q166", "STAGED", "register"]
