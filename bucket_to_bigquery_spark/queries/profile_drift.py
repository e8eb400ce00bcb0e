"""STAGED r20 surface (built in r14, NOT registered — GATE_r14.md's
round-20 note budgets the slot) — q164: schema-profile drift report
between the early and late halves of the order stream — the
data-contract monitoring primitive that composes q113's single-pass
column-profile idea across TIME: per column, both periods' exact
row/null/distinct counts and the late/early distinct-cardinality
ratio, the signal that catches an upstream enum gaining values, an
ID column collapsing, or a null-rate regression — BEFORE the binned
distribution tests (q96 PSI, q136 KS) even apply.

Reference parity: n/a — the reference trusts upstream schemas
(schema sniffing is ingest-time only, BucketToBigQuery.js:256-282);
declared engine surface (SURVEY §2.C extension when registered).

Determinism: all counts are exact integers; the ratio is the
truncating integer division (late_distinct * 1e6 div early_distinct,
the shared division convention — early is nonempty at every corpus
with pre-pivot rows, and the one all-late corpus the violation tests
plant reports early = 0 with a NULL ratio, mirrored in both
engines). Column names are a FIXED literal list (the q113
convention), so the output is a 6-row frame ordered by the unique
column-name key.

Scale design (100 TB): ONE orders scan feeding ONE wide aggregate
(36 statistics as columns — the multi-count-distinct is planned as a
single Expand over the scan), then a 6-row stack() unpivot of the
1-row result: the scan executes once regardless of the column count
(plan-pinned; the naive per-column UNION ALL reads the fact table
six times — the staging review caught exactly that in the first
cut). The oracle keeps the UNION ALL formulation — same integer
function, which is what the hash compare pins. No window, no driver
collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query, tables

_PIVOT = "1998-01-01"
_COLUMNS = ("o_custkey", "o_orderdate", "o_orderkey",
            "o_orderpriority", "o_orderstatus", "o_totalprice")


def _col_sql(c: str) -> str:
    return (
        f"SELECT '{c}' AS col_name, "
        "CAST(SUM(CASE WHEN early THEN 1 ELSE 0 END) AS BIGINT) "
        "AS early_n, "
        f"CAST(SUM(CASE WHEN early AND {c} IS NULL THEN 1 ELSE 0 END) "
        "AS BIGINT) AS early_null, "
        f"CAST(COUNT(DISTINCT CASE WHEN early THEN {c} END) AS BIGINT) "
        "AS early_distinct, "
        "CAST(SUM(CASE WHEN early THEN 0 ELSE 1 END) AS BIGINT) "
        "AS late_n, "
        f"CAST(SUM(CASE WHEN NOT early AND {c} IS NULL THEN 1 ELSE 0 END) "
        "AS BIGINT) AS late_null, "
        f"CAST(COUNT(DISTINCT CASE WHEN NOT early THEN {c} END) AS BIGINT) "
        "AS late_distinct FROM src"
    )


_Q164_ORACLE = (
    "WITH src AS (SELECT *, "
    f"o_orderdate < TIMESTAMP '{_PIVOT}' AS early FROM orders), "
    "prof AS (" + " UNION ALL ".join(_col_sql(c) for c in _COLUMNS) + ") "
    "SELECT col_name, early_n, early_null, early_distinct, late_n, "
    "late_null, late_distinct, "
    "CASE WHEN early_distinct = 0 THEN NULL ELSE "
    "CAST(late_distinct * 1000000 // early_distinct AS BIGINT) END "
    "AS distinct_ratio_e6 "
    "FROM prof ORDER BY col_name"
)

_Q164_DESCRIPTION = (
    "Q164: schema-profile drift between the early and late halves of "
    "the order stream — per column (fixed literal list, the q113 "
    "convention): both periods' exact row/null/distinct counts and "
    "the truncating-div late/early distinct-cardinality ratio (NULL "
    "when the early period is empty) — the data-contract monitor "
    "that catches enum growth, ID collapse, or null-rate regressions "
    "before binned drift tests apply. Scale-correct: ONE scan feeds "
    "ONE wide 36-statistic aggregate (multi-count-distinct planned "
    "as a single Expand), then a stack() unpivot of the 1-row "
    "result — the scan executes once regardless of column count "
    "(plan-pinned; the oracle keeps the per-column UNION ALL "
    "formulation of the same integer function)."
)


def q164(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables(spark, sf_dir)["orders"]
    src = o.withColumn(
        "early", F.col("o_orderdate") < F.lit(_PIVOT).cast("timestamp"))
    # ONE wide aggregate: 6 stats x 6 columns in a single pass (the
    # per-column UNION ALL alternative scans the fact table 6x)
    aggs = []
    for c in _COLUMNS:
        aggs.extend([
            F.sum(F.when(F.col("early"), 1).otherwise(0))
            .cast("long").alias(f"{c}__early_n"),
            F.sum(F.when(F.col("early") & F.col(c).isNull(), 1)
                  .otherwise(0)).cast("long").alias(f"{c}__early_null"),
            F.countDistinct(F.when(F.col("early"), F.col(c)))
            .cast("long").alias(f"{c}__early_distinct"),
            F.sum(F.when(F.col("early"), 0).otherwise(1))
            .cast("long").alias(f"{c}__late_n"),
            F.sum(F.when(~F.col("early") & F.col(c).isNull(), 1)
                  .otherwise(0)).cast("long").alias(f"{c}__late_null"),
            F.countDistinct(F.when(~F.col("early"), F.col(c)))
            .cast("long").alias(f"{c}__late_distinct"),
        ])
    wide = src.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__early_n, {c}__early_null, {c}__early_distinct, "
        f"{c}__late_n, {c}__late_null, {c}__late_distinct"
        for c in _COLUMNS
    )
    prof = wide.select(F.expr(
        f"stack({len(_COLUMNS)}, {stack_args}) AS "
        "(col_name, early_n, early_null, early_distinct, late_n, "
        "late_null, late_distinct)"
    ))
    return (
        prof.select(
            "col_name", "early_n", "early_null", "early_distinct",
            "late_n", "late_null", "late_distinct",
            F.expr(
                "case when early_distinct = 0 then null else "
                "cast(late_distinct * 1000000 div early_distinct "
                "as bigint) end"
            ).alias("distinct_ratio_e6"),
        )
        .orderBy("col_name")
    )


STAGED = {
    "q164_profile_drift": (q164, _Q164_ORACLE, _Q164_DESCRIPTION,
                           ("governance", "stats")),
}


def register() -> None:
    """r20 registration seam — see joins_ext.register for the pattern."""
    for name, (fn, oracle, desc, tags) in STAGED.items():
        query(name, oracle=oracle, description=desc, tags=tags)(fn)


__all__ = ["q164", "STAGED", "register"]
