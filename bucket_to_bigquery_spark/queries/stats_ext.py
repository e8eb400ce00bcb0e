"""New r10 surface (sixth batch) — q80: chi-square independence test
(lang × source over ``documents``) — the categorical-association
profiling primitive: a training-data pipeline runs exactly this to
detect that a language is concentrated in one source (sampling bias)
before mixing, the warehouse twin of "is this dimension independent of
that one".

Reference parity: n/a — no analytics surface in the reference; declared
engine surface (SURVEY §2.C extension, registered r10).

    chi2 = Σ_cells (obs - exp)² / exp,   exp = row_tot · col_tot / N
    V    = sqrt(chi2 / (N · min(R-1, C-1)))        (Cramér's V)

Determinism (the q49k contract): all counts are exact integer
aggregates; each CELL contributes one double expression in identical
operand order scaled to round(x·1e6), the statistic is the
order-independent BIGINT sum of those, and Cramér's V is derived from
that already-deterministic integer (one sqrt, rounded again) — no
cross-engine float sum anywhere.

Scale design (100 TB): one map-side-combined aggregation to the
(lang, source) contingency cells — cardinality-bounded output (|langs|
× |sources|), so the margins, N, and the final statistic all compute on
the TINY cell frame (broadcast joins, 1-row crosses); the corpus is
read once and shuffles only cell partials. R/C counted from the cell
frame itself, not extra corpus passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query, tables

# per-cell contribution, identical operand order both engines
_CELL_FMT = (
    "CAST(round((((CAST({o} AS DOUBLE) - ((CAST({rt} AS DOUBLE) * "
    "CAST({ct} AS DOUBLE)) / CAST({n} AS DOUBLE))) * (CAST({o} AS DOUBLE) "
    "- ((CAST({rt} AS DOUBLE) * CAST({ct} AS DOUBLE)) / CAST({n} AS DOUBLE)))) "
    "/ ((CAST({rt} AS DOUBLE) * CAST({ct} AS DOUBLE)) / CAST({n} AS DOUBLE))) "
    "* 1e6) AS BIGINT)"
)

# guard: a single-category dimension makes min(R-1, C-1) = 0 — V is 0
# by convention (chi2 is 0 too: every cell equals its expectation);
# unguarded, Spark's ANSI mode would throw where DuckDB returns NULL.
# Exact integer test, identical on both engines.
_V_FMT = (
    "CASE WHEN {minrc} = 0 THEN CAST(0 AS BIGINT) ELSE "
    "CAST(round(sqrt((CAST({chi2e6} AS DOUBLE) / 1e6) / "
    "(CAST({n} AS DOUBLE) * CAST({minrc} AS DOUBLE))) * 1e6) AS BIGINT) END"
)

_Q80_ORACLE = (
    "WITH cells AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS o "
    "FROM documents GROUP BY lang, source), "
    "rt AS (SELECT lang, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY lang), "
    "ct AS (SELECT source, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY source), "
    "n AS (SELECT CAST(sum(o) AS BIGINT) AS n, "
    "CAST(count(DISTINCT lang) AS BIGINT) AS r, "
    "CAST(count(DISTINCT source) AS BIGINT) AS c FROM cells), "
    "contrib AS (SELECT "
    + _CELL_FMT.format(o="cells.o", rt="rt.rt", ct="ct.ct", n="n.n")
    + " AS c_e6 FROM cells JOIN rt USING (lang) JOIN ct USING (source) "
    "CROSS JOIN n), "
    "stat AS (SELECT CAST(sum(c_e6) AS BIGINT) AS chi2_e6, "
    "CAST(count(*) AS BIGINT) AS n_cells FROM contrib) "
    "SELECT n.r AS n_langs, n.c AS n_sources, n.n AS n_docs, "
    "stat.n_cells, stat.chi2_e6, "
    "CAST((n.r - 1) * (n.c - 1) AS BIGINT) AS dof, "
    + _V_FMT.format(chi2e6="stat.chi2_e6", n="n.n",
                    minrc="least(n.r - 1, n.c - 1)")
    + " AS cramers_v_e6 FROM stat CROSS JOIN n"
)

_Q80_DESCRIPTION = (
    "Q80: chi-square independence of lang × source over documents, with "
    "Cramér's V — one map-side-combined aggregation to the cardinality-"
    "bounded contingency cells; margins/N/statistic computed on the "
    "tiny cell frame (broadcasts + 1-row crosses). Per-cell (o-e)²/e is "
    "one identical-operand-order double scaled to e6; chi2 is the "
    "order-free BIGINT sum; V derives from that integer (one sqrt, "
    "rounded again). The q49k contract — no cross-engine float sum."
)


@query("q80_chi2_independence", oracle=_Q80_ORACLE,
       description=_Q80_DESCRIPTION, tags=("llm", "profiling"))
def q80(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables(spark, sf_dir)["documents"]
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    ).cache()  # cardinality-bounded; margins/N/contrib all re-read it —
    # without this the corpus scan replays once per derived frame
    rt = cells.groupBy("lang").agg(F.sum("o").cast("long").alias("rt"))
    ct = cells.groupBy("source").agg(F.sum("o").cast("long").alias("ct"))
    n = cells.agg(
        F.sum("o").cast("long").alias("n"),
        F.count_distinct("lang").cast("long").alias("r"),
        F.count_distinct("source").cast("long").alias("c"),
    )
    contrib = (
        cells.join(F.broadcast(rt), "lang")
        .join(F.broadcast(ct), "source")
        .crossJoin(F.broadcast(n))
        .select(
            F.expr(_CELL_FMT.format(o="o", rt="rt", ct="ct", n="n"))
            .alias("c_e6")
        )
    )
    stat = contrib.agg(
        F.sum("c_e6").cast("long").alias("chi2_e6"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    )
    return (
        stat.crossJoin(F.broadcast(n))
        .selectExpr(
            "r AS n_langs", "c AS n_sources", "n AS n_docs", "n_cells",
            "chi2_e6",
            "CAST((r - 1) * (c - 1) AS BIGINT) AS dof",
            _V_FMT.format(chi2e6="chi2_e6", n="n",
                          minrc="least(r - 1, c - 1)")
            + " AS cramers_v_e6",
        )
    )


__all__ = ["q80"]
