"""New r10 surface (ninth batch) — q88: Gini concentration of revenue
per market segment — the inequality metric of a distribution (at
training-data scale the identical computation reports how concentrated
the corpus is over sources/domains — the governance number behind
"one domain is 40 % of the tokens").

Reference parity: n/a — no analytics surface in the reference; declared
engine surface (SURVEY §2.C extension, registered r10).

For each segment, customers sorted by revenue ascending (custkey
tie-break — a total order, so ranks agree across engines):

    G = (2·Σᵢ i·xᵢ) / (n·Σᵢ xᵢ) − (n+1)/n,   i = 1..n ascending rank

Determinism: revenue is held as integer CENTS end-to-end —
``round(o_totalprice·100)`` is exact per row (same double, same
rounding on both engines). Σx and n are exact BIGINTs; Σi·x is summed
as DECIMAL(38,0) (products of two DECIMAL(19,0) casts — integers at
every step, no scale rounding) because its bound is n·Σx, which
outruns 2⁶³ around the terabyte mark: a BIGINT sum would wrap silently
in Spark while DuckDB widens to HUGEINT — exactly the divergence the
decimal path removes. G is ONE double expression over three exact
integers, scaled to round(x·1e6).

Scale design (100 TB): one map-side-combined aggregation from the
order stream to the (segment, customer) revenue frame; the rank window
partitions by segment over that DIMENSION frame (customers, not
facts). Segments are few, so each window partition carries
|customers|/|segments| rows — fine for a dimension; at a dimension too
large per group, the rank comes from a two-phase range-partitioned
prefix count instead (documented, same output contract). The customer
dimension joins broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import query, tables

_G_FMT = (
    "CAST(round(((2.0 * CAST({ixsum} AS DOUBLE)) / (CAST({n} AS DOUBLE) "
    "* CAST({xsum} AS DOUBLE)) - (CAST({n} AS DOUBLE) + 1.0) / "
    "CAST({n} AS DOUBLE)) * 1e6) AS BIGINT)"
)

_Q88_ORACLE = (
    "WITH rev AS (SELECT c.c_mktsegment AS segment, o.o_custkey AS custkey, "
    "CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) "
    "AS rev_c FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
    "GROUP BY c.c_mktsegment, o.o_custkey), "
    "ranked AS (SELECT segment, rev_c, CAST(row_number() OVER "
    "(PARTITION BY segment ORDER BY rev_c, custkey) AS BIGINT) AS i "
    "FROM rev), "
    "agg AS (SELECT segment, CAST(count(*) AS BIGINT) AS n_customers, "
    "CAST(sum(rev_c) AS BIGINT) AS total_cents, "
    "sum(CAST(i AS DECIMAL(19,0)) * CAST(rev_c AS DECIMAL(19,0))) "
    "AS ixsum FROM ranked GROUP BY segment) "
    "SELECT segment, n_customers, total_cents, "
    + _G_FMT.format(ixsum="ixsum", n="n_customers", xsum="total_cents")
    + " AS gini_e6 FROM agg ORDER BY segment"
)

_Q88_DESCRIPTION = (
    "Q88: Gini revenue concentration per market segment — revenue as "
    "exact integer cents (round(price*100) per row, same double both "
    "engines; no decimal-overflow rounding), ascending rank with "
    "custkey tie-break, G one double over three exact BIGINTs scaled "
    "to e6. One fact aggregation to the (segment, customer) dimension "
    "frame; the rank window rides that frame, never the facts; the "
    "customer dimension broadcasts."
)


@query("q88_gini_concentration", oracle=_Q88_ORACLE,
       description=_Q88_DESCRIPTION, tags=("relational", "profiling"))
def q88(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    rev = (
        t["orders"]
        .join(F.broadcast(t["customer"].select("c_custkey", "c_mktsegment")),
              t["orders"].o_custkey == F.col("c_custkey"))
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_custkey").alias("custkey"),
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
            .alias("price_c"),
        )
        .groupBy("segment", "custkey")
        .agg(F.sum("price_c").cast("long").alias("rev_c"))
    )
    w = Window.partitionBy("segment").orderBy("rev_c", "custkey")
    ranked = rev.select(
        "segment", "rev_c",
        F.row_number().over(w).cast("long").alias("i"),
    )
    agg = ranked.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("rev_c").cast("long").alias("total_cents"),
        F.sum(F.expr(
            "CAST(i AS DECIMAL(19,0)) * CAST(rev_c AS DECIMAL(19,0))"
        )).alias("ixsum"),
    )
    return agg.select(
        "segment", "n_customers", "total_cents",
        F.expr(_G_FMT.format(ixsum="ixsum", n="n_customers",
                             xsum="total_cents")).alias("gini_e6"),
    ).orderBy("segment")
