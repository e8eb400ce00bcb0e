"""New r10 surface — q66/q66b: join-key skew diagnostics over ``orders``.

Reference parity: n/a; the operational-diagnostics capability every
large-scale join pipeline needs BEFORE it hits the q09b salted-join
remediation: find the heavy keys and quantify the skew, from the data,
cheaply.

q66 — heavy keys: top-20 ``o_custkey`` by order count, with rank and an
exact integer per-myriad share of total rows.

q66b — key-frequency histogram: per-key counts bucketed by bit length
(⌊log2⌋+1 via the binary string — exact integer bucketing, no float
log), with key and row counts per bucket; the shape a planner reads to
pick between broadcast / salt / plain shuffle.

Scale design (100 TB): both are two-level aggregations with map-side
combine — the raw row volume collapses to |keys| at the first groupBy
and to |buckets| ≤ 64 at the second; nothing else shuffles. q66's
global top-20 is TakeOrdered over the |keys| frame (no global sort
materialization, plan-pinned), and its rank window runs on the 20
surviving rows. The total-rows scalar joins back as a broadcast of one
row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import query, tables

_TOPK = 20

_Q66_ORACLE = (
    "WITH per_key AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders "
    "FROM orders GROUP BY o_custkey), "
    "total AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM orders), "
    "ranked AS (SELECT o_custkey, n_orders, "
    "CAST(row_number() OVER (ORDER BY n_orders DESC, o_custkey ASC) AS BIGINT) "
    "AS rank FROM per_key) "
    "SELECT r.rank, r.o_custkey, r.n_orders, "
    "r.n_orders * 10000 // t.n_total AS share_permyriad "
    f"FROM ranked r, total t WHERE r.rank <= {_TOPK} ORDER BY r.rank"
)

_Q66_DESCRIPTION = (
    "Q66: heavy-key report — top-20 o_custkey by order count with rank "
    "and exact integer per-myriad share (integer division; no float "
    "ratios). Map-side-combined groupBy collapses rows to keys, "
    "TakeOrdered picks the top-20 without a global sort (plan-pinned), "
    "the rank window runs over 20 rows, and the total joins as a "
    "broadcast scalar. The report a planner reads before choosing "
    "broadcast/salt/shuffle for a skewed join (q09b's remediation)."
)


@query("q66_heavy_keys", oracle=_Q66_ORACLE,
       description=_Q66_DESCRIPTION, tags=("relational", "skew"))
def q66(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tables(spark, sf_dir)["orders"]
    per_key = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    top = per_key.orderBy(F.col("n_orders").desc(), F.col("o_custkey").asc()).limit(_TOPK)
    w = Window.orderBy(F.col("n_orders").desc(), F.col("o_custkey").asc())
    ranked = top.withColumn("rank", F.row_number().over(w).cast("long"))
    total = orders.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    return (
        ranked.join(F.broadcast(total))
        .select(
            "rank",
            "o_custkey",
            "n_orders",
            # integral DIV, not `/`+cast: double division rounds within
            # half an ulp of an integer once n_total ~ 1e12 (and loses
            # integer precision past 2^53), flipping the floor vs the
            # oracle's exact BIGINT `//` at precisely the design scale
            F.expr("n_orders * 10000L DIV n_total")
            .cast("long")
            .alias("share_permyriad"),
        )
        .orderBy("rank")
    )


_Q66B_ORACLE = (
    "WITH per_key AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n "
    "FROM orders GROUP BY o_custkey) "
    "SELECT CAST(length(bin(n)) AS BIGINT) AS freq_bucket, "
    "CAST(count(*) AS BIGINT) AS n_keys, CAST(sum(n) AS BIGINT) AS n_rows "
    "FROM per_key GROUP BY freq_bucket ORDER BY freq_bucket"
)

_Q66B_DESCRIPTION = (
    "Q66b: key-frequency histogram — per-key order counts bucketed by "
    "bit length (exact integer log2 via the binary-string length, no "
    "float log), with key and row counts per bucket. Two map-side-"
    "combined aggregations: rows collapse to keys, keys to <= 64 "
    "buckets; the distribution shape that separates broadcast-able from "
    "salt-needing joins."
)


@query("q66b_key_frequency_histogram", oracle=_Q66B_ORACLE,
       description=_Q66B_DESCRIPTION, tags=("relational", "skew"))
def q66b(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tables(spark, sf_dir)["orders"]
    per_key = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return (
        per_key.groupBy(
            F.length(F.bin(F.col("n"))).cast("long").alias("freq_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum("n").cast("long").alias("n_rows"),
        )
        .orderBy("freq_bucket")
    )


__all__ = ["q66", "q66b"]
