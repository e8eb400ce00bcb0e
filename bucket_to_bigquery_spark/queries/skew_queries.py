"""Skew-resistant execution surface: the salted-join operator as a
declared, oracle-checked query (SURVEY §4 physical-execution notes).

Salting is plan-level machinery — the RESULT is identical to the plain
join, which is exactly what makes it oracle-checkable: the driver hash
certifies that spreading a hot key across ``salt`` sub-keys changes the
task histogram and nothing else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.salted_join import salted_join
from .registry import dsum, dsum_sql, query, tables


@query(
    "q09b_salted_skew_join",
    oracle=(
        "SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n_items, "
        + dsum_sql("l_quantity", "sum_qty")
        + " FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
        "GROUP BY s_nationkey ORDER BY s_nationkey"
    ),
    description=(
        "Q9b: lineitem⨝supplier through the salted-join operator — every "
        "left key splits into 8 salted sub-keys and the (small but "
        "possibly broadcast-ineligible) right side replicates once per "
        "salt, so a hot supplier's rows spread across 8 tasks instead of "
        "defining the straggler at 100 TB. Results are identical to the "
        "plain join by construction; the oracle hash certifies it."
    ),
)
def q09b(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    left = t["lineitem"].select("l_suppkey", "l_quantity")
    right = t["supplier"].select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    return (
        salted_join(left, right, on=["l_suppkey"], salt=8)
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            dsum("l_quantity", "sum_qty"),
        )
        .orderBy("s_nationkey")
    )
