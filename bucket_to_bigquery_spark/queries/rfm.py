"""New r10 surface (eighth batch) — q86: RFM customer scoring —
recency / frequency / monetary quintiles over the order history (the
canonical warehouse feature-engineering op for segmentation, churn and
CLV models; the same rank-bucketing shape normalizes any per-entity
feature before training).

Reference parity: n/a — no analytics surface in the reference; declared
engine surface (SURVEY §2.C extension, registered r10).

Measures per customer, all exact: recency = days between the
customer's last order and the corpus's last order (integer epoch-day
difference — the q64/q84 lesson: no engine date-truncation
conventions), frequency = order count, monetary = total spend summed
as DECIMAL(30,6) (order-independent — the registry's dsum contract).
Scores: ``ntile(5)`` over total orders — both engines implement the
same front-loaded-remainder bucketing, and every ORDER BY carries the
customer key as tie-break so the rank input is a total order (ntile on
ties without a tie-break would be engine-dependent). R scores reverse
(recent = 5); the combined segment is the 3-digit ``r*100+f*10+m``.

Scale design (100 TB): one map-side-combined aggregation from the
order stream to the per-customer frame — everything downstream
operates on the CUSTOMER DIMENSION, not the facts. The three ntile
windows are single-partition BY DESIGN over that dimension frame
(bounded: |customers|, the same bound the q82 threshold frame rides);
at a dimension too large for one partition the quintile boundaries
come from approx_percentile + a row-local bucket lookup instead —
documented, same output contract. The fact stream never re-shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import dsum, dsum_sql, query, tables

_DAY_US = 86_400_000_000

_Q86_ORACLE = (
    "WITH cust AS (SELECT o_custkey AS custkey, "
    f"CAST(max(epoch_us(o_orderdate)) // {_DAY_US} AS BIGINT) AS last_day, "
    "CAST(count(*) AS BIGINT) AS frequency, "
    + dsum_sql("o_totalprice", "monetary")
    + " FROM orders GROUP BY o_custkey), "
    "anchor AS (SELECT CAST(max(last_day) AS BIGINT) AS corpus_day FROM cust), "
    "scored AS (SELECT custkey, corpus_day - last_day AS recency_days, "
    "frequency, monetary, "
    "CAST(ntile(5) OVER (ORDER BY corpus_day - last_day DESC, custkey) "
    "AS BIGINT) AS r_score, "
    "CAST(ntile(5) OVER (ORDER BY frequency ASC, custkey) AS BIGINT) "
    "AS f_score, "
    "CAST(ntile(5) OVER (ORDER BY monetary ASC, custkey) AS BIGINT) "
    "AS m_score FROM cust CROSS JOIN anchor) "
    "SELECT custkey, recency_days, frequency, monetary, r_score, f_score, "
    "m_score, r_score * 100 + f_score * 10 + m_score AS rfm_segment "
    "FROM scored ORDER BY custkey"
)

_Q86_DESCRIPTION = (
    "Q86: RFM quintile scoring per customer — one map-side-combined "
    "pass from orders to the customer-dimension frame (recency as "
    "integer epoch-days, frequency exact, monetary as the DECIMAL dsum "
    "contract); ntile(5) with customer-key tie-breaks (total order — "
    "ntile on ties is engine-dependent otherwise) over the bounded "
    "dimension frame; facts never re-shuffle. Higher = better on all "
    "three (recency ordered DESC so recent buyers score 5)."
)


@query("q86_rfm_scores", oracle=_Q86_ORACLE,
       description=_Q86_DESCRIPTION, tags=("relational", "analytics"))
def q86(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tables(spark, sf_dir)["orders"]
    cust = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.expr(f"CAST(max(unix_micros(o_orderdate)) div {_DAY_US} "
               "AS BIGINT)").alias("last_day"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        dsum("o_totalprice", "monetary"),
    ).cache()  # dimension-bounded; the anchor is its second consumer —
    # uncached, the fact aggregation would replay (the q80 lesson)
    anchor = cust.agg(F.max("last_day").cast("long").alias("corpus_day"))
    base = cust.crossJoin(F.broadcast(anchor)).select(
        "custkey",
        (F.col("corpus_day") - F.col("last_day")).alias("recency_days"),
        "frequency", "monetary",
    )
    w_r = Window.orderBy(F.col("recency_days").desc(), F.col("custkey"))
    w_f = Window.orderBy(F.col("frequency").asc(), F.col("custkey"))
    w_m = Window.orderBy(F.col("monetary").asc(), F.col("custkey"))
    scored = base.select(
        "custkey", "recency_days", "frequency", "monetary",
        F.ntile(5).over(w_r).cast("long").alias("r_score"),
        F.ntile(5).over(w_f).cast("long").alias("f_score"),
        F.ntile(5).over(w_m).cast("long").alias("m_score"),
    )
    return scored.select(
        "custkey", "recency_days", "frequency", "monetary",
        "r_score", "f_score", "m_score",
        (F.col("r_score") * 100 + F.col("f_score") * 10
         + F.col("m_score")).cast("long").alias("rfm_segment"),
    ).orderBy("custkey")
