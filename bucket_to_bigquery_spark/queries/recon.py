"""STAGED r17 surface (built late r13, NOT registered — GATE_r13.md's
round-17 note budgets the slot) — q135: warehouse referential /
key-integrity reconciliation audit — the standing data-quality scan a
100 TB ingest pipeline runs after every load: orphaned facts, childless
parents, dangling dimension keys, duplicate primary keys, and domain
violations, each reported as one (check, n_bad, n_checked) row.

Complements q73 (single-table value constraints): this audit is the
CROSS-table leg — referential integrity between fact and dimension
tables — which q73's per-row constraint predicates cannot express.

Reference parity: n/a — no analytics surface in the reference; declared
engine surface (SURVEY §2.C extension when registered).

Determinism: pure integer counts; fixed check list; ordered by check
name. The duplicate-PK count is defined as surplus rows
(count(*) − count(DISTINCT key)) so a k-row key group contributes
k − 1 — the number of rows a dedup would remove.

Scale design (100 TB): every check is either one map-side-combined
aggregate over a single fact pass (dup-PK, nonpositive-quantity) or one
left-anti equi-join between fact and parent keyed on the join column —
the production anti-join shape (the q13/q47d discipline). Nothing is
broadcast by force: orders/lineitem are both fact-scale, so the orphan
checks stay plain shuffled anti-joins (AQE may broadcast the filtered
parent at test SFs); the six checks reduce to six bounded 1-row frames
unioned driver-free. No global sort except the 6-row result.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query, tables

_Q135_ORACLE = (
    "WITH checks AS ("
    "SELECT 'orphan_lineitems' AS chk, "
    "CAST((SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN "
    "(SELECT o_orderkey FROM orders)) AS BIGINT) AS n_bad, "
    "CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_checked "
    "UNION ALL "
    "SELECT 'childless_orders', "
    "CAST((SELECT count(*) FROM orders WHERE o_orderkey NOT IN "
    "(SELECT l_orderkey FROM lineitem)) AS BIGINT), "
    "CAST((SELECT count(*) FROM orders) AS BIGINT) "
    "UNION ALL "
    "SELECT 'orders_missing_customer', "
    "CAST((SELECT count(*) FROM orders WHERE o_custkey NOT IN "
    "(SELECT c_custkey FROM customer)) AS BIGINT), "
    "CAST((SELECT count(*) FROM orders) AS BIGINT) "
    "UNION ALL "
    "SELECT 'lineitems_missing_part', "
    "CAST((SELECT count(*) FROM lineitem WHERE l_partkey NOT IN "
    "(SELECT p_partkey FROM part)) AS BIGINT), "
    "CAST((SELECT count(*) FROM lineitem) AS BIGINT) "
    "UNION ALL "
    "SELECT 'duplicate_line_pk', "
    "CAST((SELECT count(*) - count(DISTINCT (l_orderkey, l_linenumber)) "
    "FROM lineitem) AS BIGINT), "
    "CAST((SELECT count(*) FROM lineitem) AS BIGINT) "
    "UNION ALL "
    "SELECT 'nonpositive_quantity', "
    "CAST((SELECT count(*) FROM lineitem WHERE l_quantity <= 0) "
    "AS BIGINT), "
    "CAST((SELECT count(*) FROM lineitem) AS BIGINT)) "
    "SELECT chk, n_bad, n_checked FROM checks ORDER BY chk"
)

_Q135_DESCRIPTION = (
    "Q135: cross-table referential/key-integrity reconciliation audit — "
    "orphaned lineitems, childless orders, dangling customer/part keys, "
    "duplicate (orderkey, linenumber) PKs (counted as surplus rows), "
    "nonpositive quantities; one (check, n_bad, n_checked) row each. "
    "Every check is one left-anti equi-join or one map-side-combined "
    "single-pass aggregate; no forced broadcasts (both orphan sides are "
    "fact-scale), no global sort beyond the 6-row result."
)


def _check(name: str, n_bad, n_checked) -> DataFrame:
    return n_bad.crossJoin(F.broadcast(n_checked)).select(
        F.lit(name).alias("chk"),
        F.col("n_bad").cast("long"),
        F.col("n_checked").cast("long"),
    )


def q135(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    li, orders, cust, part = (
        t["lineitem"], t["orders"], t["customer"], t["part"])

    li_n = li.agg(F.count(F.lit(1)).alias("n_checked"))
    ord_n = orders.agg(F.count(F.lit(1)).alias("n_checked"))

    orphan_li = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_bad"))
    )
    childless = (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_bad"))
    )
    no_cust = (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_bad"))
    )
    no_part = (
        li.join(part, li.l_partkey == part.p_partkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_bad"))
    )
    dup_pk = li.agg(
        (F.count(F.lit(1))
         - F.countDistinct("l_orderkey", "l_linenumber")).alias("n_bad"))
    bad_qty = li.agg(
        F.count(F.when(F.col("l_quantity") <= 0, 1)).alias("n_bad"))

    rows = [
        _check("orphan_lineitems", orphan_li, li_n),
        _check("childless_orders", childless, ord_n),
        _check("orders_missing_customer", no_cust, ord_n),
        _check("lineitems_missing_part", no_part, li_n),
        _check("duplicate_line_pk", dup_pk, li_n),
        _check("nonpositive_quantity", bad_qty, li_n),
    ]
    return reduce(DataFrame.unionAll, rows).orderBy("chk")


STAGED = {
    "q135_referential_audit": (q135, _Q135_ORACLE, _Q135_DESCRIPTION,
                               ("quality", "relational")),
}


def register() -> None:
    """r17 registration seam — see joins_ext.register for the pattern."""
    for name, (fn, oracle, desc, tags) in STAGED.items():
        query(name, oracle=oracle, description=desc, tags=tags)(fn)


__all__ = ["q135", "STAGED", "register"]
