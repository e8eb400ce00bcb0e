"""New r10 surface (third batch) — q73: declarative data-quality
constraint suite over a loaded table (the pre-publish gate a warehouse
runs between ``loader.run`` and making a partition queryable).

Reference parity: n/a — the 589-LoC loader trusts `maxBadRecords=0` as
its only quality gate (BucketToBigQuery.js load options); a constraint
suite over the LOADED table is the natural extension of that contract
and standard warehouse practice (cf. the Deequ/dbt-test shape:
declarative checks compiled to one aggregation pass — public pattern).

The suite (one output row per constraint, so the gate is driver-visible
as data, not as a log line):

- ``completeness(o_custkey)``  — non-null fraction
- ``uniqueness(o_orderkey)``   — distinct/total fraction
- ``range(o_totalprice>0)``    — in-range fraction
- ``domain(o_orderstatus)``    — membership in {F, O, P}
- ``fk(o_custkey->customer)``  — referential integrity (orphan rows)

Each row carries the measured fraction as an EXACT integer permyriad
(``n_ok * 10000 DIV n_total`` — the q66 lesson: never a double division
where the oracle floors a BIGINT), the violation count, and the
verdict against a declared minimum.

Scale design (100 TB): the four single-table constraints compile to ONE
map-side-combined aggregation over one scan — adding a constraint adds
a column to the aggregate, not a pass over the data (the Deequ
compilation model). The FK check is the one operation that genuinely
needs a second input: a LEFT ANTI join against the dimension's key
column, counted. Dimension keys broadcast when small (here: Catalyst's
choice; at warehouse scale the anti-join shuffles both sides on the
key, which is the correct plan — the orphan count cannot be computed
from any sketch without false verdicts). No collect, no cartesian
(plan-pinned); the 5-row result unions driver-side METADATA frames, not
data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query, tables

_MIN_PERMYRIAD = 10000  # every constraint here is expected watertight

_Q73_ORACLE = (
    "WITH t AS (SELECT CAST(count(*) AS BIGINT) AS n_total, "
    "CAST(count(o_custkey) AS BIGINT) AS n_custkey, "
    "CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct_key, "
    "CAST(sum(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_price_ok, "
    "CAST(sum(CASE WHEN o_orderstatus IN ('F','O','P') THEN 1 ELSE 0 END) "
    "AS BIGINT) AS n_status_ok FROM orders), "
    "fk AS (SELECT CAST(count(*) AS BIGINT) AS n_orphans FROM orders o "
    "WHERE NOT EXISTS (SELECT 1 FROM customer c "
    "WHERE c.c_custkey = o.o_custkey)) "
    "SELECT * FROM ("
    "SELECT 'completeness_o_custkey' AS constraint_name, "
    "n_custkey * 10000 // n_total AS metric_permyriad, "
    "n_total - n_custkey AS n_violations, "
    f"n_custkey * 10000 // n_total >= {_MIN_PERMYRIAD} AS passed FROM t "
    "UNION ALL SELECT 'domain_o_orderstatus', "
    "n_status_ok * 10000 // n_total, n_total - n_status_ok, "
    f"n_status_ok * 10000 // n_total >= {_MIN_PERMYRIAD} FROM t "
    "UNION ALL SELECT 'fk_o_custkey_customer', "
    "(SELECT n_total FROM t) - n_orphans, n_orphans, n_orphans = 0 "
    "FROM fk "
    "UNION ALL SELECT 'range_o_totalprice_pos', "
    "n_price_ok * 10000 // n_total, n_total - n_price_ok, "
    f"n_price_ok * 10000 // n_total >= {_MIN_PERMYRIAD} FROM t "
    "UNION ALL SELECT 'uniqueness_o_orderkey', "
    "n_distinct_key * 10000 // n_total, n_total - n_distinct_key, "
    f"n_distinct_key * 10000 // n_total >= {_MIN_PERMYRIAD} FROM t"
    ") ORDER BY constraint_name"
)

_Q73_DESCRIPTION = (
    "Q73: declarative data-quality constraint suite — completeness, "
    "key uniqueness, numeric range, domain membership, and referential "
    "integrity over the orders table, one output row per constraint "
    "with an exact integer-permyriad metric, violation count, and "
    "verdict. The four single-table checks compile to ONE map-side-"
    "combined aggregation pass (a new constraint is a new column, not a "
    "new scan); the FK check is a counted LEFT ANTI join against the "
    "dimension keys — the only constraint that genuinely needs a second "
    "input. No collect, no cartesian (plan-pinned)."
)

# NOTE for the fk row: metric_permyriad repurposes the column as the
# non-orphan row count; a fraction would always floor to 10000 or 9999
# and hide the actual orphan magnitude. The column stays BIGINT and the
# semantic is per-constraint, declared here and in the oracle.


@query("q73_quality_constraints", oracle=_Q73_ORACLE,
       description=_Q73_DESCRIPTION, tags=("relational", "quality"))
def q73(spark: SparkSession, sf_dir: str) -> DataFrame:
    tabs = tables(spark, sf_dir)
    orders = tabs["orders"]
    stats = orders.agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.count("o_custkey").cast("long").alias("n_custkey"),
        F.countDistinct("o_orderkey").cast("long").alias("n_distinct_key"),
        F.sum((F.col("o_totalprice") > 0).cast("long"))
        .cast("long")
        .alias("n_price_ok"),
        F.sum(F.col("o_orderstatus").isin("F", "O", "P").cast("long"))
        .cast("long")
        .alias("n_status_ok"),
    )
    orphans = (
        orders.join(
            tabs["customer"].select(F.col("c_custkey").alias("o_custkey")),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_orphans"))
    )

    # ONE 1x1 joined row, then inline(array(struct...)) — a 5-way union
    # of selects over `stats` would hand Catalyst five copies of the
    # aggregation subtree and bet on physical exchange reuse; the
    # struct-explode guarantees a single aggregation pass structurally.
    def con(name: str, ok_col: str):
        metric = F.expr(f"{ok_col} * 10000L DIV n_total")
        return F.struct(
            F.lit(name).alias("constraint_name"),
            metric.alias("metric_permyriad"),
            (F.col("n_total") - F.col(ok_col)).alias("n_violations"),
            (metric >= _MIN_PERMYRIAD).alias("passed"),
        )

    fk_con = F.struct(
        F.lit("fk_o_custkey_customer").alias("constraint_name"),
        (F.col("n_total") - F.col("n_orphans")).alias("metric_permyriad"),
        F.col("n_orphans").alias("n_violations"),
        (F.col("n_orphans") == 0).alias("passed"),
    )
    return (
        stats.join(orphans)
        .select(
            F.inline(
                F.array(
                    con("completeness_o_custkey", "n_custkey"),
                    con("domain_o_orderstatus", "n_status_ok"),
                    fk_con,
                    con("range_o_totalprice_pos", "n_price_ok"),
                    con("uniqueness_o_orderkey", "n_distinct_key"),
                )
            )
        )
        .orderBy("constraint_name")
    )


__all__ = ["q73"]
