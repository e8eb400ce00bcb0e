"""STAGED r20 surface (built in r14, NOT registered — GATE_r14.md's
round-20 note budgets the slot) — q161: per-source content-checksum
manifest — the table-diff / replication-verification primitive an
ingest pipeline runs to prove two copies of a corpus are identical
without moving the data: per source, exact row and distinct-text
counts plus TWO order-free content checksums (multiset and distinct),
so a dropped row, a duplicated row, or a mutated byte each flip a
different pair of cells.

The checksum is the sum of the established 60-bit md5 fold of the raw
text — the Spark side IMPORTS operators/dedup.shingle_hash (the one
definition, VERDICT r10 #5), the SQL twin restates the one-line fold
inline on this module's own column (the pq_ann/ks "deliberately
edge-free" choice: no contract is shared with q89's shingle pipeline,
only the fold literal, and tests/test_dedup_properties.py already
pins the fold pair on arbitrary strings).

Reference parity: the reference's only integrity device is the
URI-level `_imported` audit table (BucketToBigQuery.js:386-393,
index.js:73 — via loader.py's A15 port); this is the content-level
completion of that idea — declared engine surface (SURVEY §2.C
extension when registered).

Determinism: counts are exact; each checksum is the sum of exact
60-bit integers carried in DECIMAL(38,0) (int64 would wrap past
~2^63/2^60 ≈ 8 rows), then folded to its residue mod the Mersenne
prime 2^61−1 and returned as BIGINT — a raw DECIMAL(38,0) output
exceeds float64 precision and diverges on the driver's pandas
canonicalization (caught by the sf0.1 staging sweep; the q116/q139
packed-word lesson). The residue keeps the full detection power (a
single-row change shifts the sum by a nonzero h < 2^61, which the
modulus cannot cancel). ORDER BY the unique source key.

Scale design (100 TB): ONE documents scan computes the fold map-side;
the multiset checksum combines map-side into the |sources|-row frame;
the distinct leg shuffles (source, h) once — 16-byte rows, the
smallest possible exchange for a distinct-content proof. No window,
no join, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import shingle_hash
from .registry import query, tables

# the one-line SQL twin of operators/dedup.shingle_hash, applied to
# this module's own column (see docstring for why it is restated)
_FOLD_SQL = "CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT)"

_Q161_ORACLE = (
    f"WITH h AS (SELECT source, {_FOLD_SQL} AS h FROM documents), "
    "ms AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_rows, "
    "CAST(SUM(CAST(h AS DECIMAL(38,0))) % 2305843009213693951 AS BIGINT) AS checksum_all "
    "FROM h GROUP BY source), "
    "dh AS (SELECT DISTINCT source, h FROM h), "
    "ds AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_distinct, "
    "CAST(SUM(CAST(h AS DECIMAL(38,0))) % 2305843009213693951 AS BIGINT) "
    "AS checksum_distinct FROM dh GROUP BY source) "
    "SELECT ms.source AS source, n_rows, n_distinct, checksum_all, "
    "checksum_distinct FROM ms JOIN ds ON ms.source = ds.source "
    "ORDER BY source"
)

_Q161_DESCRIPTION = (
    "Q161: per-source content-checksum manifest — exact row/distinct "
    "counts plus order-free multiset and distinct checksums (exact "
    "DECIMAL sums of the established 60-bit md5 text fold, folded to "
    "BIGINT residues mod 2^61-1): "
    "the table-diff primitive that proves two corpus copies identical "
    "without moving data — a dropped, duplicated, or mutated row each "
    "flips a different cell pair. Scale-correct: one scan, map-side "
    "fold + combine; the distinct leg exchanges 16-byte (source, h) "
    "rows once. No window, no driver collect."
)


def q161(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables(spark, sf_dir)["documents"]
    h = d.select("source", shingle_hash(F.col("text")).alias("h"))
    ms = h.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.expr("cast(sum(cast(h as decimal(38,0))) % 2305843009213693951 "
               "as bigint)").alias("checksum_all"),
    )
    ds = (
        h.distinct()
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.expr("cast(sum(cast(h as decimal(38,0))) % 2305843009213693951 "
                   "as bigint)").alias("checksum_distinct"),
        )
    )
    return (
        ms.join(ds, "source")
        .select("source", "n_rows", "n_distinct", "checksum_all",
                "checksum_distinct")
        .orderBy("source")
    )


STAGED = {
    "q161_content_checksum_manifest": (q161, _Q161_ORACLE,
                                       _Q161_DESCRIPTION,
                                       ("ingest", "governance")),
}


def register() -> None:
    """r20 registration seam — see joins_ext.register for the pattern."""
    for name, (fn, oracle, desc, tags) in STAGED.items():
        query(name, oracle=oracle, description=desc, tags=tags)(fn)


__all__ = ["q161", "STAGED", "register"]
