"""STAGED r20 surface (built late r14, NOT registered — GATE_r14.md's
round-20 note budgets the slot) — q165: boilerplate shingle detection
— the preprocessing signal BETWEEN exact dedup (whole documents) and
ExactSubstr (long spans): 5-gram shingles that recur across many
DISTINCT documents are headers/footers/templates a training-data
pipeline strips before near-dup mining, because they inflate every
pairwise similarity (the q47/q47b candidate sets) without carrying
content. Reports the top-20 most-shared shingles by document
frequency with their source spread and corpus share.

Shares the q47 shingle contract exactly (operators/dedup
tokens/shingles/shingle_hash on the Spark side, llm_queries
_TOKS_SQL/_SH5_SQL + the overlap.py fold literal in the oracle — the
q89 pattern), so a boilerplate hash from this report can be joined
directly against the q47-family inverted indexes.

Reference parity: n/a — no analytics surface in the reference;
declared engine surface (SURVEY §2.C extension when registered).

Determinism: document frequencies are exact distinct counts over the
60-bit fold keys; the top-20 orders by (df DESC, h ASC) — a total
order; df_share_e6 is the truncating integer division by the corpus
document count. ORDER BY is the same unique total order.

Scale design (100 TB): one tokenize/shingle scan emits (h, doc_id,
source) with the 8-byte fold key (VERDICT r10 #5 — the exchanges
never move shingle strings); ONE distinct + ONE map-side-combined
count per key; the 1-row document-count frame broadcasts; top-20 is
a distributed TakeOrdered. No pair generation anywhere — this is the
operator that makes the PAIR stages cheaper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import shingle_hash, shingles, tokens
from .llm_queries import _SH5_SQL, _TOKS_SQL
from .registry import query, tables

_TOP_K = 20
# the overlap.py fold literal (one-line SQL twin of shingle_hash)
_FOLD_SQL = "CAST(('0x' || substr(md5(sh), 1, 15)) AS BIGINT)"

_Q165_ORACLE = (
    f"WITH tok AS (SELECT doc_id, source, {_TOKS_SQL} AS t FROM documents), "
    f"raw AS (SELECT doc_id, source, unnest({_SH5_SQL}) AS sh FROM tok), "
    f"h AS (SELECT DISTINCT doc_id, source, {_FOLD_SQL} AS h FROM raw), "
    "df AS (SELECT h, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df, "
    "CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources FROM h "
    "GROUP BY h), "
    "nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents) "
    "SELECT h, df, n_sources, "
    "CAST(df * 1000000 // n_docs AS BIGINT) AS df_share_e6 "
    "FROM df, nd "
    f"ORDER BY df DESC, h ASC LIMIT {_TOP_K}"
)

_Q165_DESCRIPTION = (
    "Q165: boilerplate shingle detection — the top-20 5-gram shingles "
    "by exact document frequency (df DESC, hash ASC), with source "
    "spread and truncating-div corpus share: the template/header "
    "stripping signal between whole-document dedup and ExactSubstr "
    "span mining, on the exact q47 shingle contract (joinable against "
    "the q47-family indexes). Scale-correct: one tokenize/shingle "
    "scan to 8-byte fold keys, one distinct + one combine, broadcast "
    "1-row doc count, distributed TakeOrdered — no pair generation."
)


def q165(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables(spark, sf_dir)["documents"]
    h = d.select(
        "doc_id", "source",
        F.explode(shingles(tokens("text"), 5)).alias("raw_sh"),
    ).select("doc_id", "source", shingle_hash(F.col("raw_sh")).alias("h"))
    # ONE aggregation with both distincts (a single Expand over the
    # stream, no separate pre-distinct exchange). Measured: both
    # shapes probe ~2.4-2.7x on 10x data — the tokenize/shingle scan
    # itself is the wall (sub-linear either way); this one moves the
    # stream through one exchange instead of two
    df = h.groupBy("h").agg(
        F.countDistinct("doc_id").cast("long").alias("df"),
        F.countDistinct("source").cast("long").alias("n_sources"),
    )
    nd = d.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    return (
        df.crossJoin(F.broadcast(nd))
        .select(
            "h", "df", "n_sources",
            F.expr("cast(df * 1000000 div n_docs as bigint)")
            .alias("df_share_e6"),
        )
        .orderBy(F.col("df").desc(), F.col("h").asc())
        .limit(_TOP_K)
    )


STAGED = {
    "q165_boilerplate_shingles": (q165, _Q165_ORACLE, _Q165_DESCRIPTION,
                                  ("llm", "governance")),
}


def register() -> None:
    """r20 registration seam — see joins_ext.register for the pattern."""
    for name, (fn, oracle, desc, tags) in STAGED.items():
        query(name, oracle=oracle, description=desc, tags=tags)(fn)


__all__ = ["q165", "STAGED", "register"]
