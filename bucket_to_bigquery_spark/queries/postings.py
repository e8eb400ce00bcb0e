"""STAGED r20 surface (built late r14, NOT registered — GATE_r14.md's
round-20 note budgets the slot) — q167: inverted-index posting-list
statistics — the IR-statistics primitive FEEDING q75's BM25 scorer:
per term (top-20 by document frequency), the exact document and
collection frequencies, the e6-rounded IDF under the same smoothed
formula family BM25 uses, and the posting-list share of the corpus —
what an index planner reads to size posting lists, pick stop terms,
and sanity-check the BM25 inputs.

Shares the q49/q75 tokenizer contract exactly (operators/dedup.tokens
on the Spark side, llm_queries._TOKS_SQL in the oracle — the
retrieval.py pattern), so every term here keys directly into the q75
index.

Reference parity: n/a — no analytics surface in the reference;
declared engine surface (SURVEY §2.C extension when registered).

Determinism: df/cf are exact integer counts; idf_e6 is ONE IEEE
ln((N+1)/(df+1)) per term over exact integers, e6-rounded (the q98
transcendental contract — identical formula text in both engines);
df_share_e6 is the truncating integer division; top-20 orders by
(df DESC, term ASC), a total order. ORDER BY the same order.

Scale design (100 TB): one tokenize scan → ONE (term, doc) distinct
exchange for df + ONE map-side-combined term count for cf (both
bounded by the vocabulary × document domains, never pair-generating);
the 1-row corpus-count frame broadcasts; top-20 is a distributed
TakeOrdered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import tokens
from .llm_queries import _TOKS_SQL
from .registry import query, tables

_TOP_K = 20

_Q167_ORACLE = (
    f"WITH tok AS (SELECT doc_id, unnest({_TOKS_SQL}) AS term "
    "FROM documents), "
    "cf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cf FROM tok "
    "GROUP BY term), "
    "df AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df "
    "FROM tok GROUP BY term), "
    "nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents) "
    "SELECT df.term AS term, df, cf, "
    "CAST(round(ln((CAST(n_docs AS DOUBLE) + 1.0) / "
    "(CAST(df AS DOUBLE) + 1.0)) * 1e6) AS BIGINT) AS idf_e6, "
    "CAST(df * 1000000 // n_docs AS BIGINT) AS df_share_e6 "
    "FROM df JOIN cf ON df.term = cf.term, nd "
    f"ORDER BY df DESC, term ASC LIMIT {_TOP_K}"
)

_Q167_DESCRIPTION = (
    "Q167: inverted-index posting-list statistics — the top-20 terms "
    "by exact document frequency with collection frequency, "
    "e6-rounded smoothed IDF (one IEEE ln over exact ints per term, "
    "identical formula text in both engines), and truncating-div "
    "corpus share — the IR planning surface feeding q75's BM25 on "
    "the same tokenizer contract. Scale-correct: one tokenize scan, "
    "one (term, doc) distinct + one map-side term combine (domain-"
    "bounded), broadcast 1-row corpus count, distributed TakeOrdered."
)


def q167(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables(spark, sf_dir)["documents"]
    tok = d.select(
        "doc_id", F.explode(tokens("text")).alias("term"))
    # two consumers (cf + df) -> cache the exploded token stream
    tok = tok.cache()
    cf = tok.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("cf"))
    df = (
        tok.select("term", "doc_id").distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    nd = d.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    return (
        df.join(cf, "term")
        .crossJoin(F.broadcast(nd))
        .select(
            "term", "df", "cf",
            F.expr(
                "cast(round(ln((cast(n_docs as double) + 1.0) / "
                "(cast(df as double) + 1.0)) * 1e6) as bigint)"
            ).alias("idf_e6"),
            F.expr("cast(df * 1000000 div n_docs as bigint)")
            .alias("df_share_e6"),
        )
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(_TOP_K)
    )


STAGED = {
    "q167_posting_list_stats": (q167, _Q167_ORACLE, _Q167_DESCRIPTION,
                                ("llm", "retrieval")),
}


def register() -> None:
    """r20 registration seam — see joins_ext.register for the pattern."""
    for name, (fn, oracle, desc, tags) in STAGED.items():
        query(name, oracle=oracle, description=desc, tags=tags)(fn)


__all__ = ["q167", "STAGED", "register"]
