"""New r10 surface — q67: one BPE merge round over the document corpus.

Reference parity: n/a; the tokenizer-induction step of an LLM data
pipeline: given a corpus tokenization, count adjacent token pairs and
rank the top merge candidates — exactly the statistic a BPE trainer
computes per merge iteration (Sennrich et al., "Neural Machine
Translation of Rare Words with Subword Units", ACL 2016). q49i counts
pretokens; this is the next step a vocabulary builder runs on them.

Tokenization parity: Spark tokenizes via ``operators.dedup.tokens`` and
the oracle via llm_queries' ``_TOKS_SQL`` — the ONE shared tokenizer
definition both engines already agree on across the q46–q49 families
(no third private copy to desynchronize; same discipline as q57).

Scale design (100 TB): pair construction is a row-local higher-order
``transform`` + ``explode`` projection (adjacent pairs only — never a
self-join on token position); counting is one map-side-combined
groupBy whose output is |distinct pairs|, not |tokens|; the top-30 is
TakeOrdered over the aggregated frame (no global sort; plan-pinned),
and the rank window runs over the 30 survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.dedup import tokens
from .llm_queries import _TOKS_SQL
from .registry import query, tables

_TOPK = 30

_Q67_ORACLE = (
    f"WITH toks AS (SELECT {_TOKS_SQL} AS t FROM documents), "
    "pairs AS (SELECT unnest(list_transform(range(1, len(t)), "
    "i -> t[i] || ' ' || t[i + 1])) AS pair FROM toks), "
    "counted AS (SELECT pair, CAST(count(*) AS BIGINT) AS n FROM pairs "
    "GROUP BY pair), "
    "ranked AS (SELECT pair, n, CAST(row_number() OVER "
    "(ORDER BY n DESC, pair ASC) AS BIGINT) AS rank FROM counted) "
    f"SELECT rank, pair, n FROM ranked WHERE rank <= {_TOPK} ORDER BY rank"
)

_Q67_DESCRIPTION = (
    "Q67: one BPE merge round — adjacent-token-pair frequencies over the "
    "corpus tokenization (the shared q46-family tokenizer), top-30 merge "
    "candidates with rank. Pair construction is a row-local transform + "
    "explode (no positional self-join); one map-side-combined groupBy "
    "collapses token volume to distinct pairs; TakeOrdered picks the "
    "top-30 without a global sort (plan-pinned). The per-iteration "
    "statistic of a BPE vocabulary trainer."
)


@query("q67_bpe_pair_merge", oracle=_Q67_ORACLE,
       description=_Q67_DESCRIPTION, tags=("llm",))
def q67(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables(spark, sf_dir)["documents"]
    toks = docs.select(tokens(F.col("text")).alias("t"))
    # r17 (the q49m/substring.py lesson, guide §2.4/§6): `.where(size(t)
    # >= 2)` planted `size(<tokenize chain>) >= 2` as a Filter directly
    # above the scan with the chain substituted — every row paid
    # split(...) in the Filter AND again in the pair projection. The
    # when()-guard keeps the predicate out of the Filter: short docs
    # yield a NULL pair array, the OUTER Generate emits their one
    # placeholder row (and blocks InferFiltersFromGenerate), and the
    # explicit null filter drops them — exact inner semantics, since
    # real pairs are concat_ws products (never null).
    pair_arr = F.when(
        F.size("t") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("t") - 1),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("t"), i),
                F.element_at(F.col("t"), i + 1),
            ),
        ),
    )
    pairs = (
        toks.select(F.explode_outer(pair_arr).alias("pair"))
        .where(F.col("pair").isNotNull())
    )
    counted = pairs.groupBy("pair").agg(F.count(F.lit(1)).cast("long").alias("n"))
    top = counted.orderBy(F.col("n").desc(), F.col("pair").asc()).limit(_TOPK)
    w = Window.orderBy(F.col("n").desc(), F.col("pair").asc())
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "pair", "n")
        .orderBy("rank")
    )


__all__ = ["q67"]
