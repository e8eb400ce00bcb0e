"""Corpus-trained n-gram language-model scoring (SURVEY §2.C Q49m).

The CCNet-style perplexity-filter primitive: train a maximum-likelihood
bigram model ON the corpus itself and score every document by its mean
conditional log-probability — no external model artifact. Determinism
follows the repo-wide discipline: per-term ``round(ln(·), 6)`` (the
cross-engine ln contract q32 proves) plus exact decimal-sum averaging.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import tokens


def bigram_lm_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """→ (doc_id, n_bigrams, avg_logprob) for every doc with ≥1 bigram.

    ``avg_logprob`` = mean over the doc's bigram OCCURRENCES of
    ``round(ln(c(ab)/c(a·)), 6)`` where counts come from the whole
    corpus (MLE conditional p(b|a); every scored bigram is in the
    counts by construction, so no smoothing is needed).

    Scale shape: the count tables are vocabulary-bounded (bigram TYPES)
    and map-side-combined; prefix totals derive from the bigram counts
    by a window over the aggregated table (na = Σ_b nab) rather than a
    second corpus pass, so the corpus text is read exactly twice (probe
    stream + count build) and the probe joins the single stats table by
    broadcast — it never shuffles on the Zipf-skewed prefix key. A
    production pipeline materializes the count table once (it IS the
    model artifact) and reuses it across scoring runs.
    """
    toks = df.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("t"))
    # r16 (the operators/substring.py lesson): `.where(size(t) >= 2)`
    # plants `size(<tokenize chain>) >= 2` as a Filter directly above the
    # scan with the chain substituted — every row then pays split(...) in
    # the Filter AND again in the projection, on BOTH corpus passes
    # (count build + probe stream; isolated cpu 5.92 -> 4.35 s at sf0.1).
    # A when()-guard keeps the predicate out of the Filter entirely:
    # short docs yield a NULL bigram array, the OUTER Generate
    # emits their one placeholder row (and, being outer, also blocks
    # InferFiltersFromGenerate), and the explicit null filter drops them
    # — exact inner semantics, since real bigram structs are never null.
    bg_arr = F.when(
        F.size("t") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("t") - 2),
            lambda i: F.struct(
                F.get("t", i).alias("a"),
                F.get("t", i + 1).alias("b"),
            ),
        ),
    )
    big = (
        toks.select("doc_id", F.explode_outer(bg_arr).alias("bg"))
        .where(F.col("bg").isNotNull())
        .select("doc_id", "bg.a", "bg.b")
    )
    cab = big.groupBy("a", "b").agg(F.count(F.lit(1)).alias("nab"))
    stats = cab.withColumn("na", F.sum("nab").over(Window.partitionBy("a")))
    return (
        big.join(stats, ["a", "b"])
        .select(
            "doc_id",
            F.round(
                F.log(F.col("nab").cast("double") / F.col("na")), 6
            ).alias("lp"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            # mirrors queries/registry.davg (order-independent decimal
            # average) inline: operators/ must not import from queries/,
            # so the one-expression duplication is the lesser coupling
            (
                F.sum(F.col("lp").cast("decimal(30,6)")).cast("double")
                / F.count("lp")
            ).alias("avg_logprob"),
        )
    )
