"""Interleaved A/B of the substring wins-chain shapes (q53 full scrub).

This host's two scheduling regimes make separate-session wall clocks
undecidable for small deltas; alternating OLD/NEW executions inside ONE
session gives both shapes the same regime. OLD = the pre-r16-session
wins chain (pushed size(split)>=W scan filter, inner posexplode);
NEW = the committed operators/substring.py (when-guard + posexplode_outer
+ isNotNull). Both run the FULL q53 pipeline (substring_scrub over the
materialized dedup corpus + md5 projection + orderBy) to the noop sink.

Usage: python tools/ab_substring_r16.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from bench import _calibrate, _execute, _sweep_state, _warm_python_workers  # noqa: E402
from bucket_to_bigquery_spark.operators.dedup import shingle_hash, tokens  # noqa: E402
from bucket_to_bigquery_spark.operators.substring import substring_scrub  # noqa: E402
from bucket_to_bigquery_spark.queries.llm_queries import _dedup_corpus  # noqa: E402
from bucket_to_bigquery_spark.session import get_spark  # noqa: E402

W = 8


def _old_scrub(df):
    """The pre-session repeated_substring_ranges + scrub, verbatim."""
    sc = df.sparkSession.sparkContext
    toks_f = (
        df.select(F.col("doc_id"), tokens("text").alias("t"))
        .where(F.size("t") >= W)
    )
    wins = (
        toks_f.select(
            "doc_id",
            F.size("t").alias("n_tokens"),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - (W - 1)),
                    lambda i: shingle_hash(
                        F.concat_ws(" ", F.slice(F.col("t"), i, W))
                    ),
                )
            ).alias("pos0", "whash"),
        )
        .select("doc_id", "n_tokens", (F.col("pos0") + 1).alias("pos"), "whash")
        .repartition(sc.defaultParallelism, "whash")
    )
    dup = (
        wins.groupBy("whash")
        .agg(F.count_distinct("doc_id").alias("df_docs"))
        .where(F.col("df_docs") >= 2)
        .select("whash")
    )
    marked = wins.join(dup, "whash").select("doc_id", "n_tokens", "pos")
    w_ord = Window.partitionBy("doc_id").orderBy("pos")
    brk = marked.select(
        "doc_id", "n_tokens", "pos",
        F.when(F.col("pos") > F.lag("pos").over(w_ord) + W, F.lit(1))
        .otherwise(F.lit(0)).alias("b"),
    )
    isl = brk.select(
        "doc_id", "n_tokens", "pos",
        F.sum("b").over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island"),
    )
    ranges = isl.groupBy("doc_id", "n_tokens", "island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + (W - 1)).alias("span_end"),
        (F.max("pos") - F.min("pos") + W).alias("span_tokens"),
    ).drop("island")
    covered = ranges.select(
        "doc_id", F.explode(F.sequence("span_start", "span_end")).alias("p")
    )
    toks = df.select(F.col("doc_id"), tokens("text").alias("t"))
    toks_pos = toks.select(
        "doc_id", F.posexplode("t").alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "tok")
    clean = (
        toks_pos.join(covered, ["doc_id", "p"], "left_anti")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("p", "tok"))),
                    lambda s: s["tok"],
                ), " ",
            ).alias("clean_text"),
            F.count(F.lit(1)).cast("long").alias("n_kept"),
        )
    )
    base = toks.select("doc_id", F.size("t").cast("long").alias("n_tokens"))
    return base.join(clean, "doc_id", "left").select(
        "doc_id",
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        "n_tokens",
        F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
        (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0).cast("long")))
        .alias("n_removed"),
    )


def _q53_shape(scrubbed):
    return scrubbed.select(
        "doc_id", F.md5("clean_text").alias("clean_md5"),
        "n_tokens", "n_kept", "n_removed",
    ).orderBy("doc_id")


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    rounds = int(args[1]) if len(args) > 1 else 4
    spark = get_spark("b2bqs-ab-substring-r16")
    spark.sparkContext.setLogLevel("ERROR")
    _warm_python_workers(spark)

    corpus = _dedup_corpus(spark, sf_dir)
    old_df = _q53_shape(_old_scrub(corpus))
    new_df = _q53_shape(
        substring_scrub(corpus, "doc_id", "text", window=W, min_doc_freq=2)
    )
    # warm both (untimed)
    _execute(old_df)
    _execute(new_df)
    _sweep_state(spark)

    olds, news = [], []
    for r in range(rounds):
        for label, df, acc in (("old", old_df, olds), ("new", new_df, news)):
            _sweep_state(spark)
            t0 = time.perf_counter()
            _execute(df)
            dt = round(time.perf_counter() - t0, 3)
            acc.append(dt)
            print(f"round {r} {label}: {dt} calib={_calibrate(spark)}",
                  file=sys.stderr)
    olds_s, news_s = sorted(olds), sorted(news)
    print({"old": olds, "new": news,
           "old_median": olds_s[len(olds_s) // 2],
           "new_median": news_s[len(news_s) // 2],
           "old_min": olds_s[0], "new_min": news_s[0]})


if __name__ == "__main__":
    main()
