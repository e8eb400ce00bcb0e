"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (TPC-H Q1 shape, SURVEY §2.C Q17) on
  /root/testdata/sf0.001.
- ``queries()``: every declared query from SURVEY.md §2.C, one callable
  per entry, (spark, sf_dir) -> DataFrame.
- ``oracle_sql()``: the DuckDB-runnable ANSI SQL equivalent for each query
  (omitted for approx/non-SQL-expressible ops → rows-only check).
"""

from __future__ import annotations

import os
import re
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bucket_to_bigquery_spark.queries import all_queries  # noqa: E402

# ---------------------------------------------------------------------------
# Correctness-gate rotation.
#
# The driver records at most the FIRST 50 entries in name-sorted order; the
# registry is larger (186 as of r15 — count it from ``all_queries()``, do
# not trust a literal here). Entries named here are aliased (leading
# ``q`` -> ``a``)
# so they sort into the window. The set is chosen per round under the
# invariant CHANGED CODE MUST BE IN-WINDOW (mechanized by
# tools/check_gate_rotation.py, run as tests/test_gate_rotation.py):
#
#   1. every entry whose implementing files changed since the last driver
#      round commit is aliased (a regression in changed code must be
#      visible to THIS round's gate), and
#   2. remaining slots rotate through the stalest previously-verified
#      entries (round 8: the two r4-row UDF deferrals q44/q45 — the
#      relational/ingest/streaming migration fills the other 48 slots).
#
# Out-of-window entries keep prior-round evidence: their implementing files
# are untouched, so CORRECTNESS_r{3,4,5} rows still describe current code.
# The original SURVEY §2.C name of an aliased row is recoverable by
# replacing the leading ``a`` with ``q``. NOTE (r11): 50 aliases + 0
# natural-fill slots — see GATE_r11.md's window accounting. When a
# round's changed+stale set exceeds 50 the rotation check fails and
# the round must split its changes across rounds via
# tools/deferred_rotation.json (the r11 scratch split is the
# precedent: 50 in-window + 38 deferred to r12).
# ---------------------------------------------------------------------------
GATE_PRIORITY = frozenset({
    # Round 15 (GATE_r15.md; executes GATE_r13/GATE_r14's "Round-15"
    # plan): the llm_queries.py rotation as the round's ONLY item —
    # this round edits llm_queries.py (the _SIMHASH_SQL hoist from
    # hamming.py, GATE_r13 deferred #5, + the q48b/c/d rows-only
    # declaration narrowing), so the invariant CHANGED CODE => IN-WINDOW
    # pulls the module's full 49-entry dependent set (computed from
    # MODULE_DEPS; the q46-q54 dedup/similarity/text families plus the
    # tokenizer-contract edges q57/q67/q72/q72b/q75/q83/q89/q89b/q93/
    # q95/q98/q102/q105). The 1 remaining slot refreshes the oldest
    # r11 evidence row in name order (q09). q115/q116/q117 + q132/q133
    # stay staged until r16 (their registration would push this set to
    # 52 > 50 — GATE_r13 slot math). Exactly 50.
    #
    # the llm_queries.py dependent set (49)
    "q46_exact_dedup", "q46b_simhash_fingerprint", "q46c_dedup_clusters",
    "q46d_dedup_apply", "q47_ngram_jaccard_pairs",
    "q47b_minhash_lsh_pairs", "q47c_embedding_neardup",
    "q47d_benchmark_decontamination", "q47e_containment_pairs",
    "q47f_embedding_dedup_apply", "q48_cosine_topk", "q48b_ann_lsh_topk",
    "q48c_ivf_topk", "q48d_ivf_prebuilt", "q48e_signgrid_ann",
    "q48f_knn_label_audit", "q49_text_stats", "q49b_length_histogram",
    "q49c_language_id", "q49d_doc_fingerprint", "q49e_quality_filter",
    "q49f_repetition_ratio", "q49g_stratified_sample",
    "q49h_shard_assignment", "q49i_bpe_pretokenize", "q49j_pii_redaction",
    "q49k_tfidf_topterms", "q49l_vocab_coverage", "q49m_bigram_lm_score",
    "q50_multimodal_bytes", "q50b_frame_sampling", "q50c_cdc_chunk_dedup",
    "q51_repeated_substrings", "q52_sequence_packing",
    "q53_substring_scrub", "q54_full_pipeline", "q57_bloom_decontamination",
    "q67_bpe_pair_merge", "q72_leakage_safe_split",
    "q72b_split_leakage_audit", "q75_bm25_topk", "q83_js_divergence",
    "q89_source_overlap", "q89b_source_overlap_minhash",
    "q93_pmi_collocations", "q95_shingle_novelty", "q98_zipf_slope",
    "q102_source_scorecard", "q105_unigram_entropy",
    # stale refresh: the oldest r11 row in name order (35 r11 rows
    # remain after this round; r16 refreshes ~9 more, r17 ~36 slots)
    "q09_inner_join",
})

_NAME_RE = re.compile(r"^q\d+[a-z]?_")


def _gate_name(name: str) -> str:
    """Gate alias: ``q`` -> ``a`` for GATE_PRIORITY entries (sorts first).

    Registry names must match ``q<digits>[variant]_...``; anything else
    would alias/order unpredictably, so fail loudly instead.
    """
    if not _NAME_RE.match(name):
        raise ValueError(f"registry name {name!r} does not match q<NN>[v]_*")
    return "a" + name[1:] if name in GATE_PRIORITY else name


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    q = all_queries()["q17_tpch_q1_shape"]
    return q.builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    items = sorted(
        (_gate_name(name), q) for name, q in all_queries().items()
    )
    return {name: q.builder for name, q in items}


def oracle_sql() -> dict[str, str]:
    items = sorted(
        (_gate_name(name), q) for name, q in all_queries().items()
    )
    return {name: q.oracle for name, q in items if q.oracle is not None}
