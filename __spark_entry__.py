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
    # Round 16 (GATE_r16.md; executes GATE_r15's booked plan,
    # tools/r16_similarity_rotation_plan.md): the similarity.py
    # rotation — this round edits operators/similarity.py (ADVICE r12
    # #1's v4 error message + the shared e12 assignment generator
    # folded in from queries/ann_exact.py), so CHANGED CODE =>
    # IN-WINDOW pulls its full 36-entry dependent set (q130, the
    # llm_queries surface q46–q50c, q62). Plus: the 5 registrations
    # held back from r15 (q115/q116/q117 hamming family, q132/q133
    # neardup-CC — staged modules unchanged at registration), the 3
    # entries of the r15 dedup.py deferral RESOLVED this round
    # (tools/deferred_rotation.json deleted; q49n/q55/q55b rotate in
    # for the r15 minhash-persist + Arrow-simhash fixes' out-of-window
    # dependents), and 6 stale refreshes — the oldest r11 evidence
    # rows in name order (q11b carries r13 evidence, so q15 fills the
    # sixth slot). Exactly 50.
    #
    # the operators/similarity.py dependent set (36)
    "q130_lloyd_step_audit", "q46_exact_dedup",
    "q46b_simhash_fingerprint", "q46c_dedup_clusters",
    "q46d_dedup_apply", "q47_ngram_jaccard_pairs",
    "q47b_minhash_lsh_pairs", "q47c_embedding_neardup",
    "q47d_benchmark_decontamination", "q47e_containment_pairs",
    "q47f_embedding_dedup_apply", "q48_cosine_topk", "q48b_ann_lsh_topk",
    "q48c_ivf_topk", "q48d_ivf_prebuilt", "q48e_signgrid_ann",
    "q48f_knn_label_audit", "q48g_ivf_scan_stats",
    "q48h_ivf_topk_exact_centroids", "q49_text_stats",
    "q49b_length_histogram", "q49c_language_id", "q49d_doc_fingerprint",
    "q49e_quality_filter", "q49f_repetition_ratio",
    "q49g_stratified_sample", "q49h_shard_assignment",
    "q49i_bpe_pretokenize", "q49j_pii_redaction", "q49k_tfidf_topterms",
    "q49l_vocab_coverage", "q49m_bigram_lm_score", "q50_multimodal_bytes",
    "q50b_frame_sampling", "q50c_cdc_chunk_dedup",
    "q62_jl_sign_projection",
    # the r16 registrations (5)
    "q115_simhash_hamming_pairs", "q116_dup_inflation",
    "q117_ngram_coverage", "q132_neardup_components", "q133_neardup_apply",
    # the r15 deferral, resolved this round (3)
    "q49n_heavy_hitters_cms", "q55_incremental_dedup",
    "q55b_incremental_dedup_apply",
    # stale refreshes: the 6 oldest r11 evidence rows in name order
    # (29 r11 rows remain after this round; r17's refresh slots burn
    # them down per the standing schedule)
    "q10_broadcast_join_agg", "q11_left_outer_join", "q12_semi_join",
    "q13_anti_join", "q14_range_join", "q15_asof_join",
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
