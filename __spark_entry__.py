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
# registry has 143. Entries named here are aliased (leading ``q`` -> ``a``)
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
    # Round 13 (GATE_r13.md; executes GATE_r12.md's "Round-13 plan"):
    # the 15 staged registrations q93-q107 (all value-oracled at two SFs,
    # brute-force replayed, plan-pinned, 10x-probed since r11 — see
    # tests/test_staged_r13*.py) plus the deep stale burn-down — all 9
    # remaining r9 rows, then the 26 oldest r10 rows. Registration
    # touches only queries/__init__.py (infra) + these aliases; no
    # behavioral edit to any previously-registered module this round.
    # Exactly 50.
    #
    # r13 registrations (15)
    "q93_pmi_collocations", "q94_fd_audit", "q95_shingle_novelty",
    "q96_psi_drift", "q97_association_rules", "q98_zipf_slope",
    "q99_interarrival_burstiness", "q100_class_separation",
    "q101_k_anonymity", "q102_source_scorecard", "q103_new_vs_returning",
    "q104_benford_audit", "q105_unigram_entropy",
    "q106_unit_price_dispersion", "q107_correlation_matrix",
    # stale refresh, r9 rows — the oldest evidence anywhere (9)
    "q09b_salted_skew_join", "q11b_full_outer_join",
    "q32_math_funcs", "q33_array_funcs", "q34_map_struct_funcs",
    "q35_conditional_funcs", "q56_mixture_sampling",
    "q56b_mixture_composition", "q49n_heavy_hitters_cms",
    # mid-round registration (GATE_r13.md): the q48h full-oracle IVF
    # top-k variant; its slot evicts the q31c stale-refresh alias (r7
    # q02c precedent — scalar.py untouched, q31c's r10 row stays valid,
    # q31b keeps the view family in-window)
    "q48h_ivf_topk_exact_centroids",
    # mid-round registration #2 (GATE_r13.md): q108 notification-driven
    # ingest; its slot evicts the q72b stale-refresh alias (splits.py
    # untouched, its r10 row stays valid, q72 keeps the family in-window)
    "q108_notification_ingest",
    # mid-round emergency behavioral fix (GATE_r13.md; the documented
    # evict-stale-refresh path): q79's builder moved to the
    # byte-granular Levenshtein contract (raw Spark levenshtein edits
    # code points where DuckDB edits UTF-8 bytes — latent oracle
    # divergence on any non-ASCII name; values unchanged on this ASCII
    # corpus). Slot evicts the q66b stale-refresh alias (keystats.py
    # untouched, its r10 row stays valid, q66 keeps the family
    # in-window).
    "q79_sorted_neighborhood_linkage",
    # stale refresh, oldest r10 rows (24 after the q31c/q66b evictions)
    "q31b_local_time_ordered_view",
    "q33b_vector_norm", "q42_pandas_udf_normalize",
    "q43_apply_in_pandas_zscore", "q57_bloom_decontamination",
    "q58_snapshot_diff", "q59_weighted_sample", "q60_zorder_layout",
    "q61_hll_sketch_union", "q63_sessionization", "q63b_event_funnel",
    "q64_retention_cohorts", "q66_heavy_keys",
    "q67_bpe_pair_merge",
    "q68_windowed_topk", "q69_group_centered_embeddings",
    "q70_scd2_dimension", "q71_document_chunking",
    "q72_leakage_safe_split",
    "q73_quality_constraints", "q74_changelog_upsert",
    "q75_bm25_topk", "q76_frequent_pairs",
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
