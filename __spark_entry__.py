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
# replacing the leading ``a`` with ``q``. NOTE (r10): 48 aliases + 2
# natural-fill slots — see GATE_r10.md's window accounting. When a
# round's changed+stale set exceeds 50 the rotation check fails and
# the round must split its changes (the r11 scratch plan does exactly
# this).
# ---------------------------------------------------------------------------
GATE_PRIORITY = frozenset({
    # changed this round (r10): the audit-URI rebase (VERDICT r9 #4 /
    # ADVICE r8 #2) touches ingest/loader.py + queries/ingest_queries.py
    # + queries/maintenance.py — the whole q04 family is in-window.
    "q04_ingest_partitioned_sink", "q04b_imported_audit",
    "q04c_partition_pruned_scan", "q04d_catalog_sql", "q04e_compaction",
    # newly registered this round (r10): the r9-staged surface (GATE_r09
    # plan #0) — first-ever driver rows, so all 6 take slots. Only q59's
    # rank-surrogate fix and bloom comments changed pre-registration;
    # both modules' entries are in-window regardless (new entries).
    "q57_bloom_decontamination", "q58_snapshot_diff",
    "q59_weighted_sample", "q60_zorder_layout", "q61_hll_sketch_union",
    "q62_jl_sign_projection",
    # stale rotation (r10), GATE_r09 plan #1: the 6 oldest rows in the
    # repo — q31b/q31c (r6), q33b/q42/q43/q02c (r7). Zero code change;
    # after this round the oldest evidence anywhere is r8.
    "q31b_local_time_ordered_view", "q31c_stacked_views",
    "q33b_vector_norm", "q42_pandas_udf_normalize",
    "q43_apply_in_pandas_zscore", "q02c_xml_scan_roundtrip",
    # new surface registered this round (r10) in NEW modules — each entry
    # costs its own slot and pulls only its own module (+ mapped deps);
    # see GATE_r10.md window accounting.
    "q63_sessionization", "q63b_event_funnel", "q64_retention_cohorts",
    "q65_quantile_bands", "q66_heavy_keys", "q66b_key_frequency_histogram",
    "q67_bpe_pair_merge", "q68_windowed_topk",
    "q69_group_centered_embeddings",
    # second r10 batch (new modules scd/chunking/splits): SCD-2 build,
    # overlapping chunking, leakage-safe split + audit.
    "q70_scd2_dimension", "q71_document_chunking",
    "q72_leakage_safe_split", "q72b_split_leakage_audit",
    # third r10 batch (new modules quality/upsert): constraint suite,
    # changelog upsert.
    "q73_quality_constraints", "q74_changelog_upsert",
    # fourth r10 batch (new modules retrieval/basket/attribution): BM25
    # top-k, frequent pairs, last-touch attribution.
    "q75_bm25_topk", "q76_frequent_pairs", "q77_last_touch_attribution",
    # fifth r10 batch (new modules graphs/linkage): integer-contract
    # PageRank, degree-oriented triangles, sorted-neighborhood linkage.
    "q78_pagerank", "q78b_triangle_count",
    "q79_sorted_neighborhood_linkage",
    # sixth r10 batch (new modules stats_ext/decay/skyline): chi-square
    # independence, time-decay scoring, Pareto frontier.
    "q80_chi2_independence", "q81_time_decay_score", "q82_skyline_orders",
    # seventh r10 batch (new modules shift/anomaly): JS-divergence
    # distribution shift, daily volume anomaly flags.
    "q83_js_divergence", "q84_daily_anomalies",
    # eighth r10 batch (new modules markov/rfm/trend): transition
    # matrix, RFM quintile scoring, weekly revenue deltas.
    "q85_markov_transitions", "q86_rfm_scores",
    "q87_weekly_revenue_delta",
    # ninth (final) r10 batch (new modules concentration/overlap): Gini
    # concentration, pairwise source duplicate overlap.
    "q88_gini_concentration", "q89_source_overlap",
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
