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
    # Round 14 (GATE_r14.md; executes GATE_r13.md's "Round-14" plan):
    # the 21 booked staged registrations q109-q114, q118-q131, q134
    # (value-oracled at 2-3 SFs, brute-force replayed, plan-pinned,
    # edge-corpus-matched, 10x-probed since r13 —
    # tests/test_staged_r14*.py) plus the stale burn-down: all 15
    # remaining r10 rows (the q77-q88 families + the r13 evictees
    # q31c/q66b/q72b), then the 14 oldest r11 rows in name order.
    # Registration touches only queries/__init__.py (infra) + these
    # aliases; no behavioral edit to any previously-registered module
    # this round. q115/q116/q117 + q132/q133 stay staged until after
    # the r15 llm_queries rotation (GATE_r13.md slot math). Exactly 50.
    #
    # r14 registrations (21)
    "q109_tpch_q5_shape", "q110_tpch_q10_shape", "q111_promo_share",
    "q112_market_share", "q113_column_profile", "q114_alpha_sampling",
    "q118_rolling_active_users", "q119_tpch_q4_shape",
    "q120_tpch_q7_shape", "q121_tpch_q13_shape", "q122_tpch_q17_shape",
    "q123_tpch_q18_shape", "q124_tpch_q19_shape", "q125_tpch_q15_shape",
    "q126_tpch_q22_shape", "q127_embedding_outliers",
    "q128_hourly_seasonality", "q129_ship_latency_percentiles",
    "q130_lloyd_step_audit", "q131_peak_concurrency",
    "q134_funnel_ttc_percentiles",
    # stale refresh: ALL 15 remaining r10 rows (oldest evidence
    # anywhere) — the q77-q88 analytics families plus the three r13
    # eviction survivors q31c/q66b/q72b
    "q31c_stacked_views", "q66b_key_frequency_histogram",
    "q72b_split_leakage_audit", "q77_last_touch_attribution",
    "q78_pagerank", "q78b_triangle_count", "q80_chi2_independence",
    "q81_time_decay_score", "q82_skyline_orders", "q83_js_divergence",
    "q84_daily_anomalies", "q85_markov_transitions", "q86_rfm_scores",
    "q87_weekly_revenue_delta", "q88_gini_concentration",
    # stale refresh: the 14 oldest r11 rows in name order (the
    # relational/ingest scan-and-join head of the registry)
    "q01_parquet_scan", "q02_csv_scan_roundtrip",
    "q02b_orc_scan_roundtrip", "q02c_xml_scan_roundtrip",
    "q03_json_extract", "q04_ingest_partitioned_sink",
    "q04b_imported_audit", "q04c_partition_pruned_scan",
    "q04d_catalog_sql", "q04e_compaction", "q05_glob_scan",
    "q06_project_filter", "q07_select_except",
    "q08_compound_predicates",
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
