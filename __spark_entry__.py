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
    # Round 11: the scratch.py crashed-writer fix (ADVICE r8 #3) under
    # the committed 2-round split (GATE_r10.md "Round-11/12 plan").
    # scratch.py is an implementing file of 88 entries; this window
    # rotates the relational 35 + ingest 4 + maintenance 1 + streaming 9
    # + formats 1 = exactly 50, which simultaneously refreshes every
    # remaining r8-evidence row. The other 38 scratch-dependent entries
    # (llm_queries 32 + pipeline_queries 4 + incremental 2) defer to the
    # r12 window, mechanized by tools/deferred_rotation.json — the
    # rotation check fails r12 unless that file is deleted AND all 38
    # are in-window. The loader.py ADVICE r10 fixes ride the same
    # window (loader.py pulls only the in-window q04 family).
    #
    # relational.py (35)
    "q01_parquet_scan", "q02_csv_scan_roundtrip", "q02b_orc_scan_roundtrip",
    "q03_json_extract", "q05_glob_scan", "q06_project_filter",
    "q07_select_except", "q08_compound_predicates", "q09_inner_join",
    "q10_broadcast_join_agg", "q11_left_outer_join", "q12_semi_join",
    "q13_anti_join", "q14_range_join", "q15_asof_join",
    "q15b_asof_join_tolerance", "q16_tpch_q3_shape", "q17_tpch_q1_shape",
    "q18_count_distinct", "q19_approx_count_distinct", "q20_rollup",
    "q20b_cube", "q20c_pivot", "q20d_grouping_sets", "q21_filtered_agg",
    "q22_having", "q23_ranking_windows", "q24_lag_lead",
    "q25_window_frames", "q26_topk_per_group", "q27_global_sort_limit",
    "q28_union_all", "q28b_union_distinct", "q29_intersect", "q29b_except",
    # ingest_queries.py (4) + maintenance.py (1)
    "q04_ingest_partitioned_sink", "q04b_imported_audit",
    "q04c_partition_pruned_scan", "q04d_catalog_sql", "q04e_compaction",
    # streaming_queries.py (9)
    "q36_tumbling_window", "q37_sliding_window", "q38_session_window",
    "q38b_custom_stateful_sessions", "q39_watermark_append",
    "q40_stream_dedup", "q41_exactly_once_file_ingest",
    "q41b_stream_static_enrich", "q41c_stream_stream_join",
    # formats.py (1)
    "q02c_xml_scan_roundtrip",
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
