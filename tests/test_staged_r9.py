"""The staged r9 surface (GATE_r08.md "Round-9 rotation plan"): builders
land in r8 fully oracle-verified, registration waits for round 9.

Two obligations checked here:

1. **Staging containment** — importing the staged modules must NOT touch
   the global registry: the r8 gate window is at capacity, so a staged
   entry leaking into ``all_queries()`` would break the rotation
   invariant (tools/check_gate_rotation.py) the moment its file counts as
   changed.
2. **Full oracle parity NOW** — every staged builder runs against its
   DuckDB oracle with the exact driver-faithful comparison the registered
   surface uses (tests/oracle.py), plus the per-family semantic
   assertions (compaction shrinks files, CMS never underestimates,
   planted dup bands get the expected verdicts).
"""

from __future__ import annotations

import pytest

from bucket_to_bigquery_spark.queries import all_queries
from bucket_to_bigquery_spark.queries import (  # noqa: F401 (import = staging test)
    incremental,
    joins_ext,
    maintenance,
    mixture,
    sketches,
)
from bucket_to_bigquery_spark.queries.registry import (
    REGISTRY,
    Query,
    _with_tuning,
)

from .oracle import compare, duck_connection

_STAGED_MODULES = (joins_ext, mixture, sketches, maintenance, incremental)

STAGED: dict[str, Query] = {
    name: Query(name, _with_tuning(fn), oracle, desc, tags)
    for mod in _STAGED_MODULES
    for name, (fn, oracle, desc, tags) in mod.STAGED.items()
}


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


# ---------------------------------------------------------------------------
# 1. Staging containment
# ---------------------------------------------------------------------------


def test_staged_modules_do_not_register():
    """Importing a staged module must leave the global registry untouched
    (the r8 window has no slot for a new entry)."""
    leaked = set(STAGED) & set(all_queries())
    assert not leaked, f"staged entries leaked into the registry: {sorted(leaked)}"


def test_register_seam_is_complete_and_reversible():
    """`register()` (the r9 wiring seam) must install every staged entry
    with its oracle — verified against a snapshot and rolled back, so the
    registry other tests see stays exactly the r8 surface."""
    before = dict(REGISTRY)
    try:
        for mod in _STAGED_MODULES:
            mod.register()
        for name, q in STAGED.items():
            assert name in REGISTRY, f"register() missed {name}"
            assert REGISTRY[name].oracle == q.oracle
            assert REGISTRY[name].description
    finally:
        REGISTRY.clear()
        REGISTRY.update(before)
    assert set(all_queries()) == set(before)


# ---------------------------------------------------------------------------
# 2. Oracle parity (driver-faithful, same machinery as test_oracle_parity)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("qname", sorted(STAGED))
def test_staged_query_matches_oracle(qname, spark, duck, sf_dir):
    problems = compare(qname, spark, duck, sf_dir, STAGED)
    assert not problems, f"{qname}: " + "; ".join(problems)


# ---------------------------------------------------------------------------
# Per-family semantics
# ---------------------------------------------------------------------------


def test_q04e_compaction_shrinks_files(spark, sf_dir):
    stats = maintenance.compact_stats(spark, sf_dir)
    assert stats["files_after"] < stats["files_before"], stats
    assert stats["files_after"] >= 1


def test_q11b_produces_both_unmatched_sides(spark, sf_dir):
    rows = STAGED["q11b_full_outer_join"].builder(spark, sf_dir).collect()
    sides = {r["side"] for r in rows}
    assert "both" in sides, "no matched rows — the join key or filters are wrong"
    assert sides <= {"both", "customer_only", "order_only"}
    for r in rows:
        if r["side"] == "customer_only":
            assert r["orderkey"] is None and r["totalprice"] is None
        elif r["side"] == "order_only":
            assert r["acctbal"] is None
        else:
            assert r["orderkey"] is not None and r["acctbal"] is not None


def test_q49n_cms_never_underestimates(spark, sf_dir):
    rows = STAGED["q49n_heavy_hitters_cms"].builder(spark, sf_dir).collect()
    assert 0 < len(rows) <= sketches._TOP_K
    for r in rows:
        assert r["est_count"] >= r["exact_count"] >= 1, r


def test_q55_planted_bands_get_expected_verdicts(spark, sf_dir):
    rows = {
        r["doc_id"]: r
        for r in STAGED["q55_incremental_dedup"].builder(spark, sf_dir).collect()
    }
    exact = [r for i, r in rows.items() if 500000 <= i < 600000]
    near = [r for i, r in rows.items() if 600000 <= i < 700000]
    fresh = [r for i, r in rows.items() if i >= 700000]
    assert exact and near and fresh
    # exact copies: always duplicates at jaccard exactly 1.0
    for r in exact:
        assert r["n_matches"] >= 1 and r["max_jaccard"] == 1.0, r
    # near copies (3-token tail): overwhelmingly above the 0.6 gate — a
    # very short doc can legitimately fall below it, so assert the rate
    caught = sum(1 for r in near if r["n_matches"] >= 1)
    assert caught >= 0.9 * len(near), f"near-dup recall {caught}/{len(near)}"
    # fresh md5-token docs: shingle-disjoint from natural text by design
    for r in fresh:
        assert r["n_matches"] == 0 and r["max_jaccard"] is None, r


def test_q55b_apply_is_consistent_with_q55(spark, sf_dir):
    verdicts = STAGED["q55_incremental_dedup"].builder(spark, sf_dir).collect()
    merged = STAGED["q55b_incremental_dedup_apply"].builder(spark, sf_dir).collect()
    survivors = {r["doc_id"] for r in verdicts if r["n_matches"] == 0}
    new_in_merged = {r["doc_id"] for r in merged if r["origin"] == "new"}
    assert new_in_merged == survivors
    hist_n = sum(1 for r in merged if r["origin"] == "historical")
    assert len(merged) == hist_n + len(survivors)


def test_q56_sample_respects_rates_and_composition(spark, sf_dir):
    sample = STAGED["q56_mixture_sampling"].builder(spark, sf_dir).collect()
    comp = STAGED["q56b_mixture_composition"].builder(spark, sf_dir).collect()
    for r in sample:
        assert r["bucket"] < mixture.MIXTURE_PERMYRIAD[r["lang"]], r
    assert sum(r["n_sampled"] for r in comp) == len(sample)
    for r in comp:
        assert 0 <= r["n_sampled"] <= r["n_total"], r
        assert r["target_permyriad"] == mixture.MIXTURE_PERMYRIAD.get(r["lang"], 0)
