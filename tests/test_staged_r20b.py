"""Second staged batch for ROUND-20 registration (built late r14,
GATE_r14.md "Staged r20 surface", second wave): q165 boilerplate
shingle detection (boilerplate.py), q166 largest-remainder
token-budget apportionment (apportion.py), q167 inverted-index
posting-list statistics (postings.py), q168 quantile–quantile drift
table (qq.py), and q169 partition-layout advisor (layout_advisor.py).

Same checks as tests/test_staged_r20.py: staging containment, oracle
parity through the driver-mirror harness, full Python replays, and
plan/identity pins.
"""

from __future__ import annotations

import math
from collections import defaultdict

from bucket_to_bigquery_spark.queries import (
    all_queries,
    apportion,
    boilerplate,
    layout_advisor,
    postings,
    qq,
)
from bucket_to_bigquery_spark.queries.registry import (
    Query,
    _with_tuning,
    tables,
)

from .oracle import compare, duck_connection, round_half_away, toks_replay

_STAGED_MODULES = (boilerplate, apportion, postings, qq, layout_advisor)

STAGED: dict[str, Query] = {
    name: Query(name, _with_tuning(fn), oracle, desc, tags)
    for mod in _STAGED_MODULES
    for name, (fn, oracle, desc, tags) in mod.STAGED.items()
}


def _run(name, spark, sf_dir):
    return STAGED[name].builder(spark, sf_dir)


def _plan(spark, sf_dir, name: str) -> str:
    df = STAGED[name].builder(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# 1. Staging containment
# ---------------------------------------------------------------------------


def test_staged_entries_are_not_registered():
    reg = all_queries()
    assert sorted(STAGED) == [
        "q165_boilerplate_shingles", "q166_budget_apportionment",
        "q167_posting_list_stats", "q168_qq_drift",
        "q169_layout_advisor"]
    for name in STAGED:
        assert name not in reg, (
            f"{name} is registered — the r20 staging plan "
            "(GATE_r14.md) no longer matches"
        )


# ---------------------------------------------------------------------------
# 2. Oracle parity through the driver-mirror harness
# ---------------------------------------------------------------------------


def test_staged_oracle_parity(spark, sf_dir):
    duck = duck_connection(sf_dir)
    try:
        for name in sorted(STAGED):
            problems = compare(name, spark, duck, sf_dir, STAGED)
            assert not problems, f"{name}: " + "; ".join(problems)
    finally:
        duck.close()


# ---------------------------------------------------------------------------
# 3. Brute-force replays
# ---------------------------------------------------------------------------


def _fold(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_q165_matches_bruteforce(spark, sf_dir):
    rows = tables(spark, sf_dir)["documents"].select(
        "doc_id", "source", "text").collect()
    docs_of: dict = defaultdict(set)
    srcs_of: dict = defaultdict(set)
    for r in rows:
        t = toks_replay(r.text)
        for i in range(len(t) - 4):
            h = _fold(" ".join(t[i:i + 5]))
            docs_of[h].add(r.doc_id)
            srcs_of[h].add(r.source)
    n_docs = len(rows)
    exp = sorted(
        ((-len(docs_of[h]), h) for h in docs_of))[:20]
    got = _run("q165_boilerplate_shingles", spark, sf_dir).collect()
    assert [(r.h) for r in got] == [h for _, h in exp]
    for r in got:
        assert r.df == len(docs_of[r.h])
        assert r.n_sources == len(srcs_of[r.h])
        assert r.df_share_e6 == r.df * 1_000_000 // n_docs
    assert got[0].df >= 2, "the corpus must contain shared shingles"


def test_q166_matches_bruteforce_and_sums_exactly(spark, sf_dir):
    rows = tables(spark, sf_dir)["documents"].select(
        "source", "n_chars").collect()
    mass: dict = defaultdict(int)
    for r in rows:
        mass[r.source] += r.n_chars
    total = sum(mass.values())
    budget = 1_000_000
    base = {s: budget * m // total for s, m in mass.items()}
    rem = {s: (budget * m) % total for s, m in mass.items()}
    bonus = budget - sum(base.values())
    order = sorted(mass, key=lambda s: (-rem[s], s))
    alloc = dict(base)
    for s in order[:bonus]:
        alloc[s] += 1
    got = _run("q166_budget_apportionment", spark, sf_dir).collect()
    assert [r.source for r in got] == sorted(mass)
    for r in got:
        assert r.chars == mass[r.source]
        assert (r.base, r.rem) == (base[r.source], rem[r.source])
        assert r.rem_rank == order.index(r.source) + 1
        assert r.allocation == alloc[r.source]
    assert sum(r.allocation for r in got) == budget  # the exact-sum law


def test_q167_matches_bruteforce(spark, sf_dir):
    rows = tables(spark, sf_dir)["documents"].select(
        "doc_id", "text").collect()
    df: dict = defaultdict(set)
    cf: dict = defaultdict(int)
    for r in rows:
        for t in toks_replay(r.text):
            df[t].add(r.doc_id)
            cf[t] += 1
    n = len(rows)
    exp = sorted(((-len(df[t]), t) for t in df))[:20]
    got = _run("q167_posting_list_stats", spark, sf_dir).collect()
    assert [r.term for r in got] == [t for _, t in exp]
    for r in got:
        assert r.df == len(df[r.term])
        assert r.cf == cf[r.term]
        assert r.idf_e6 == round_half_away(
            math.log((n + 1.0) / (r.df + 1.0)) * 1e6)
        assert r.df_share_e6 == r.df * 1_000_000 // n


def _decile_edges(cents_sorted, bins=10):
    n = len(cents_sorted)
    return {i: cents_sorted[(i * n + bins - 1) // bins - 1]
            for i in range(1, bins)}


def test_q168_matches_bruteforce(spark, sf_dir):
    import datetime as dt

    rows = tables(spark, sf_dir)["orders"].select(
        "o_orderdate", "o_totalprice").collect()
    pivot = dt.datetime.fromisoformat("1998-01-01")
    early = sorted(round_half_away(r.o_totalprice * 100)
                   for r in rows if r.o_orderdate < pivot)
    late = sorted(round_half_away(r.o_totalprice * 100)
                  for r in rows if r.o_orderdate >= pivot)
    e, l = _decile_edges(early), _decile_edges(late)
    got = _run("q168_qq_drift", spark, sf_dir).collect()
    assert [r.decile for r in got] == list(range(1, 10))
    for r in got:
        assert r.early_cents == e[r.decile]
        assert r.late_cents == l[r.decile]
        assert r.shift_cents == l[r.decile] - e[r.decile]


def test_q169_matches_bruteforce(spark, sf_dir):
    rows = tables(spark, sf_dir)["documents"].select(
        "source", "text").collect()
    n: dict = defaultdict(int)
    b: dict = defaultdict(int)
    for r in rows:
        n[r.source] += 1
        b[r.source] += len(r.text.encode("utf-8")) + 16
    target = 128 * 1024 * 1024
    got = _run("q169_layout_advisor", spark, sf_dir).collect()
    assert [r.source for r in got] == sorted(n)
    for r in got:
        assert (r.n_rows, r.est_bytes) == (n[r.source], b[r.source])
        files = (b[r.source] + target - 1) // target
        assert r.n_files == files
        assert r.rows_per_file == (n[r.source] + files - 1) // files
        assert r.is_small == (b[r.source] * 2 < target)
    # every test corpus is far below 64 MiB per source — the merge
    # flag must be live
    assert all(r.is_small for r in got)


# ---------------------------------------------------------------------------
# 4. Plan pins
# ---------------------------------------------------------------------------


def test_q165_no_pairs_and_takeordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q165_boilerplate_shingles")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # no pair join anywhere
    assert "TakeOrderedAndProject" in plan


def test_q166_quota_frame_cached(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q166_budget_apportionment")
    # the |sources|-row quota frame feeds the shortfall aggregate and
    # the remainder ranking through the cache
    assert plan.count("InMemoryTableScan") >= 2


def test_q167_token_stream_cached_and_takeordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q167_posting_list_stats")
    assert plan.count("InMemoryTableScan") >= 2  # cf + df consumers
    assert "TakeOrderedAndProject" in plan


def test_q168_segmented_not_global(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q168_qq_drift")
    # the cumulate windows partition by (early, seg) — never ONE
    # unpartitioned global window over the distinct-cents domain
    assert plan.count("InMemoryTableScan") >= 2
    assert "BroadcastNestedLoopJoin" in plan  # 9-row target broadcast


def test_q169_single_combine(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q169_layout_advisor")
    assert "Window" not in plan
    assert plan.count("Scan parquet") == 1
