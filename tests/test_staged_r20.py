"""Staged batch for ROUND-20 registration (built in r14, GATE_r14.md
"Staged r20 surface"): q161 per-source content-checksum manifest
(checksums.py), q162 exact equi-depth histogram boundaries
(histogram.py), q163 hard-negative mining audit (negatives.py), and
q164 schema-profile drift (profile_drift.py).

Same checks as tests/test_staged_r19.py: staging containment, oracle
parity through the driver-mirror harness, full Python replays, and
plan/identity pins.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

from bucket_to_bigquery_spark.queries import (
    all_queries,
    checksums,
    histogram,
    negatives,
    profile_drift,
)
from bucket_to_bigquery_spark.queries.registry import (
    Query,
    _with_tuning,
    tables,
)

from .oracle import compare, duck_connection, round_half_away

_STAGED_MODULES = (checksums, histogram, negatives, profile_drift)

STAGED: dict[str, Query] = {
    name: Query(name, _with_tuning(fn), oracle, desc, tags)
    for mod in _STAGED_MODULES
    for name, (fn, oracle, desc, tags) in mod.STAGED.items()
}

_MERSENNE = 2305843009213693951  # 2^61 - 1


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
        "q161_content_checksum_manifest", "q162_equidepth_histogram",
        "q163_hard_negative_mining", "q164_profile_drift"]
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


def _fold(text: str) -> int:
    return int(hashlib.md5(text.encode()).hexdigest()[:15], 16)


def test_q161_matches_bruteforce(spark, sf_dir):
    rows = tables(spark, sf_dir)["documents"].select(
        "source", "text").collect()
    all_h: dict = defaultdict(list)
    for r in rows:
        all_h[r.source].append(_fold(r.text))
    got = _run("q161_content_checksum_manifest", spark, sf_dir).collect()
    assert [r.source for r in got] == sorted(all_h)
    for r in got:
        hs = all_h[r.source]
        assert r.n_rows == len(hs)
        assert r.n_distinct == len(set(hs))
        assert r.checksum_all == sum(hs) % _MERSENNE
        assert r.checksum_distinct == sum(set(hs)) % _MERSENNE


def test_q161_detects_each_mutation_class():
    """The manifest's POINT: a dropped row, a duplicated row, and a
    mutated byte each flip a different cell pair (pure-Python check of
    the same integer function the engines compute)."""
    base = ["alpha", "beta", "beta"]

    def manifest(texts):
        hs = [_fold(t) for t in texts]
        return (len(hs), len(set(hs)), sum(hs) % _MERSENNE,
                sum(set(hs)) % _MERSENNE)

    m0 = manifest(base)
    dropped = manifest(base[:-1])       # n_rows + checksum_all move
    assert dropped[0] != m0[0] and dropped[2] != m0[2]
    assert dropped[1] == m0[1] and dropped[3] == m0[3]
    duplicated = manifest(base + ["alpha"])  # multiset moves, distinct not
    assert duplicated[0] != m0[0] and duplicated[2] != m0[2]
    assert duplicated[1] == m0[1] and duplicated[3] == m0[3]
    mutated = manifest(["alphA", "beta", "beta"])  # every checksum moves
    assert mutated[2] != m0[2] and mutated[3] != m0[3]


def test_q162_matches_bruteforce(spark, sf_dir):
    rows = tables(spark, sf_dir)["orders"].select("o_totalprice").collect()
    cents = sorted(round_half_away(r.o_totalprice * 100) for r in rows)
    n = len(cents)
    got = _run("q162_equidepth_histogram", spark, sf_dir).collect()
    assert [r.bin_idx for r in got] == list(range(1, 20))
    for r in got:
        target = (r.bin_idx * n + 19) // 20
        assert r.target_rank == target
        assert r.edge_cents == cents[target - 1]  # disc rank rule
    # equal-count property (up to value ties): each interior edge's
    # rank window spans n/20 of the corpus
    assert got[0].target_rank >= n // 20


def _e12_d2(a, b):
    return sum(
        round_half_away((float(x) - float(y)) * (float(x) - float(y)) * 1e12)
        for x, y in zip(a, b)
    )


def test_q163_matches_bruteforce(spark, sf_dir):
    rows = tables(spark, sf_dir)["embeddings"].select(
        "vec_id", "embedding", "label").collect()
    vecs = {r.vec_id: (r.embedding, r.label) for r in rows}
    got = _run("q163_hard_negative_mining", spark, sf_dir).collect()
    expect_q = sorted(v for v in vecs if v < 10)
    assert [r.q_id for r in got] == expect_q
    for r in got:
        qvec, qlab = vecs[r.q_id]
        assert r.q_label == qlab
        cand = sorted(
            (_e12_d2(qvec, v), n, lab)
            for n, (v, lab) in vecs.items() if n != r.q_id)
        pos = next((d, n) for d, n, lab in cand if lab == qlab)
        neg = next((d, n) for d, n, lab in cand if lab != qlab)
        assert (r.pos_d2, r.pos_id) == pos
        assert (r.neg_d2, r.neg_id) == neg
        assert r.margin_e12 == neg[0] - pos[0]
        assert r.neg_in_topk == sum(
            1 for _, _, lab in cand[:10] if lab != qlab)


def test_q164_matches_bruteforce(spark, sf_dir):
    import datetime as dt

    rows = tables(spark, sf_dir)["orders"].collect()
    pivot = dt.datetime.fromisoformat("1998-01-01")
    cols = ("o_custkey", "o_orderdate", "o_orderkey",
            "o_orderpriority", "o_orderstatus", "o_totalprice")
    got = _run("q164_profile_drift", spark, sf_dir).collect()
    assert [r.col_name for r in got] == sorted(cols)
    for r in got:
        early = [getattr(x, r.col_name) for x in rows
                 if x.o_orderdate < pivot]
        late = [getattr(x, r.col_name) for x in rows
                if x.o_orderdate >= pivot]
        assert r.early_n == len(early) and r.late_n == len(late)
        assert r.early_null == sum(v is None for v in early)
        assert r.late_null == sum(v is None for v in late)
        ed = len({v for v in early if v is not None})
        ld = len({v for v in late if v is not None})
        assert (r.early_distinct, r.late_distinct) == (ed, ld)
        if ed == 0:
            assert r.distinct_ratio_e6 is None
        else:
            assert r.distinct_ratio_e6 == ld * 1_000_000 // ed


# ---------------------------------------------------------------------------
# 4. Plan pins
# ---------------------------------------------------------------------------


def test_q161_single_scan_no_window(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q161_content_checksum_manifest")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_q162_segmented_scan_cached(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q162_equidepth_histogram")
    # cc and seg_tot each feed two consumers through the cache; the
    # cumulate never runs as ONE global unpartitioned window over the
    # raw fact rows (the q131/q136 decomposition)
    assert plan.count("InMemoryTableScan") >= 2
    assert "BroadcastNestedLoopJoin" in plan  # 19-row target broadcast


def test_q163_distance_stream_cached_for_three_consumers(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q163_hard_negative_mining")
    assert plan.count("InMemoryTableScan") >= 3
    assert "CartesianProduct" not in plan  # queries broadcast, never n x n


def test_q164_one_scan_regardless_of_column_count(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q164_profile_drift")
    # the review finding: the per-column UNION ALL first cut scanned
    # the fact table six times; the wide-aggregate + stack() plan
    # scans once
    assert plan.count("Scan parquet") == 1
    assert "Expand" in plan  # the multi-count-distinct planning
