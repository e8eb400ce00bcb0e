"""Behavioral + plan pins for the ninth r10 batch (concentration.py /
overlap.py) beyond the automatic oracle-parity rows."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from bucket_to_bigquery_spark.queries import all_queries
from bucket_to_bigquery_spark.queries.registry import tables

QUERIES = all_queries()


def _run(name, spark, sf_dir):
    return QUERIES[name].builder(spark, sf_dir)


def _plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name].builder(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# q88 — Gini concentration
# ---------------------------------------------------------------------------


def test_q88_matches_bruteforce(spark, sf_dir):
    """Replay per segment in exact Python ints (cents, ascending rank
    with key tie-break); Gini must land within a rounding unit and
    inside [0, 1)."""
    t = tables(spark, sf_dir)
    orders = t["orders"].select("o_custkey", "o_totalprice").collect()
    seg = {r.c_custkey: r.c_mktsegment
           for r in t["customer"].select("c_custkey", "c_mktsegment").collect()}
    rev: dict = defaultdict(int)
    for r in orders:
        if r.o_custkey in seg:
            key = (seg[r.o_custkey], r.o_custkey)
            rev[key] += int(round(r.o_totalprice * 100))
    by_seg: dict = defaultdict(list)
    for (s, ck), c in rev.items():
        by_seg[s].append((c, ck))
    got = {r.segment: r for r in _run("q88_gini_concentration", spark, sf_dir).collect()}
    assert set(got) == set(by_seg)
    for s, rows in by_seg.items():
        rows.sort()
        n = len(rows)
        xsum = sum(c for c, _ in rows)
        ixsum = sum(i * c for i, (c, _) in enumerate(rows, 1))
        g = (2.0 * ixsum) / (n * xsum) - (n + 1.0) / n
        r = got[s]
        assert r.n_customers == n and r.total_cents == xsum
        assert abs(r.gini_e6 - round(g * 1e6)) <= 1
        assert 0 <= r.gini_e6 < 1_000_000


def test_q88_rank_window_rides_dimension_frame(spark, sf_dir):
    """The rank window must partition by segment over the aggregated
    (segment, customer) frame — never a single-partition sort of it —
    and the customer dimension joins broadcast."""
    plan = _plan(spark, sf_dir, "q88_gini_concentration")
    assert "Exchange SinglePartition" not in plan.split("Window")[0]
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# q89 — source duplicate overlap
# ---------------------------------------------------------------------------


def test_q89_matches_bruteforce(spark, sf_dir):
    """Recompute each pair's intersection and Jaccard from raw 5-gram
    shingle sets; the shared generator vocabulary guarantees
    non-trivial overlap at every SF."""
    docs = tables(spark, sf_dir)["documents"].select("source", "text").collect()
    sets: dict = defaultdict(set)
    for r in docs:
        toks = " ".join(r.text.lower().split()).split(" ")
        for i in range(len(toks) - 4):
            sets[r.source].add(" ".join(toks[i:i + 5]))
    got = {(r.source_a, r.source_b): r
           for r in _run("q89_source_overlap", spark, sf_dir).collect()}
    expect = {}
    for a in sets:
        for b in sets:
            if a < b:
                inter = len(sets[a] & sets[b])
                if inter:
                    expect[(a, b)] = inter
    assert set(got) == set(expect)
    assert expect  # the corpus's planted copies must produce overlap
    for (a, b), inter in expect.items():
        r = got[(a, b)]
        assert (r.n_a, r.n_b) == (len(sets[a]), len(sets[b]))
        assert r.n_shared == inter
        j = inter / (len(sets[a]) + len(sets[b]) - inter)
        assert abs(r.jaccard_e6 - round(j * 1e6)) <= 1
        assert 0 < r.jaccard_e6 <= 1_000_000


def test_q89_text_never_shuffles_shingle_frame_cached(spark, sf_dir):
    """Documents never move on a key exchange, r16 shape: the shingle
    self-join (distinct → corpus-sized .cache() → two more sh-keyed
    exchanges) was replaced by ONE groupBy(sh)/collect_set exchange,
    collapsed to a ≤2^|sources|-row source-set frame behind an eager
    localCheckpoint barrier — the final plan reads the tiny
    checkpointed frame (Scan ExistingRDD), carries no text column
    through any hash exchange, and still joins nothing cartesian."""
    plan = _plan(spark, sf_dir, "q89_source_overlap")
    assert "CartesianProduct" not in plan
    # the barrier: everything downstream reads the checkpointed
    # source-set frame, not a re-derived corpus subtree
    assert "Scan ExistingRDD" in plan
    # the corpus-sized deserialized row cache is GONE (r16: the sharing
    # it paid for now costs one tiny checkpoint)
    assert "InMemoryTableScan" not in plan
    # no hash exchange moves the raw text column (hashing precedes
    # every key shuffle; the only text-carrying exchange is the
    # conditional test-scale round-robin spread before tokenize)
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text" not in line, line


def test_q89_set_and_join_shapes_agree(spark):
    """r17 guard (VERDICT r16 #4): the source-set collapse and the
    pre-r16 sh-keyed join fallback must compute IDENTICAL results — at
    a small source count AND at an adversarial one past the dispatch
    bound, where q89 itself would pick the join shape. 70 sources
    sharing a rotating window of a common token stream gives dense
    non-trivial overlap (every adjacent source pair shares shingles)."""
    from bucket_to_bigquery_spark.queries.overlap import (
        _SET_SHAPE_MAX_SOURCES,
        _overlap_via_shingle_join,
        _overlap_via_source_sets,
    )

    base = [f"tok{i}" for i in range(30)]
    n_sources = _SET_SHAPE_MAX_SOURCES + 6
    rows = [
        (f"src{s:03d}", " ".join(base[s % 10: s % 10 + 12]))
        for s in range(n_sources)
    ]
    # plus one source with no shingles at all (4 tokens < 5-gram window)
    rows.append(("src_tiny", "a b c d"))
    df = spark.createDataFrame(rows, "source string, text string")

    def key(frame):
        return {
            (r.source_a, r.source_b):
                (r.n_a, r.n_b, r.n_shared, r.jaccard_e6)
            for r in frame.collect()
        }

    got_set = key(_overlap_via_source_sets(spark, df))
    got_join = key(_overlap_via_shingle_join(df))
    assert got_set == got_join
    assert got_set  # rotating windows must overlap
