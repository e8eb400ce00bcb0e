"""Behavioral + plan pins for the fourth r10 batch (retrieval.py /
basket.py / attribution.py) beyond the automatic oracle-parity rows.

Value-hash parity vs DuckDB runs in test_oracle_parity.py; these pin
the semantic contracts and the physical-plan shapes the 100 TB design
claims (see each module's "Scale design" docstring).
"""

from __future__ import annotations

import re

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
# q75 — BM25 top-k retrieval
# ---------------------------------------------------------------------------


def test_q75_ranking_contract(spark, sf_dir):
    """Ranks are 1..k contiguous per query; scores non-increasing along
    the rank order (doc_id breaks ties); n_terms never exceeds the
    query's vocabulary; every scored doc matches >= 1 query term."""
    from bucket_to_bigquery_spark.queries.retrieval import _QUERYSET, _TOPK

    rows = _run("q75_bm25_topk", spark, sf_dir).collect()
    assert rows
    qsizes = {qid: len(ts) for qid, ts in _QUERYSET}
    by_q: dict[str, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(qsizes)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= _TOPK
        assert all(1 <= r.n_terms <= qsizes[qid] for r in rs)
        assert all(r.score_e6 > 0 for r in rs)
        for a, b in zip(rs, rs[1:]):
            assert (a.score_e6, -a.doc_id) >= (b.score_e6, -b.doc_id)


def test_q75_top_docs_contain_query_terms(spark, sf_dir):
    """Ground the ranking in the corpus: each returned doc's text holds
    at least one of its query's terms (BM25 never scores a no-match)."""
    from bucket_to_bigquery_spark.queries.retrieval import _QUERYSET

    terms = dict(_QUERYSET)
    got = _run("q75_bm25_topk", spark, sf_dir)
    docs = tables(spark, sf_dir)["documents"].select("doc_id", "text")
    for r in got.join(docs, "doc_id").collect():
        toks = set(r.text.lower().split())
        assert toks & set(terms[r.query_id]), (r.query_id, r.doc_id)


def test_q75_rank_filter_pushes_as_window_group_limit(spark, sf_dir):
    """The rank<=5 filter must push down as WindowGroupLimit (partial
    per-partition top-k ahead of the query_id exchange), and the pair
    generation must never cartesian; the df/query-map/stats joins stay
    broadcast (no SortMergeJoin anywhere — every non-posting side is
    vocabulary-bounded or a 1-row scalar)."""
    plan = _plan(spark, sf_dir, "q75_bm25_topk")
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# q76 — frequent co-occurring pairs
# ---------------------------------------------------------------------------


def test_q76_support_algebra(spark, sf_dir):
    """Pair support can't exceed either side's item support; both sides
    clear the a-priori floor; pairs are canonical (part_a < part_b);
    output is the top-N by (support DESC, part_a, part_b); lift_e6
    reproduces from the emitted counts with the same double expression."""
    from bucket_to_bigquery_spark.queries.basket import (
        _MIN_ITEM_SUPPORT, _TOPN,
    )

    rows = _run("q76_frequent_pairs", spark, sf_dir).collect()
    assert 0 < len(rows) <= _TOPN
    items = (
        tables(spark, sf_dir)["lineitem"]
        .select("l_orderkey", "l_partkey").distinct()
    )
    n_baskets = items.select("l_orderkey").distinct().count()
    keys = []
    for r in rows:
        assert r.part_a < r.part_b
        assert r.support_a >= _MIN_ITEM_SUPPORT
        assert r.support_b >= _MIN_ITEM_SUPPORT
        assert 1 <= r.pair_support <= min(r.support_a, r.support_b)
        lift = ((float(r.pair_support) * float(n_baskets))
                / (float(r.support_a) * float(r.support_b))) * 1e6
        # engines round half-away-from-zero; Python round() is banker's —
        # accept either neighbor when the product sits on a .5 boundary
        assert abs(r.lift_e6 - lift) <= 0.5, r
        keys.append((-r.pair_support, r.part_a, r.part_b))
    assert keys == sorted(keys)


def test_q76_prune_broadcasts_topn_takeordered(spark, sf_dir):
    """The a-priori prune must ride a broadcast join (never shuffle the
    basket stream to apply it) and the global top-100 must be
    TakeOrdered — a full sort materialization of the pair space is the
    scale bug this pin guards."""
    plan = _plan(spark, sf_dir, "q76_frequent_pairs")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# q77 — last-touch attribution
# ---------------------------------------------------------------------------


def test_q77_matches_bruteforce(spark, sf_dir):
    """Re-derive the attribution row-by-row in Python at test scale:
    the last (ts, event_id)-ordered click/view at or before each
    purchase, NULLs when none precede."""
    ev = tables(spark, sf_dir)["events"].select(
        "user_id", "event_id", "ts", "event_type"
    ).collect()
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    expect = {}
    for user, rs in by_user.items():
        rs.sort(key=lambda r: (r.ts, r.event_id))
        last = None
        for r in rs:
            if r.event_type in ("click", "view"):
                last = r
            elif r.event_type == "purchase":
                expect[r.event_id] = None if last is None else last.event_id
    got = _run("q77_last_touch_attribution", spark, sf_dir).collect()
    assert len(got) == len(expect)
    for r in got:
        assert expect[r.purchase_id] == r.touch_event_id, r
        assert r.attributed == (r.touch_event_id is not None)
        if r.attributed:
            assert (r.touch_ts, r.touch_event_id) <= (r.purchase_ts, r.purchase_id)
            assert r.touch_type in ("click", "view")
            assert r.us_to_convert >= 0
        else:
            assert r.us_to_convert is None and r.touch_ts is None


def test_q77_single_hash_shuffle(spark, sf_dir):
    """The running-last window formulation exists to keep this at ONE
    user_id hash exchange (the naive per-conversion as-of join would
    shuffle twice and range-match); the final ORDER BY adds only a
    range exchange."""
    plan = _plan(spark, sf_dir, "q77_last_touch_attribution")
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    assert "Join" not in plan
