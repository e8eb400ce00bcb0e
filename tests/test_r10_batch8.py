"""Behavioral + plan pins for the eighth r10 batch (markov.py / rfm.py
/ trend.py) beyond the automatic oracle-parity rows."""

from __future__ import annotations

import re
from collections import defaultdict

from bucket_to_bigquery_spark.queries import all_queries
from bucket_to_bigquery_spark.queries.registry import tables

QUERIES = all_queries()


def _run(name, spark, sf_dir):
    return QUERIES[name].builder(spark, sf_dir)


def _plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name].builder(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# q85 — Markov transitions
# ---------------------------------------------------------------------------


def test_q85_matches_bruteforce(spark, sf_dir):
    """Recount transitions from per-user (ts, event_id)-sorted
    sequences; probabilities must row-normalize and sum to ~1e6."""
    ev = tables(spark, sf_dir)["events"].select(
        "user_id", "ts", "event_id", "event_type").collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(r)
    counts: dict = defaultdict(int)
    for rs in by_user.values():
        rs.sort(key=lambda r: (r.ts, r.event_id))
        for a, b in zip(rs, rs[1:]):
            counts[(a.event_type, b.event_type)] += 1
    got = _run("q85_markov_transitions", spark, sf_dir).collect()
    assert {(r.state, r.next_state): r.n for r in got} == dict(counts)
    rows: dict = defaultdict(list)
    for r in got:
        assert r.row_total == sum(
            n for (s, _), n in counts.items() if s == r.state
        )
        rows[r.state].append(r.p_e6)
    for state, ps in rows.items():
        # rounded probabilities sum to 1e6 within half a unit per cell
        assert abs(sum(ps) - 1_000_000) <= len(ps), state


def test_q85_single_fact_pass_via_cached_matrix(spark, sf_dir):
    """The transition matrix is CACHED, so both its consumers (row
    totals + the join) read the cache and the event stream provably
    materializes once; the row-total join stays broadcast (no SMJ)."""
    plan = _plan(spark, sf_dir, "q85_markov_transitions")
    assert plan.count("InMemoryTableScan") >= 2
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# q86 — RFM scores
# ---------------------------------------------------------------------------


def test_q86_score_contract(spark, sf_dir):
    """Quintiles are 1..5 with front-loaded-remainder sizes per ntile's
    definition; ordering is monotone (better measure => >= score);
    segment digits recompose; one row per ordering customer."""
    got = _run("q86_rfm_scores", spark, sf_dir).collect()
    n_cust = (
        tables(spark, sf_dir)["orders"]
        .select("o_custkey").distinct().count()
    )
    assert len(got) == n_cust
    for dim in ("r_score", "f_score", "m_score"):
        sizes = defaultdict(int)
        for r in got:
            s = r[dim]
            assert 1 <= s <= 5
            sizes[s] += 1
        q, rem = divmod(n_cust, 5)
        # ntile's exact front-loaded-remainder bucket sizes
        assert all(sizes[b] == q + (1 if b <= rem else 0) for b in range(1, 6))
    # monotonicity: sort by the measure (with key tie-break) and check
    # scores never decrease along the ntile order
    by_freq = sorted(got, key=lambda r: (r.frequency, r.custkey))
    assert all(a.f_score <= b.f_score for a, b in zip(by_freq, by_freq[1:]))
    by_rec = sorted(got, key=lambda r: (-r.recency_days, r.custkey))
    assert all(a.r_score <= b.r_score for a, b in zip(by_rec, by_rec[1:]))
    for r in got:
        assert r.rfm_segment == r.r_score * 100 + r.f_score * 10 + r.m_score
        assert r.recency_days >= 0 and r.frequency >= 1


def test_q86_facts_shuffle_once(spark, sf_dir):
    """Orders aggregate once to the customer frame; the ntile windows
    ride the bounded dimension frame (single-partition by design) —
    exactly one hashpartitioning exchange on the fact stream."""
    plan = _plan(spark, sf_dir, "q86_rfm_scores")
    # the anchor reads the CACHED customer frame, so the toString shows
    # the one fact exchange inside the InMemoryRelation definition plus
    # its cached reuse — assert the cache is present and the live plan
    # carries no second fact aggregation path
    assert plan.count("InMemoryTableScan") >= 2
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# q87 — weekly revenue deltas
# ---------------------------------------------------------------------------


def test_q87_deltas_reconcile(spark, sf_dir):
    """Deltas chain: revenue - prev_revenue row by row, first week
    NULL; weekly revenue sums to the exact corpus total."""
    import pyspark.sql.functions as F

    got = _run("q87_weekly_revenue_delta", spark, sf_dir).collect()
    got.sort(key=lambda r: r.week_idx)
    assert got[0].prev_revenue is None and got[0].delta is None
    assert got[0].pct_change_e6 is None and got[0].weeks_gap is None
    for a, b in zip(got, got[1:]):
        assert b.prev_revenue == a.revenue
        assert abs(b.delta - (b.revenue - b.prev_revenue)) < 1e-6
        # the baseline is the previous OBSERVED week; the gap column
        # must report the true calendar distance
        assert b.weeks_gap == b.week_idx - a.week_idx >= 1
    total = (
        tables(spark, sf_dir)["orders"]
        .agg(F.sum(F.col("o_totalprice").cast("decimal(30,6)"))
             .cast("double").alias("t"))
        .collect()[0].t
    )
    assert abs(sum(r.revenue for r in got) - total) < 1e-3
    n_orders = tables(spark, sf_dir)["orders"].count()
    assert sum(r.n_orders for r in got) == n_orders


def test_q87_single_fact_shuffle(spark, sf_dir):
    """One map-side-combined exchange to the calendar-bounded week
    frame; the lag window is the only single-partition step."""
    plan = _plan(spark, sf_dir, "q87_weekly_revenue_delta")
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    assert len(re.findall(r"Exchange SinglePartition", plan)) == 1, plan
