"""Fourth r13-staged batch for ROUND-17 registration: q146 BFS hop
distance with a recursive-CTE oracle (bfs.py) and q147 discrete
Kaplan–Meier survival of session durations (survival.py).

Same checks as tests/test_staged_r17.py: staging containment, oracle
parity through the driver-mirror harness, full Python replays from
raw rows, and plan pins on the scale contracts.
"""

from __future__ import annotations

import calendar
import math
from collections import defaultdict
from itertools import combinations

from bucket_to_bigquery_spark.queries import all_queries, bfs, survival
from bucket_to_bigquery_spark.queries.registry import (
    Query,
    _with_tuning,
    tables,
)

from .oracle import compare, duck_connection, round_half_away

STAGED: dict[str, Query] = {
    name: Query(name, _with_tuning(fn), oracle, desc, tags)
    for mod in (bfs, survival)
    for name, (fn, oracle, desc, tags) in mod.STAGED.items()
}

def _run(name, spark, sf_dir):
    return STAGED[name].builder(spark, sf_dir)


def _plan(spark, sf_dir, name: str) -> str:
    df = STAGED[name].builder(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


_round_half_away = round_half_away


def _micros(ts) -> int:
    return calendar.timegm(ts.timetuple()) * 1_000_000 + ts.microsecond


def test_staged_entries_are_not_registered():
    reg = all_queries()
    assert len(STAGED) == 2
    for name in STAGED:
        assert name not in reg, (
            f"{name} is registered — the r17 staging plan "
            "(GATE_r13.md) no longer matches"
        )


def test_staged_oracle_parity(spark, sf_dir):
    duck = duck_connection(sf_dir)
    try:
        for name in sorted(STAGED):
            problems = compare(name, spark, duck, sf_dir, STAGED)
            assert not problems, f"{name}: " + "; ".join(problems)
    finally:
        duck.close()


# ---------------------------------------------------------------------------
# q146 — BFS hop distance
# ---------------------------------------------------------------------------


def test_q146_matches_bruteforce(spark, sf_dir):
    t = tables(spark, sf_dir)
    rows = t["lineitem"].select("l_orderkey", "l_partkey").collect()
    baskets = defaultdict(set)
    for r in rows:
        baskets[r.l_orderkey].add(r.l_partkey)
    support: dict = defaultdict(int)
    for items in baskets.values():
        for i, j in combinations(sorted(items), 2):
            support[(i, j)] += 1
    adj = defaultdict(set)
    for (i, j), c in support.items():
        if c >= 2:
            adj[i].add(j)
            adj[j].add(i)
    seeds = sorted(r.p_partkey for r in
                   t["part"].select("p_partkey").collect()
                   if r.p_partkey < 5)
    hops = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in range(1, 5):
        nxt = {n for f in frontier for n in adj[f]} - set(hops)
        for n in nxt:
            hops[n] = h
        frontier = nxt
    got = {r.p_partkey: r.hops for r in
           _run("q146_bfs_hops", spark, sf_dir).collect()}
    assert got == hops
    assert set(hops.values()) != {0}, (
        "graph left every non-seed unreachable — support threshold "
        "too tight for a meaningful BFS pin at this SF"
    )


def test_q146_plan_cached_edges_no_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q146_bfs_hops")
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan  # cached edge frame


# ---------------------------------------------------------------------------
# q147 — discrete Kaplan–Meier survival
# ---------------------------------------------------------------------------


_GAP_US = 6 * 3600 * 1_000_000
_US_PER_MIN = 60_000_000


def _km_replay(rows):
    """Replay: q63-contract sessionization (6h gap, (ts, event_id)
    order), minute durations, censor = session end within the gap of
    the corpus cutoff, then discrete KM."""
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append((_micros(r.ts), r.event_id))
    cut = max(t for evs in by_user.values() for t, _ in evs)
    lives = []
    for evs in by_user.values():
        evs.sort()
        start = prev = evs[0][0]
        for t, _ in evs[1:]:
            if t - prev > _GAP_US:
                lives.append((
                    (prev - start) // _US_PER_MIN,
                    cut - prev < _GAP_US))
                start = t
            prev = t
        lives.append(((prev - start) // _US_PER_MIN,
                      cut - prev < _GAP_US))
    total = len(lives)
    cc = defaultdict(lambda: [0, 0])  # dur -> [churned, leaving]
    for dur, censored in lives:
        cc[dur][0] += 0 if censored else 1
        cc[dur][1] += 1
    out = []
    left_before, km_log, dead = 0, 0, False
    for dur in sorted(cc):
        churned, leaving = cc[dur]
        n_risk = total - left_before
        left_before += leaving
        if churned >= n_risk:
            dead = True
        elif churned > 0:
            km_log += _round_half_away(
                math.log(float(n_risk - churned) / float(n_risk)) * 1e12)
        if churned > 0:
            out.append((dur, n_risk, churned,
                        churned * 1_000_000 // n_risk,
                        None if dead else km_log))
    return out


def test_q147_matches_bruteforce(spark, sf_dir):
    rows = tables(spark, sf_dir)["events"].select(
        "user_id", "ts", "event_id").collect()
    expect = _km_replay(rows)
    got = [(r.dur_min, r.n_risk, r.n_churned, r.hazard_e6,
            r.km_log_e12) for r in
           _run("q147_survival_curve", spark, sf_dir).collect()]
    assert got == expect


def test_q147_curve_invariants(spark, sf_dir):
    """Risk sets shrink monotonically, hazards live in [0, 1e6], and
    the log-survival curve is non-increasing until exhaustion."""
    got = _run("q147_survival_curve", spark, sf_dir).collect()
    assert got, "no churn durations at this SF — censor horizon ate all"
    risks = [r.n_risk for r in got]
    assert risks == sorted(risks, reverse=True)
    logs = [r.km_log_e12 for r in got if r.km_log_e12 is not None]
    assert logs == sorted(logs, reverse=True)
    for r in got:
        assert 0 < r.hazard_e6 <= 1_000_000
        assert 0 < r.n_churned <= r.n_risk


def test_q147_plan_compress_below_windows(spark, sf_dir):
    """The curve's cumulates run on the minute-bounded compressed
    frame — the per-session combine sits BELOW the windows."""
    plan = _plan(spark, sf_dir, "q147_survival_curve")
    assert "CartesianProduct" not in plan
    assert plan.count("Window") >= 2  # risk-set carry + curve cumulate
    below_first_window = plan.split("Window", 1)[1]
    assert "HashAggregate" in below_first_window
