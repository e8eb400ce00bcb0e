"""Behavioral + plan pins for the sixth r10 batch (stats_ext.py /
decay.py / skyline.py) beyond the automatic oracle-parity rows."""

from __future__ import annotations

import math
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
# q80 — chi-square independence
# ---------------------------------------------------------------------------


def test_q80_matches_scipy_free_recompute(spark, sf_dir):
    """Recompute chi2 and Cramér's V from raw (lang, source) counts in
    Python (float sums here are fine: the pin allows the e6 contract's
    half-ulp of slack); dof and dimensions must be exact."""
    rows = tables(spark, sf_dir)["documents"].groupBy(
        "lang", "source").count().collect()
    obs = {(r.lang, r.source): r["count"] for r in rows}
    rt: dict = defaultdict(int)
    ct: dict = defaultdict(int)
    for (l, s), o in obs.items():
        rt[l] += o
        ct[s] += o
    n = sum(obs.values())
    chi2_e6 = sum(
        round((o - rt[l] * ct[s] / n) ** 2 / (rt[l] * ct[s] / n) * 1e6)
        for (l, s), o in obs.items()
    )
    got = _run("q80_chi2_independence", spark, sf_dir).collect()
    assert len(got) == 1
    g = got[0]
    assert (g.n_langs, g.n_sources, g.n_docs) == (len(rt), len(ct), n)
    assert g.n_cells == len(obs)
    assert g.dof == (len(rt) - 1) * (len(ct) - 1)
    assert abs(g.chi2_e6 - chi2_e6) <= len(obs)  # ±1 rounding per cell
    v = math.sqrt((g.chi2_e6 / 1e6) / (n * min(len(rt) - 1, len(ct) - 1)))
    assert abs(g.cramers_v_e6 - round(v * 1e6)) <= 1
    assert 0 <= g.cramers_v_e6 <= 1_000_000


def test_q80_single_corpus_scan_via_cached_cells(spark, sf_dir):
    """Margins, N, and contributions must all re-read the CACHED
    contingency cells — without the cache the corpus scan replays once
    per derived frame (the scale bug this pins away)."""
    plan = _plan(spark, sf_dir, "q80_chi2_independence")
    assert plan.count("InMemoryTableScan") >= 4
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# q81 — exponential time-decay score
# ---------------------------------------------------------------------------


def test_q81_matches_bruteforce(spark, sf_dir):
    """Per-user replay: anchor at max ts, sum round(v·exp(-age/τ)·1e6)
    as ints — must match exactly (same IEEE expression per term)."""
    from bucket_to_bigquery_spark.queries.decay import _TAU_US

    ev = tables(spark, sf_dir)["events"].select(
        "user_id", "ts", "value").collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(r)
    got = {r.user_id: r for r in
           _run("q81_time_decay_score", spark, sf_dir).collect()}
    assert set(got) == set(by_user)
    for user, rs in by_user.items():
        anchor = max(r.ts for r in rs)
        total = 0
        for r in rs:
            age_us = int((anchor - r.ts).total_seconds() * 1_000_000)
            term = r.value * math.exp(-(float(age_us) / float(_TAU_US)))
            total += math.floor(term * 1e6 + 0.5)  # round half-away (v>=0)
        g = got[user]
        assert g.n_events == len(rs)
        # libm exp can differ in the last ulp per term; allow 1 per event
        assert abs(g.decayed_value_e6 - total) <= len(rs), user


def test_q81_decay_bounds(spark, sf_dir):
    """The decayed sum is bounded by the plain sum (decay only
    shrinks), and the anchor event itself contributes undecayed."""
    from bucket_to_bigquery_spark.queries.registry import tables as _t

    ev = _t(spark, sf_dir)["events"]
    import pyspark.sql.functions as F

    plain = {
        r.user_id: r.s
        for r in ev.groupBy("user_id")
        .agg(F.sum(F.when(F.col("value") > 0, F.col("value"))
                   .otherwise(F.lit(0.0))).alias("s"))
        .collect()
    }
    for r in _run("q81_time_decay_score", spark, sf_dir).collect():
        # each per-event term rounds up by at most 0.5 e6-units, so the
        # slack scales with THIS user's event count, not the user count
        assert r.decayed_value_e6 <= plain[r.user_id] * 1e6 + 0.5 * r.n_events + 1


def test_q81_single_hash_exchange(spark, sf_dir):
    """Anchor window and final group-by share ONE user_id exchange
    (the q63 shape)."""
    plan = _plan(spark, sf_dir, "q81_time_decay_score")
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


# ---------------------------------------------------------------------------
# q82 — skyline
# ---------------------------------------------------------------------------


def test_q82_is_exactly_the_pareto_frontier(spark, sf_dir):
    """Brute-force dominance check both directions: every returned
    order is non-dominated, and every non-dominated order is returned."""
    orders = tables(spark, sf_dir)["orders"].select(
        "o_orderkey", "o_orderdate", "o_totalprice").collect()
    pts = [(r.o_orderdate, r.o_totalprice, r.o_orderkey) for r in orders]

    def dominated(p):
        d, v, _ = p
        return any(
            d2 <= d and v2 >= v and (d2 < d or v2 > v)
            for d2, v2, _ in pts
        )

    expect = {k for p in pts if not dominated(p) for k in (p[2],)}
    got = {r.orderkey for r in _run("q82_skyline_orders", spark, sf_dir).collect()}
    assert got == expect and got


def test_q82_no_fact_sort_no_self_join(spark, sf_dir):
    """The fact table must never be globally sorted or self-joined:
    exactly one single-partition exchange (the per-DATE threshold
    frame, bounded by the date dimension) and a broadcast join back."""
    plan = _plan(spark, sf_dir, "q82_skyline_orders")
    assert len(re.findall(r"Exchange SinglePartition", plan)) == 1, plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
