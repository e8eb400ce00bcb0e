"""Behavioral + plan pins for the seventh r10 batch (shift.py /
anomaly.py) beyond the automatic oracle-parity rows."""

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
# q83 — JS divergence distribution shift
# ---------------------------------------------------------------------------


def test_q83_matches_bruteforce(spark, sf_dir):
    """Recompute each source's JSD in Python with the same bounded
    vocabulary (top-V by global count, term-asc ties) and the same
    per-cell rounding; allow ±1 per cell for libm ln ulps."""
    from bucket_to_bigquery_spark.queries.shift import _OTHER, _V

    docs = tables(spark, sf_dir)["documents"].select("source", "text").collect()
    st: dict = defaultdict(int)
    for r in docs:
        for t in " ".join(r.text.lower().split()).split(" "):
            st[(r.source, t)] += 1
    gl_full: dict = defaultdict(int)
    for (s, t), c in st.items():
        gl_full[t] += c
    vocab = {t for t, _ in sorted(gl_full.items(),
                                  key=lambda kv: (-kv[1], kv[0]))[:_V]}
    cells: dict = defaultdict(int)
    for (s, t), c in st.items():
        cells[(s, t if t in vocab else _OTHER)] += c
    gl: dict = defaultdict(int)
    ns: dict = defaultdict(int)
    for (s, v), c in cells.items():
        gl[v] += c
        ns[s] += c
    ng = sum(gl.values())
    expect: dict = {}
    ncells: dict = defaultdict(int)
    for s in ns:
        tot = 0
        for v, cg in gl.items():
            cs = cells.get((s, v), 0)
            q = cg / ng
            p = cs / ns[s]
            m = (p + q) / 2.0
            x = (0.5 * p * math.log(p / m) if cs > 0 else 0.0) \
                + 0.5 * q * math.log(q / m)
            tot += math.floor(x * 1e9 + 0.5) if x >= 0 else -math.floor(-x * 1e9 + 0.5)
            ncells[s] += 1
        expect[s] = tot
    got = {r.source: r for r in _run("q83_js_divergence", spark, sf_dir).collect()}
    assert set(got) == set(ns)
    for s, r in got.items():
        assert r.n_tokens == ns[s]
        assert abs(r.jsd_e9 - expect[s]) <= ncells[s], s
        assert r.jsd_e9 >= 0
        # JSD is bounded by ln 2
        assert r.jsd_e9 <= math.log(2) * 1e9 + ncells[s]


def test_q83_single_tokenization_cached(spark, sf_dir):
    """Vocabulary, cells, marginals and totals must all derive from the
    CACHED (source, term) frame — the corpus must not re-tokenize per
    consumer."""
    plan = _plan(spark, sf_dir, "q83_js_divergence")
    assert plan.count("InMemoryTableScan") >= 4
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# q84 — daily volume anomalies
# ---------------------------------------------------------------------------


def test_q84_matches_bruteforce(spark, sf_dir):
    """Replay: integer day indexes, exact moment sums, one double
    z expression; flags at |z| >= 2."""
    from bucket_to_bigquery_spark.queries.anomaly import _DAY_US

    ev = tables(spark, sf_dir)["events"].select("ts").collect()
    days: dict = defaultdict(int)
    for r in ev:
        us = int(r.ts.timestamp() * 1_000_000)
        days[us // _DAY_US] += 1
    n = len(days)
    s = sum(days.values())
    s2 = sum(c * c for c in days.values())
    got = {r.day_idx: r for r in _run("q84_daily_anomalies", spark, sf_dir).collect()}
    assert set(got) == set(days)
    for d, c in days.items():
        z = (c - s / n) / math.sqrt((s2 - s * s / n) / n)
        z_e6 = math.floor(abs(z) * 1e6 + 0.5) * (1 if z >= 0 else -1)
        r = got[d]
        assert r.n_events == c
        assert abs(r.z_e6 - z_e6) <= 1, d
        assert r.is_anomaly == (abs(r.z_e6) >= 2_000_000)


def test_q84_day_frame_cached_one_fact_shuffle(spark, sf_dir):
    """The event stream shuffles once into the date-bounded day frame;
    moments + z both read the CACHE; the moment side is a broadcast
    1-row cross."""
    plan = _plan(spark, sf_dir, "q84_daily_anomalies")
    assert plan.count("InMemoryTableScan") >= 2
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
