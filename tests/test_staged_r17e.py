"""Fifth r13-staged batch for ROUND-17 registration: q148 IVF-PQ
asymmetric-distance top-k (ivfpq.py) — the composed ANN capstone.

Same checks as tests/test_staged_r17.py: staging containment, oracle
parity through the driver-mirror harness, a full Python replay of the
composed plan (coarse assignment → residuals → residual PQ encode →
per-(query, list) distance tables → ADC → top-k), and plan pins.
"""

from __future__ import annotations

from collections import defaultdict

from bucket_to_bigquery_spark.queries import all_queries, ivfpq
from bucket_to_bigquery_spark.queries.registry import (
    Query,
    _with_tuning,
    tables,
)

from .oracle import compare, duck_connection, round_half_away

STAGED: dict[str, Query] = {
    name: Query(name, _with_tuning(fn), oracle, desc, tags)
    for name, (fn, oracle, desc, tags) in ivfpq.STAGED.items()
}


def _run(name, spark, sf_dir):
    return STAGED[name].builder(spark, sf_dir)


def _plan(spark, sf_dir, name: str) -> str:
    df = STAGED[name].builder(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


_round_half_away = round_half_away


def _d2_e12(a, b) -> int:
    return sum(
        _round_half_away((float(x) - float(y)) * (float(x) - float(y))
                         * 1e12)
        for x, y in zip(a, b)
    )


def test_staged_entries_are_not_registered():
    reg = all_queries()
    assert list(STAGED) == ["q148_ivfpq_adc_topk"]
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


def _ivfpq_replay(rows):
    """The whole composed plan in plain Python, exact e12 arithmetic."""
    coarse = [v for _, v in rows[:16]]
    d = len(rows[0][1])
    sl = d // 8

    def argmin_d2(x, cands):
        d2s = [_d2_e12(x, c) for c in cands]
        best = min(range(len(cands)), key=lambda i: (d2s[i], i))
        return best, d2s

    assign, resid = {}, {}
    for vid, vec in rows:
        lst, _ = argmin_d2(vec, coarse)
        assign[vid] = lst
        resid[vid] = [float(x) - float(c)
                      for x, c in zip(vec, coarse[lst])]
    cbv = [resid[vid] for vid, _ in rows[:16]]
    code = {}
    for vid, _ in rows:
        r = resid[vid]
        for m in range(8):
            sub = r[m * sl:(m + 1) * sl]
            best, _ = argmin_d2(
                sub, [c[m * sl:(m + 1) * sl] for c in cbv])
            code[(vid, m)] = best
    expect = {}
    for qid, qvec in rows:
        if qid >= 10:
            continue
        d2s = [_d2_e12(qvec, c) for c in coarse]
        probes = sorted(range(len(coarse)),
                        key=lambda i: (d2s[i], i))[:4]
        dtab = {}
        for lst in probes:
            qr = [float(x) - float(c)
                  for x, c in zip(qvec, coarse[lst])]
            for m in range(8):
                qs = qr[m * sl:(m + 1) * sl]
                for k, c in enumerate(cbv):
                    dtab[(lst, m, k)] = _d2_e12(
                        qs, c[m * sl:(m + 1) * sl])
        scores = sorted(
            (sum(dtab[(assign[vid], m, code[(vid, m)])]
                 for m in range(8)), vid)
            for vid, _ in rows
            if vid != qid and assign[vid] in probes
        )
        expect[qid] = scores[:5]
    return expect


def test_q148_matches_bruteforce(spark, sf_dir):
    rows = sorted(
        (r.vec_id, list(r.embedding)) for r in
        tables(spark, sf_dir)["embeddings"].select(
            "vec_id", "embedding").collect()
    )
    expect = _ivfpq_replay(rows)
    got = defaultdict(list)
    for r in _run("q148_ivfpq_adc_topk", spark, sf_dir).collect():
        got[r.q_id].append((r.rank, r.n_id, r.adc_d2_e12))
    assert set(got) == {q for q, s in expect.items() if s}
    for qid, rs in got.items():
        assert rs == [(i + 1, vid, adc) for i, (adc, vid)
                      in enumerate(expect[qid])]


def test_q148_probes_restrict_candidates(spark, sf_dir):
    """IVF semantics pin: every reported neighbor's assigned list is
    one of its query's probed lists (the scan is bucketed, not
    exhaustive)."""
    rows = sorted(
        (r.vec_id, list(r.embedding)) for r in
        tables(spark, sf_dir)["embeddings"].select(
            "vec_id", "embedding").collect()
    )
    coarse = [v for _, v in rows[:16]]
    assign = {}
    for vid, vec in rows:
        d2s = [_d2_e12(vec, c) for c in coarse]
        assign[vid] = min(range(len(coarse)),
                          key=lambda i: (d2s[i], i))
    by_q = defaultdict(set)
    for vid, vec in rows:
        if vid < 10:
            d2s = [_d2_e12(vec, c) for c in coarse]
            by_q[vid] = set(sorted(
                range(len(coarse)), key=lambda i: (d2s[i], i))[:4])
    for r in _run("q148_ivfpq_adc_topk", spark, sf_dir).collect():
        assert assign[r.n_id] in by_q[r.q_id], (r.q_id, r.n_id)


def test_q148_plan_broadcast_serving_shape(spark, sf_dir):
    """Serving contract: centroids, codebooks and distance tables are
    all broadcast; the corpus-code frame never shuffles to meet them;
    no cartesian product anywhere."""
    plan = _plan(spark, sf_dir, "q148_ivfpq_adc_topk")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2  # subcb + dtab attach
    assert "InMemoryTableScan" in plan  # cached residual frame
