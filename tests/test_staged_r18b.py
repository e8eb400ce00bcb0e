"""r16-staged battery for the ROUND-18 dedup-round registration —
q48i_ivf_deterministic_fit_topk (ivf_fit.py): IVF top-k under a fully
deterministic fit (hash-ordered sample draw, deterministic init, 3
unrolled exact-e12 Lloyd iterations, the q48h probe+rank leg), the
injected-sample variant VERDICT r15 #1 asked for.

Same checks as the sibling staged batteries: staging containment,
oracle parity through the driver-mirror harness, a full independent
Python replay from raw rows (hashlib md5 — neither engine's hash), fit
policy unit pins (n_lists clamp, empty-list centroid persistence,
hash-order parity), determinism, and plan pins on the scale contracts.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from bucket_to_bigquery_spark.queries import all_queries, ivf_fit
from bucket_to_bigquery_spark.queries.registry import (
    Query,
    _with_tuning,
    tables,
)

from .oracle import compare, duck_connection

STAGED: dict[str, Query] = {
    name: Query(name, _with_tuning(fn), oracle, desc, tags)
    for name, (fn, oracle, desc, tags) in ivf_fit.STAGED.items()
}

_NAME = "q48i_ivf_deterministic_fit_topk"


def _plan(spark, sf_dir) -> str:
    df = STAGED[_NAME].builder(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_staged_entry_is_not_registered():
    reg = all_queries()
    assert set(STAGED) == {_NAME}
    assert _NAME not in reg, (
        f"{_NAME} is registered — the r18 dedup-round staging plan "
        "(tools/r18_dedup_round_plan.md) no longer matches"
    )


def test_staged_oracle_parity(spark, sf_dir):
    duck = duck_connection(sf_dir)
    try:
        problems = compare(_NAME, spark, duck, sf_dir, STAGED)
        assert not problems, f"{_NAME}: " + "; ".join(problems)
    finally:
        duck.close()


# ---------------------------------------------------------------------------
# independent replay — hashlib order, pure-Python e12/e6 arithmetic
# ---------------------------------------------------------------------------


def _round_engine(v: float) -> int:
    """Engine-exact ROUND on a double: nearest, ties away from zero —
    the semantics both Spark and DuckDB apply. Implemented WITHOUT the
    floor(x+0.5) idiom (oracle.round_half_away), whose add flips
    values one ulp below a .5 boundary; this battery asserts cosine
    BIT-equality, so the replay must round exactly as the engines do.
    Python round() is nearest-ties-to-even with no pre-arithmetic
    (exact, like np.rint); representable .5 fractions are binary, so
    the explicit tie branch is exact too."""
    t = math.trunc(v)
    if abs(v - t) == 0.5:
        return int(t) + (1 if v > 0 else -1)
    return round(v)


def _d2_e12(a, b) -> int:
    return sum(
        _round_engine((x - y) * (x - y) * 1e12) for x, y in zip(a, b)
    )


def _dot_e12(a, b) -> int:
    return sum(_round_engine(x * y * 1e12) for x, y in zip(a, b))


def _norm_e12(a) -> int:
    return sum(_round_engine(x * x * 1e12) for x in a)


def _replay(rows, n_iters=3, k=5, n_probe=8, n_queries=10):
    """Pure-Python replay of the whole q48i pipeline from raw
    (vec_id, embedding) rows. The sample order uses hashlib.md5 —
    independent of BOTH engines' md5 — so it cross-checks the draw
    policy itself, not just the arithmetic."""
    n = len(rows)
    n_lists = max(8, min(_round_engine(math.sqrt(n)), 4096))
    sample_sz = min(max(4096, 32 * n_lists), 65536)
    order = sorted(
        rows,
        key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0]),
    )
    samp = [[float(v) for v in r[1]] for r in order[:sample_sz]]
    n_lists = min(n_lists, len(samp))
    cent = [list(v) for v in samp[:n_lists]]
    dim = len(cent[0])
    for _ in range(n_iters):
        sums = [[0] * dim for _ in range(n_lists)]
        counts = [0] * n_lists
        for v in samp:
            best = min(
                range(n_lists), key=lambda li: (_d2_e12(v, cent[li]), li)
            )
            counts[best] += 1
            for j in range(dim):
                sums[best][j] += _round_engine(v[j] * 1e6)
        for li in range(n_lists):
            if counts[li]:
                cent[li] = [
                    (float(sums[li][j]) / counts[li]) / 1e6
                    for j in range(dim)
                ]
    assign = {}
    vecs = {}
    for vid, emb in rows:
        v = [float(x) for x in emb]
        vecs[vid] = v
        assign[vid] = min(
            range(n_lists), key=lambda li: (_d2_e12(v, cent[li]), li)
        )
    out = []
    for qid in sorted(vid for vid, _ in rows if vid < n_queries):
        qv = vecs[qid]
        probed = sorted(
            range(n_lists), key=lambda li: (_d2_e12(qv, cent[li]), li)
        )[:n_probe]
        probed = set(probed)
        cands = [
            nid for nid in vecs
            if nid != qid and assign[nid] in probed
        ]
        qn = math.sqrt(float(_norm_e12(qv)))
        scored = [
            (
                nid,
                float(_dot_e12(qv, vecs[nid]))
                / (qn * math.sqrt(float(_norm_e12(vecs[nid])))),
            )
            for nid in cands
        ]
        scored.sort(key=lambda t: (-t[1], t[0]))
        out.extend(
            (qid, rank + 1, nid, cos)
            for rank, (nid, cos) in enumerate(scored[:k])
        )
    return out


def test_q48i_matches_bruteforce(spark, sf_dir):
    raw = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in tables(spark, sf_dir)["embeddings"]
        .select("vec_id", "embedding").collect()
    ]
    expected = _replay(raw)
    got = [
        (int(r["q_id"]), int(r["rank"]), int(r["n_id"]), float(r["cosine"]))
        for r in STAGED[_NAME].builder(spark, sf_dir).collect()
    ]
    assert [(q, rk, nid) for q, rk, nid, _ in got] == [
        (q, rk, nid) for q, rk, nid, _ in expected
    ]
    for (*_, cg), (*_, ce) in zip(got, expected):
        assert cg == ce  # same ints, same IEEE ops -> bit-equal cosines


def test_q48i_deterministic(spark, sf_dir):
    a = STAGED[_NAME].builder(spark, sf_dir).collect()
    b = STAGED[_NAME].builder(spark, sf_dir).collect()
    assert a == b


# ---------------------------------------------------------------------------
# fit policy unit pins
# ---------------------------------------------------------------------------


def test_fit_clamps_n_lists_to_corpus(spark):
    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(5)],
        "vec_id long, embedding array<float>",
    )
    cent = ivf_fit.ivf_fit_deterministic(df)
    # N=5 -> operating point 8, clamped to the 5 available vectors
    assert cent.shape == (5, 2)


def test_fit_empty_lists_keep_centroids(spark):
    # three identical vectors + one distinct: every duplicate assigns to
    # the lowest identical list, the other duplicate lists go EMPTY and
    # must keep their init centroid (the _lloyd nonzero guard; the
    # oracle's cent LEFT JOIN COALESCE branch)
    df = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(3)] + [(3, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    cent = ivf_fit.ivf_fit_deterministic(df, n_iters=1)
    got = sorted(map(tuple, cent.tolist()))
    # centroids are exactly the four inputs in some hash order: the
    # populated lists' means reproduce their members, the empty ones
    # keep their init vectors
    assert got == sorted(
        [(1.0, 0.0), (1.0, 0.0), (1.0, 0.0), (0.0, 1.0)]
    )


def test_fit_sample_order_matches_hashlib(spark, sf_dir):
    ids = [
        int(r["vec_id"])
        for r in tables(spark, sf_dir)["embeddings"]
        .select("vec_id")
        .orderBy(F.md5(F.col("vec_id").cast("string")).asc(),
                 F.col("vec_id").asc())
        .limit(30)
        .collect()
    ]
    all_ids = [
        int(r["vec_id"])
        for r in tables(spark, sf_dir)["embeddings"]
        .select("vec_id").collect()
    ]
    expected = sorted(
        all_ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
    )[:30]
    assert ids == expected


def test_empty_query_set_short_circuits(spark, sf_dir):
    emb = tables(spark, sf_dir)["embeddings"]
    out = ivf_fit.ivf_topk_deterministic_fit(
        emb, emb.where(F.lit(False))
    )
    assert out.collect() == []


def test_round_engine_matches_duckdb_on_adversarial_values():
    """The replay's _round_engine claims engine semantics (nearest,
    ties away from zero, no pre-arithmetic). Validate against a REAL
    engine on the adversarial corpus: exact .5 ties (positive and
    negative), values one ulp below/above a .5 boundary (where the
    floor(x+0.5) idiom flips), and plain values."""
    import duckdb

    cases = [
        0.5, 1.5, 2.5, -0.5, -1.5, -2.5,
        0.49999999999999994, -0.49999999999999994,
        1.4999999999999998, -1.4999999999999998,
        0.5000000000000001, -0.5000000000000001,
        3.0, -3.0, 0.0, 2.4, -2.4, 2.6, -2.6,
        123456789.5, -123456789.5,
    ]
    con = duckdb.connect()
    try:
        for v in cases:
            got = _round_engine(v)
            want = con.execute(
                "SELECT CAST(round(CAST(? AS DOUBLE)) AS BIGINT)", [v]
            ).fetchone()[0]
            assert got == want, f"round({v!r}): replay {got}, duckdb {want}"
    finally:
        con.close()


# ---------------------------------------------------------------------------
# the top-M draw regime: fit sample strictly smaller than the corpus
# ---------------------------------------------------------------------------


def test_q48i_oracle_parity_when_sample_lt_corpus(spark, sf_dir):
    """At every testdata SF the corpus fits inside the 4096-vector fit
    sample, so plain parity runs never exercise the top-M draw path
    (ORDER BY hash LIMIT M with M < N). Expand the fixture's own
    embeddings deterministically just past the cap and hash-compare
    there too. (A 10x sf0.1 expansion — N=20,000, sample 4,096,
    n_lists=141 — passed the same comparison in the r16 continuation
    session, 143.9 s; this standing version is sized to stay cheap at
    any suite SF.)"""
    import os
    import shutil
    import tempfile

    import duckdb

    os.makedirs("/tmp/b2bqs", exist_ok=True)
    # unique per run: two concurrent sessions must not share the dir
    big = tempfile.mkdtemp(prefix="ivf_fit_bigsf_", dir="/tmp/b2bqs")
    try:
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents"):
            shutil.copy(f"{sf_dir}/{t}.parquet", f"{big}/{t}.parquet")
        con = duckdb.connect()
        try:
            n0 = con.execute(
                f"SELECT count(*) FROM '{sf_dir}/embeddings.parquet'"
            ).fetchone()[0]
            factor = 4097 // n0 + 1  # smallest expansion past the cap
            con.execute(
                "COPY (SELECT e.vec_id + c.c * "
                f"{n0} AS vec_id, "
                "CASE WHEN c.c = 0 THEN e.embedding ELSE "
                "list_transform(list_zip(e.embedding, "
                "range(1, len(e.embedding) + 1)), z -> CAST(z[1] + "
                "((e.vec_id * 31 + z[2] * 7 + c.c * 13) % 97 - 48) "
                "* 2.6e-3 AS FLOAT)) END AS embedding "
                f"FROM '{sf_dir}/embeddings.parquet' e CROSS JOIN "
                f"(SELECT unnest(range({factor})) AS c) c) "
                f"TO '{big}/embeddings.parquet' (FORMAT PARQUET)"
            )
        finally:
            con.close()
        duck = duck_connection(big)
        try:
            problems = compare(_NAME, spark, duck, big, STAGED)
            assert not problems, (
                f"{_NAME} @ N={n0 * factor}: " + "; ".join(problems))
        finally:
            duck.close()
    finally:
        shutil.rmtree(big, ignore_errors=True)


# ---------------------------------------------------------------------------
# plan pins
# ---------------------------------------------------------------------------


def test_q48i_plan_pins(spark, sf_dir):
    plan = _plan(spark, sf_dir)
    # the corpus never cross-joins anything; the probe frame broadcasts
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
    # the assignment is the shared Arrow pass (assign_lists_e12)
    assert "MapInPandas" in plan
