"""STAGED r16 surface (built r16, NOT registered — books with the r18
dedup-round rotation, tools/r18_dedup_round_plan.md) — q48i: IVF top-k
under a FULLY DETERMINISTIC fit, the "injected-sample variant" VERDICT
r15 ("What's wrong" #1) asked for to close the last rows-only residue
of the ANN family.

The coverage ladder this completes: q48g hash-verifies assignment /
probe-selection / scan stats and q48h the whole probe+rank QUERY plan,
both under INJECTED centroids; q130 hash-verifies ONE Lloyd update
under injected centroids. The residue those twins cannot reach is
exactly (a) the seeded fit-sample draw and (b) the multi-iteration
convergence loop. This entry replaces both with deterministic,
SQL-expressible policies and then runs the ENTIRE IVF pipeline —
sample draw → init → 3 Lloyd iterations → full-corpus assignment →
probe → exact re-rank → top-k — under a single plain-SQL value oracle.
Nothing on this path is sampled, seeded, or iteration-policy-dependent
in a way DuckDB cannot replay bit-for-bit.

Deterministic policies (each mirrors a production policy 1:1):

* **Sample draw** — the first ``_fit_sample_for(n_lists)`` corpus
  vectors ordered by ``(md5(CAST(vec_id AS VARCHAR)), vec_id)``. A
  hash order IS a uniform draw (statistically equivalent to the seeded
  ``DataFrame.sample`` the production fit uses — see
  operators/similarity._fit_quantizer, the documented seam), and at
  scale it executes as a distributed top-M (TakeOrderedAndProject:
  per-partition top-M then merge — no global sort, no full
  materialization), keeping the fit's ONE bounded driver collect
  (≤ 65536 × d floats) at any corpus size.
* **Init** — the first ``n_lists`` vectors of the hash-ordered sample
  (k-means init-by-random-sample, made reproducible); ``n_lists``
  clamps to the sample size exactly like ``_lloyd``'s
  fewer-points-than-lists guard.
* **Iterations** — a FIXED ``_N_ITERS = 3`` (no convergence early-out:
  the one branch a SQL replay cannot take is removed by policy, the
  same way q130 pins one step). Each iteration is the q130 contract:
  exact-e12 integer d² argmin (ties → lowest list), per-(list, dim)
  e6-integer component sums, ONE double mean per coordinate computed
  as ``(CAST(s AS DOUBLE) / n) / 1e6`` in that operand order, empty
  lists keep their centroid. Iteration t's centroids are therefore
  identical IEEE doubles in both engines, so iteration t+1's integer
  d² matches exactly — the property that lets the loop unroll into
  plain CTEs.
* **Query leg** — q48h verbatim: queries = ``vec_id < 10``, probe
  width ``_N_PROBE = 8`` by exact e12 d² (ties → lowest list),
  self-exclusion, the q48 e12 dot/norm cosine contract, rank window
  (cosine DESC, n_id ASC), k = 5.

Reference parity: n/a — no analytics surface in the reference
(readme.md:7 delegates all querying); declared engine surface
(SURVEY §2.C Q48-family extension when registered).

Window arithmetic (the q48h/q130 precedent): lives in its own module —
operators/similarity.py primitives (``_d2_e12_rows``,
``_round_nearest_ties_away_e12``, ``assign_lists_e12``, ``dot_e12``,
``norm_e12``, ``cosine_from_e12``, ``ivf_operating_point``,
``_fit_sample_for``, ``_MAX_EXACT_QUERIES``) are reused READ-ONLY, so
staging never touches that file's in-window family; MODULE_DEPS
records the read edge so the next similarity.py rotation pulls this
entry in once registered. The probe/rank tail mirrors
queries/ann_exact.ivf_topk_injected_centroids with the centroid
injection replaced by the fitted matrix; folding the two tails into
one injectable-centroid operator is booked with the r18 dedup-round
rotation (the same round this entry registers), mirroring how q48h's
builder-local assignment generator folded into
``similarity.assign_lists_e12`` in r16.

Scale design (100 TB): identical to the production IVF build shape —
the sample draw is a distributed top-M (bounded driver collect, the
fit seam); the 3 fit iterations run on the in-memory sample
(numpy, milliseconds — never a per-iteration Spark job); the ONLY
full-corpus passes are the final assignment (one Arrow pass against
the broadcast √N̄-row centroid matrix — vectors never shuffle) and the
probed-candidate broadcast join + per-query top-k window, exactly
q48h's audited plan. The elementwise-rounded exact d² costs d× a
float matmul — the audit-pass price q48h documents; q48c/q48d remain
the float-argmin serving path until the r18 dedup round switches
their fit to this draw (at which point THEY gain full value oracles
and the q48b/c/d ``no_oracle`` declaration retires).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import query, tables

_DIM = 64
_N_ITERS = 3
_K = 5
_N_PROBE = 8
_N_QUERIES = 10  # mirrors q48c/q48d/q48h's audited query slice

# SQL twins of the e12 contracts (q48h text shape, re-derived inline —
# importing llm_queries would add a spurious MODULE_DEPS edge onto its
# rotation family; see the q48h module docstring for the rationale).
_D2_E12_SQL = (
    "CAST(list_sum(list_transform(range(1, len({a}) + 1), i -> "
    "CAST(round((CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) * "
    "(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) * 1e12) AS BIGINT)))"
    " AS BIGINT)"
)
_NORM_E12_SQL = (
    "CAST(list_sum(list_transform({v}, x -> "
    "CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1e12) AS BIGINT))) "
    "AS BIGINT)"
)
_DOT_E12_SQL = (
    "CAST(list_sum(list_transform(range(1, len({a}) + 1), i -> "
    "CAST(round(CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) * 1e12) "
    "AS BIGINT))) AS BIGINT)"
)


def _iteration_ctes(t: int) -> str:
    """One unrolled Lloyd iteration: the q130 step contract, CTE-named
    per iteration so ``cent{t}`` feeds iteration t+1."""
    prev = f"cent{t - 1}"
    return (
        # exact-e12 assignment of the SAMPLE to the current centroids
        f"asg{t} AS (SELECT s.vec_id, s.x AS n_vec, c.list_id, "
        + _D2_E12_SQL.format(a="s.x", b="c.c_vec")
        + f" AS d2 FROM samp s CROSS JOIN {prev} c), "
        f"amin{t} AS (SELECT vec_id, n_vec, list_id FROM asg{t} "
        "QUALIFY row_number() OVER (PARTITION BY vec_id "
        "ORDER BY d2 ASC, list_id ASC) = 1), "
        f"pop{t} AS (SELECT list_id, CAST(count(*) AS BIGINT) AS n "
        f"FROM amin{t} GROUP BY list_id), "
        # e6 component integer sums per (list, dim) — the q127/q130 shape
        f"sums{t} AS (SELECT list_id, j, "
        "CAST(sum(CAST(round(n_vec[j] * 1e6) AS BIGINT)) AS BIGINT) AS s "
        f"FROM amin{t} CROSS JOIN range(1, {_DIM + 1}) r(j) "
        "GROUP BY list_id, j), "
        # ONE double mean per coordinate, pinned operand order (s/n)/1e6
        f"newc{t} AS (SELECT su.list_id, "
        "list(CAST(su.s AS DOUBLE) / p.n / 1e6 ORDER BY su.j) AS c_vec "
        f"FROM sums{t} su JOIN pop{t} p USING (list_id) "
        "GROUP BY su.list_id), "
        # empty lists keep their centroid (the _lloyd nonzero guard)
        f"cent{t} AS (SELECT c.list_id, COALESCE(n.c_vec, c.c_vec) AS c_vec "
        f"FROM {prev} c LEFT JOIN newc{t} n USING (list_id)), "
    )


_Q48I_ORACLE = (
    "WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings), "
    "ll AS (SELECT LEAST(GREATEST(CAST(round(sqrt(CAST(n AS DOUBLE))) "
    "AS BIGINT), 8), 4096) AS n_lists FROM nn), "
    # fit-sample size: >= 32 vectors per centroid, in [4096, 65536]
    "ss AS (SELECT LEAST(GREATEST(CAST(4096 AS BIGINT), 32 * n_lists), "
    "CAST(65536 AS BIGINT)) AS sz FROM ll), "
    # deterministic draw: hash order over vec_id, vec_id tiebreak
    "samp AS (SELECT vec_id, embedding AS x, "
    "CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, "
    "vec_id ASC) AS BIGINT) AS ord FROM embeddings "
    "QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, "
    "vec_id ASC) <= (SELECT sz FROM ss)), "
    # init: first n_lists sample vectors in hash order (clamped by size)
    "cent0 AS (SELECT ord - 1 AS list_id, "
    "list_transform(x, v -> CAST(v AS DOUBLE)) AS c_vec FROM samp "
    "WHERE ord <= (SELECT n_lists FROM ll)), "
    + "".join(_iteration_ctes(t) for t in range(1, _N_ITERS + 1))
    + f"fc AS (SELECT list_id, c_vec FROM cent{_N_ITERS}), "
    # final full-corpus assignment to the fitted centroids
    "fasg AS (SELECT e.vec_id AS n_id, e.embedding AS n_vec, c.list_id, "
    + _D2_E12_SQL.format(a="e.embedding", b="c.c_vec")
    + " AS d2 FROM embeddings e CROSS JOIN fc c), "
    "famin AS (SELECT n_id, n_vec, list_id FROM fasg QUALIFY row_number() "
    "OVER (PARTITION BY n_id ORDER BY d2 ASC, list_id ASC) = 1), "
    f"q AS (SELECT vec_id AS q_id, embedding AS q_vec, "
    + _NORM_E12_SQL.format(v="embedding")
    + f" AS q_norm FROM embeddings WHERE vec_id < {_N_QUERIES}), "
    "pd AS (SELECT q.q_id, c.list_id, "
    + _D2_E12_SQL.format(a="q.q_vec", b="c.c_vec")
    + " AS d2 FROM q CROSS JOIN fc c), "
    "probes AS (SELECT q_id, list_id FROM pd QUALIFY row_number() OVER "
    f"(PARTITION BY q_id ORDER BY d2 ASC, list_id ASC) <= {_N_PROBE}), "
    "cand AS (SELECT p.q_id, a.n_id, a.n_vec FROM probes p JOIN famin a "
    "USING (list_id) WHERE a.n_id != p.q_id), "
    "scored AS (SELECT cand.q_id, cand.n_id, "
    "CAST(" + _DOT_E12_SQL.format(a="q.q_vec", b="cand.n_vec")
    + " AS DOUBLE) / (sqrt(CAST(q.q_norm AS DOUBLE)) * sqrt(CAST("
    + _NORM_E12_SQL.format(v="cand.n_vec")
    + " AS DOUBLE))) AS cosine "
    "FROM cand JOIN q ON cand.q_id = q.q_id) "
    "SELECT q_id, CAST(row_number() OVER "
    "(PARTITION BY q_id ORDER BY cosine DESC, n_id ASC) AS BIGINT) AS rank, "
    f"n_id, cosine FROM scored QUALIFY rank <= {_K} ORDER BY q_id, rank"
)

_Q48I_DESCRIPTION = (
    "Q48i: IVF top-k under a fully deterministic fit — the injected-"
    "sample variant that closes the q48b/c/d rows-only residue "
    "(VERDICT r15 #1): fit sample = hash-ordered top-M (md5(vec_id), "
    "a uniform draw that executes as a distributed top-M), init = "
    "first n_lists sample vectors, exactly 3 Lloyd iterations under "
    "the q130 exact-e12/e6 step contract (empty lists keep their "
    "centroid), then the q48h probe+rank leg. Every stage — draw, "
    "init, loop, assignment, probe, re-rank, top-k — replays bit-for-"
    "bit in the plain-SQL oracle; with q48g/q48h/q130 this makes the "
    "ENTIRE IVF pipeline value-verified end-to-end, leaving the "
    "production path's seeded draw as a policy choice, not a "
    "correctness exemption. Plan shape = the production build: one "
    "bounded top-M collect, in-memory fit, one Arrow corpus pass "
    "against broadcast centroids, broadcast probe join — the corpus "
    "never shuffles."
)


def ivf_fit_deterministic(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iters: int = _N_ITERS,
):
    """Deterministic IVF coarse-quantizer fit; returns the (L, d)
    float64 centroid matrix (L = ``ivf_operating_point(N)`` clamped to
    the sample size), or ``None`` on an empty corpus.

    The draw is a distributed top-M by ``(md5(id), id)`` — one bounded
    driver collect, the production fit seam — and the loop is
    ``n_iters`` exact-e12 Lloyd steps (q130's contract) on the
    in-memory sample. See the module docstring for the full policy
    statement and its SQL twin.
    """
    import numpy as np

    from ..operators.similarity import (
        _d2_e12_rows,
        _fit_sample_for,
        _round_nearest_ties_away_e12,
        ivf_operating_point,
    )

    n = corpus.count()
    if n == 0:
        return None
    n_lists = ivf_operating_point(n)
    rows = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.md5(F.col(id_col).cast("string")).asc(),
                 F.col(id_col).asc())
        .limit(_fit_sample_for(n_lists))
        .collect()
    )
    x = np.asarray(
        [np.asarray(r[vec_col], dtype="float64") for r in rows]
    )
    n_lists = min(n_lists, len(x))
    cent = x[:n_lists].copy()
    e6 = _round_nearest_ties_away_e12(x * 1e6)  # loop-invariant
    for _ in range(n_iters):
        assign = _d2_e12_rows(x, cent).argmin(axis=1)  # ties -> lowest
        sums = np.zeros((len(cent), x.shape[1]), dtype="int64")
        np.add.at(sums, assign, e6)
        counts = np.bincount(assign, minlength=len(cent))
        nz = counts > 0
        # pinned operand order (s / n) / 1e6 — the oracle's expression
        cent[nz] = (sums[nz].astype("float64") / counts[nz, None]) / 1e6
    return cent


def q48i(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tables(spark, sf_dir)["embeddings"]
    return ivf_topk_deterministic_fit(
        emb, emb.where(F.col("vec_id") < _N_QUERIES),
        k=_K, n_probe=_N_PROBE,
    )


def ivf_topk_deterministic_fit(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = _K,
    n_probe: int = _N_PROBE,
) -> DataFrame:
    """IVF top-k with the deterministic fit (q48i's engine): the q48h
    probe+rank plan with the centroid injection replaced by
    :func:`ivf_fit_deterministic`'s matrix. Input contract: unique
    ``id_col`` per (id, vec) pair, as in the sibling ANN paths."""
    import numpy as np

    from ..operators.similarity import (
        _MAX_EXACT_QUERIES,
        _d2_e12_rows,
        assign_lists_e12,
        cosine_from_e12,
        dot_e12,
        norm_e12,
    )

    spark = corpus.sparkSession
    out_schema = "q_id long, rank long, n_id long, cosine double"

    qrows = (
        queries.dropDuplicates([id_col])
        .select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
        .collect()
    )
    if len(qrows) > _MAX_EXACT_QUERIES:
        raise ValueError(
            f"ivf_topk_deterministic_fit: {len(qrows)} query vectors "
            f"exceed the small-by-contract bound {_MAX_EXACT_QUERIES}"
        )
    if not qrows:
        return spark.createDataFrame([], out_schema)
    cent = ivf_fit_deterministic(corpus, id_col, vec_col)
    if cent is None:
        return spark.createDataFrame([], out_schema)
    n_lists = len(cent)

    feats = corpus.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec")
    )
    assigned = assign_lists_e12(feats, cent, keep_cols=("n_id", "n_vec"))

    # probe selection: driver-side on the bounded query set (Q x n_lists
    # exact e12 d2; lexsort's last key is primary -> d2 asc, list_id asc)
    q_mat = np.asarray(
        [np.asarray(r["q_vec"], dtype="float64") for r in qrows]
    )
    qd2 = _d2_e12_rows(q_mat, cent)
    probe_rows = []
    for row, r in enumerate(qrows):
        order = np.lexsort((np.arange(n_lists), qd2[row]))
        probe_rows.extend(
            (int(r["q_id"]), list(map(float, r["q_vec"])), int(order[rank]))
            for rank in range(min(n_probe, n_lists))
        )
    probes = spark.createDataFrame(
        probe_rows, "q_id long, q_vec array<float>, list_id long"
    )

    scored = (
        assigned.join(F.broadcast(probes), "list_id")
        .where(F.col("n_id") != F.col("q_id"))
        .select(
            "q_id",
            "n_id",
            cosine_from_e12(
                dot_e12(F.col("q_vec"), F.col("n_vec")),
                norm_e12(F.col("q_vec")),
                norm_e12(F.col("n_vec")),
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("n_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "n_id", "cosine")
        .orderBy("q_id", "rank")
    )


STAGED = {
    "q48i_ivf_deterministic_fit_topk": (
        q48i, _Q48I_ORACLE, _Q48I_DESCRIPTION, ("llm", "governance")),
}


def register() -> None:
    """r18 registration seam — see joins_ext.register for the pattern."""
    for name, (fn, oracle, desc, tags) in STAGED.items():
        query(name, oracle=oracle, description=desc, tags=tags)(fn)


__all__ = [
    "q48i",
    "ivf_fit_deterministic",
    "ivf_topk_deterministic_fit",
    "STAGED",
    "register",
]
