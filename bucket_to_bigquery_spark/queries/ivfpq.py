"""STAGED r17+ surface (built late r13, NOT registered — GATE_r13.md's
round-17 note budgets the slot) — q148: IVF-PQ asymmetric-distance
top-k — the CAPSTONE of the ANN family: the production serving
architecture for a 100 TB embedding corpus combines the IVF coarse
quantizer (q48c/d/g/h: probe a few inverted lists, never scan the
corpus) with product quantization of the RESIDUALS (q139/q141: scan
the probed lists as code bytes, never as vectors). This entry runs
that whole composed plan — coarse assignment, residual computation,
residual PQ encode, per-(query, probed-list) distance tables, ADC
scoring of probed candidates, top-k — under injected deterministic
parameters, bit-reproducible in plain SQL.

Injection discipline (q48h/q130/q139): the 16 coarse centroids are
the lowest-vec_id corpus vectors; the residual sub-codebooks are the
residuals OF those same 16 vectors (deterministic, since assignment
under the exact contract is deterministic). The e12 d² twin is
re-derived inline (the q48h no-spurious-edge rationale).

Reference parity: n/a — no analytics surface in the reference;
declared engine surface (SURVEY §2.C Q48-family extension when
registered).

Determinism: every distance is the exact e12 integer contract
(elementwise round BEFORE the sum) over doubles produced by exact
IEEE float32→double casts and subtractions in one shared operand
order; coarse assignment ties → lowest list, code ties → lowest
code, probe selection ties → lowest list, top-k ties → lowest
neighbor id. Ordered (q_id, rank).

Scale design (100 TB): the serving shape end to end — coarse
centroids and sub-codebooks broadcast (tiny); ONE corpus pass
assigns + encodes (vectors never shuffle; the encoded corpus is
(vid, list, m, code) — the 32×-compressed representation PQ exists
for); per-query work is n_probe·M·K table entries BROADCAST against
the probed lists' codes; the ADC combine keys on (q, vid). The
elementwise-rounded exact d² costs d× a float kernel — the audit
price, as q48h documents; production serving runs this identical
plan with float tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import query, tables

_N_LISTS = 16
_N_PROBE = 4
_M = 8
_KCB = 16
_K = 5
_N_QUERIES = 10  # the q48-family audited query slice (vec_id < 10)

_D2_E12_SQL = (
    "CAST(list_sum(list_transform(range(1, len({a}) + 1), i -> "
    "CAST(round((CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) * "
    "(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) * 1e12) AS BIGINT)))"
    " AS BIGINT)"
)
_RESID_SQL = (
    "list_transform(range(1, len({x}) + 1), i -> "
    "CAST({x}[i] AS DOUBLE) - CAST({c}[i] AS DOUBLE))"
)

_D2_E12_SPARK = (
    "aggregate(zip_with({a}, {b}, (x, y) -> "
    "cast(round((cast(x as double) - cast(y as double)) * "
    "(cast(x as double) - cast(y as double)) * 1e12) as bigint)), "
    "cast(0 as bigint), (acc, v) -> acc + v)"
)
_RESID_SPARK = (
    "zip_with({x}, {c}, (a, b) -> cast(a as double) - cast(b as double))"
)

_Q148_ORACLE = (
    "WITH p AS (SELECT len(embedding) // "
    f"{_M} AS sl FROM embeddings LIMIT 1), "
    # injected coarse centroids: the 16 lowest-vec_id vectors
    "coarse AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) "
    "AS BIGINT) - 1 AS list_id, vec_id AS c_vid, embedding AS cvec "
    f"FROM embeddings QUALIFY row_number() OVER (ORDER BY vec_id) <= "
    f"{_N_LISTS}), "
    # corpus -> nearest coarse centroid (exact e12, ties lowest list)
    "ad AS (SELECT e.vec_id, c.list_id, "
    + _D2_E12_SQL.format(a="e.embedding", b="c.cvec")
    + " AS d2 FROM embeddings e CROSS JOIN coarse c), "
    "asg AS (SELECT vec_id, list_id FROM ad QUALIFY row_number() OVER "
    "(PARTITION BY vec_id ORDER BY d2 ASC, list_id ASC) = 1), "
    # residuals under the assignment
    "res AS (SELECT e.vec_id, a.list_id, "
    + _RESID_SQL.format(x="e.embedding", c="c.cvec")
    + " AS r FROM embeddings e JOIN asg a ON e.vec_id = a.vec_id "
    "JOIN coarse c ON a.list_id = c.list_id), "
    # injected residual sub-codebooks: residuals of the same 16 vectors
    "cbv AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) "
    "- 1 AS code_id, r FROM res "
    f"QUALIFY row_number() OVER (ORDER BY vec_id) <= {_KCB}), "
    f"ms AS (SELECT unnest(range({_M})) AS m), "
    "subcb AS (SELECT m, code_id, "
    "list_slice(r, m * sl + 1, m * sl + sl) AS csub FROM cbv, ms, p), "
    # residual PQ encode of the whole corpus
    "ex AS (SELECT vec_id, list_id, m, "
    "list_slice(r, m * sl + 1, m * sl + sl) AS vsub FROM res, ms, p), "
    "ed AS (SELECT vec_id, list_id, ex.m, code_id, "
    + _D2_E12_SQL.format(a="vsub", b="csub")
    + " AS d2 FROM ex JOIN subcb ON ex.m = subcb.m), "
    "enc AS (SELECT vec_id, list_id, m, code_id FROM ed "
    "QUALIFY row_number() OVER (PARTITION BY vec_id, m "
    "ORDER BY d2 ASC, code_id ASC) = 1), "
    # queries: probe the n_probe nearest lists
    "q AS (SELECT vec_id AS q_id, embedding AS qvec FROM embeddings "
    f"WHERE vec_id < {_N_QUERIES}), "
    "pd AS (SELECT q.q_id, c.list_id, c.cvec, "
    + _D2_E12_SQL.format(a="q.qvec", b="c.cvec")
    + " AS d2 FROM q CROSS JOIN coarse c), "
    "probes AS (SELECT q_id, list_id, cvec FROM pd "
    "QUALIFY row_number() OVER (PARTITION BY q_id "
    f"ORDER BY d2 ASC, list_id ASC) <= {_N_PROBE}), "
    # per-(query, probed list) residual distance tables
    "qr AS (SELECT pr.q_id, pr.list_id, "
    + _RESID_SQL.format(x="q.qvec", c="pr.cvec")
    + " AS r FROM probes pr JOIN q ON pr.q_id = q.q_id), "
    "qx AS (SELECT q_id, list_id, m, "
    "list_slice(r, m * sl + 1, m * sl + sl) AS qsub FROM qr, ms, p), "
    "dtab AS (SELECT q_id, list_id, subcb.m, code_id, "
    + _D2_E12_SQL.format(a="qsub", b="csub")
    + " AS qd2 FROM qx JOIN subcb ON qx.m = subcb.m), "
    # ADC over probed candidates (self excluded)
    "adc AS (SELECT d.q_id, e.vec_id AS n_id, "
    "CAST(sum(d.qd2) AS BIGINT) AS adc_d2_e12 "
    "FROM enc e JOIN dtab d ON e.list_id = d.list_id "
    "AND e.m = d.m AND e.code_id = d.code_id "
    "WHERE e.vec_id != d.q_id GROUP BY d.q_id, e.vec_id) "
    "SELECT q_id, CAST(row_number() OVER (PARTITION BY q_id "
    "ORDER BY adc_d2_e12 ASC, n_id ASC) AS BIGINT) AS rank, "
    "n_id, adc_d2_e12 FROM adc "
    f"QUALIFY rank <= {_K} ORDER BY q_id, rank"
)

_Q148_DESCRIPTION = (
    "Q148: IVF-PQ asymmetric-distance top-5 — the ANN capstone: "
    "injected coarse centroids assign every vector to an inverted "
    "list, residuals PQ-encode against injected residual "
    "sub-codebooks (one corpus pass, vectors never shuffle, the "
    "32x-compressed (list, codes) representation), each query builds "
    "per-probed-list residual distance tables (n_probe*M*K e12 "
    "entries, broadcast) and scores ONLY the probed lists' candidates "
    "as sums of table lookups — the production IVF+PQ serving plan "
    "end to end, integer-exact with a full value oracle (ties: "
    "lowest list/code/neighbor)."
)


def q148(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tables(spark, sf_dir)["embeddings"]
    return ivfpq_adc_topk(
        emb, emb.where(F.col("vec_id") < _N_QUERIES))


def ivfpq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = _N_LISTS,
    n_probe: int = _N_PROBE,
    m_sub: int = _M,
    k_codes: int = _KCB,
    k: int = _K,
) -> DataFrame:
    """IVF-PQ ADC top-k under injected coarse centroids + residual
    codebooks (the lowest-``id_col`` vectors / their residuals)."""
    sl = f"(size(r) div {m_sub})"
    sub_r = f"slice(r, cast(m * {sl} + 1 as int), cast({sl} as int))"

    # two broadcast consumers (corpus assignment + query probing) ->
    # cache; if uncached, each broadcast would replay the TakeOrdered
    # corpus scan
    coarse = (
        corpus.select(id_col, vec_col).orderBy(id_col).limit(n_lists)
        .select(
            (F.row_number().over(Window.orderBy(id_col)) - 1)
            .cast("long").alias("list_id"),
            F.col(vec_col).alias("cvec"),
        )
        .cache()
    )
    # coarse assignment: one corpus pass against the broadcast centroids
    ad = corpus.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
    ).crossJoin(F.broadcast(coarse)).select(
        "vid", "list_id", "vec", "cvec",
        F.expr(_D2_E12_SPARK.format(a="vec", b="cvec")).alias("d2"),
    )
    wv = Window.partitionBy("vid").orderBy(
        F.col("d2").asc(), F.col("list_id").asc())
    # residuals ride the argmin row (cvec is already joined) — no
    # second corpus join; cache: three consumers (codebook slice,
    # corpus encode, nothing else touches vectors again)
    res = (
        ad.withColumn("rn", F.row_number().over(wv))
        .where(F.col("rn") == 1)
        .select(
            "vid", "list_id",
            F.expr(_RESID_SPARK.format(x="vec", c="cvec")).alias("r"),
        )
        .cache()
    )
    cbv = res.orderBy("vid").limit(k_codes).select(
        (F.row_number().over(Window.orderBy("vid")) - 1)
        .cast("long").alias("code_id"),
        "r",
    )
    subcb = cbv.select(
        "code_id",
        F.explode(F.expr(f"sequence(0, {m_sub - 1})")).alias("m"),
        "r",
    ).select("m", "code_id", F.expr(sub_r).alias("csub")).cache()
    ex = res.select(
        "vid", "list_id",
        F.explode(F.expr(f"sequence(0, {m_sub - 1})")).alias("m"),
        "r",
    ).select("vid", "list_id", "m", F.expr(sub_r).alias("vsub"))
    edd = ex.join(F.broadcast(subcb), "m").select(
        "vid", "list_id", "m", "code_id",
        F.expr(_D2_E12_SPARK.format(a="vsub", b="csub")).alias("d2"),
    )
    wvm = Window.partitionBy("vid", "m").orderBy(
        F.col("d2").asc(), F.col("code_id").asc())
    enc = edd.withColumn("rn", F.row_number().over(wvm)).where(
        F.col("rn") == 1).select("vid", "list_id", "m", "code_id")

    qf = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("qvec"))
    pd = qf.crossJoin(F.broadcast(coarse)).select(
        "q_id", "list_id", "qvec", "cvec",
        F.expr(_D2_E12_SPARK.format(a="qvec", b="cvec")).alias("d2"),
    )
    wq = Window.partitionBy("q_id").orderBy(
        F.col("d2").asc(), F.col("list_id").asc())
    probes = pd.withColumn("rn", F.row_number().over(wq)).where(
        F.col("rn") <= n_probe)
    qr = probes.select(
        "q_id", "list_id",
        F.expr(_RESID_SPARK.format(x="qvec", c="cvec")).alias("r"),
    )
    qx = qr.select(
        "q_id", "list_id",
        F.explode(F.expr(f"sequence(0, {m_sub - 1})")).alias("m"),
        "r",
    ).select("q_id", "list_id", "m", F.expr(sub_r).alias("qsub"))
    dtab = qx.join(F.broadcast(subcb), "m").select(
        "q_id", "list_id", "m", "code_id",
        F.expr(_D2_E12_SPARK.format(a="qsub", b="csub")).alias("qd2"),
    )
    adc = (
        enc.join(F.broadcast(dtab), ["list_id", "m", "code_id"])
        .where(F.col("vid") != F.col("q_id"))
        .groupBy("q_id", "vid")
        .agg(F.sum("qd2").cast("long").alias("adc_d2_e12"))
    )
    wr = Window.partitionBy("q_id").orderBy(
        F.col("adc_d2_e12").asc(), F.col("vid").asc())
    return (
        adc.withColumn("rank", F.row_number().over(wr).cast("long"))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", F.col("vid").alias("n_id"),
                "adc_d2_e12")
        .orderBy("q_id", "rank")
    )


STAGED = {
    "q148_ivfpq_adc_topk": (q148, _Q148_ORACLE, _Q148_DESCRIPTION,
                            ("llm", "similarity")),
}


def register() -> None:
    """r17+ registration seam — see joins_ext.register for the pattern."""
    for name, (fn, oracle, desc, tags) in STAGED.items():
        query(name, oracle=oracle, description=desc, tags=tags)(fn)


__all__ = ["q148", "ivfpq_adc_topk", "STAGED", "register"]
