"""STAGED r17 surface (built late r13, NOT registered — GATE_r13.md's
round-17 note budgets the slot) — q139: product-quantization (PQ)
encode audit — the vector-compression leg of the ANN family
(q48/q48b–h): split each D-dim embedding into M=8 subvectors, assign
every subvector to its nearest of K=16 injected codewords, and emit
each vector's code word — the M 4-bit codes packed into one BIGINT
(nibble m at bit 4m) — plus its exact reconstruction error. PQ is
how a 100 TB embedding corpus becomes servable: 64 float32 dims
(256 B) compress to M=8 code bytes (32×), and IVF-PQ scans the codes.

Codebooks are INJECTED deterministically — the K lowest-vec_id corpus
vectors' sub-slices, the q48h/q130 injected-centroid discipline — so
the full encode path (sub-slicing, per-subspace exact-e12 argmin with
ties to the lowest codeword, code assembly, error accumulation) is
bit-reproducible in plain SQL. The e12 d² contract is re-derived
inline (the q48h rationale: importing llm_queries/similarity would
add a spurious MODULE_DEPS edge onto their rotation families).

Reference parity: n/a — no analytics surface in the reference;
declared engine surface (SURVEY §2.C Q48-family extension when
registered).

Determinism: per-subspace distances are the exact e12 integers
(elementwise round((x−y)²·1e12) sums — the q48g/q48h contract);
argmin ties break to the lowest code_id; the code word packs nibble
m at bit 4m (pure integer shifts); recon error is an integer sum.
Ordered by vec_id.

Scale design (100 TB): the codebook is K·M tiny sub-slices broadcast
to every executor; the corpus makes ONE pass (explode ×M, broadcast
join, per-(vector, subspace) argmin window over a ≤K-row group) and
never shuffles full vectors — the only shuffle keys are
(vec_id, m) pairs for the window and vec_id for the final assembly.
Codebook selection uses TakeOrdered (distributed top-K by vec_id),
not a global sort. The elementwise-rounded exact d² costs d× a float
matmul — the audit-pass price, as q48h documents; a production
encoder would run the same plan with float d² and the fitted
codebooks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import query, tables

_M = 8       # subspaces
_KCB = 16    # codewords per subspace

# SQL twin of the exact e12 squared-distance contract (q48h text shape,
# re-derived inline — see module docstring).
_D2_E12_SQL = (
    "CAST(list_sum(list_transform(range(1, len({a}) + 1), i -> "
    "CAST(round((CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) * "
    "(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) * 1e12) AS BIGINT)))"
    " AS BIGINT)"
)

_D2_E12_SPARK = (
    "aggregate(zip_with({a}, {b}, (x, y) -> "
    "cast(round((cast(x as double) - cast(y as double)) * "
    "(cast(x as double) - cast(y as double)) * 1e12) as bigint)), "
    "cast(0 as bigint), (acc, v) -> acc + v)"
)

_Q139_ORACLE = (
    "WITH p AS (SELECT len(embedding) // "
    f"{_M} AS sl FROM embeddings LIMIT 1), "
    "cb AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) "
    "- 1 AS code_id, embedding AS cvec FROM embeddings "
    f"QUALIFY row_number() OVER (ORDER BY vec_id) <= {_KCB}), "
    f"ms AS (SELECT unnest(range({_M})) AS m), "
    "subcb AS (SELECT m, code_id, "
    "list_slice(cvec, m * sl + 1, m * sl + sl) AS csub FROM cb, ms, p), "
    "ex AS (SELECT vec_id, m, "
    "list_slice(embedding, m * sl + 1, m * sl + sl) AS vsub "
    "FROM embeddings, ms, p), "
    "d AS (SELECT vec_id, ex.m, code_id, "
    + _D2_E12_SQL.format(a="vsub", b="csub")
    + " AS d2 FROM ex JOIN subcb ON ex.m = subcb.m), "
    "pick AS (SELECT vec_id, m, code_id, d2 FROM d "
    "QUALIFY row_number() OVER (PARTITION BY vec_id, m "
    "ORDER BY d2 ASC, code_id ASC) = 1) "
    "SELECT vec_id, "
    "CAST(sum(code_id * (CAST(1 AS BIGINT) << (4 * m))) AS BIGINT) "
    "AS pq_code, "
    "CAST(sum(d2) AS BIGINT) AS recon_d2_e12 "
    "FROM pick GROUP BY vec_id ORDER BY vec_id"
)

_Q139_DESCRIPTION = (
    "Q139: product-quantization encode audit — M=8 subspaces, K=16 "
    "injected codewords (the lowest-vec_id corpus vectors' sub-slices, "
    "the q48h/q130 injected-centroid discipline): per-subspace exact "
    "e12 argmin (ties to lowest code), the 4-bit codes packed into one "
    "BIGINT code word, integer reconstruction error — the "
    "32x-compression leg of the ANN family, bit-reproducible in plain "
    "SQL. Scale-correct: broadcast codebook, ONE corpus pass, full "
    "vectors never shuffle (window keys are (vec_id, m) only), "
    "TakeOrdered codebook selection — never a global sort."
)


def q139(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tables(spark, sf_dir)["embeddings"]
    return pq_encode(emb)


def pq_encode(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m_sub: int = _M,
    k_codes: int = _KCB,
) -> DataFrame:
    """PQ-encode ``corpus`` against injected codebooks (the ``k_codes``
    lowest-``id_col`` vectors' sub-slices). Returns one row per vector:
    (id, packed BIGINT code word — nibble m at bit 4m — and the exact
    e12 recon error).
    """
    sl = "(size({v}) div " + str(m_sub) + ")"
    sub = ("slice({v}, cast(m * " + sl + " + 1 as int), "
           "cast(" + sl + " as int))")
    # TakeOrdered (distributed) top-K by id — never a global sort
    cb = corpus.select(id_col, vec_col).orderBy(id_col).limit(k_codes)
    cbw = cb.select(
        (F.row_number().over(Window.orderBy(id_col)) - 1)
        .cast("long").alias("code_id"),
        F.col(vec_col).alias("cvec"),
    )
    subcb = cbw.select(
        "code_id",
        F.explode(F.expr(f"sequence(0, {m_sub - 1})")).alias("m"),
        "cvec",
    ).select(
        "m", "code_id",
        F.expr(sub.format(v="cvec")).alias("csub"),
    )
    ex = corpus.select(
        F.col(id_col).alias("vid"),
        F.explode(F.expr(f"sequence(0, {m_sub - 1})")).alias("m"),
        F.col(vec_col).alias("vec"),
    ).select(
        "vid", "m",
        F.expr(sub.format(v="vec")).alias("vsub"),
    )
    d = ex.join(F.broadcast(subcb), "m").select(
        "vid", "m", "code_id",
        F.expr(_D2_E12_SPARK.format(a="vsub", b="csub")).alias("d2"),
    )
    w = Window.partitionBy("vid", "m").orderBy(
        F.col("d2").asc(), F.col("code_id").asc())
    pick = d.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == 1)
    return (
        pick.groupBy("vid")
        .agg(
            F.sum(
                F.expr("code_id * shiftleft(cast(1 as bigint), 4 * m)")
            ).cast("long").alias("pq_code"),
            F.sum("d2").cast("long").alias("recon_d2_e12"),
        )
        .select(F.col("vid").alias("vec_id"), "pq_code", "recon_d2_e12")
        .orderBy("vec_id")
    )


STAGED = {
    "q139_pq_encode": (q139, _Q139_ORACLE, _Q139_DESCRIPTION,
                       ("llm", "similarity")),
}


def register() -> None:
    """r17 registration seam — see joins_ext.register for the pattern."""
    for name, (fn, oracle, desc, tags) in STAGED.items():
        query(name, oracle=oracle, description=desc, tags=tags)(fn)


__all__ = ["q139", "pq_encode", "STAGED", "register"]
