"""STAGED r20 surface (built in r14, NOT registered — GATE_r14.md's
round-20 note budgets the slot) — q163: hard-negative mining audit
over the labeled embedding corpus — the retrieval-TRAINING-data
primitive next to the serving scans (q48 family) and their quality
audits (q48f kNN labels, q159 PQ recall): for every audited query
vector, the nearest SAME-label neighbor, the nearest DIFFERENT-label
neighbor (the hard negative a contrastive trainer mines), the exact
integer margin between them, and how many of the exact top-10 are
negatives (the local label-noise signal).

Reference parity: n/a — no analytics surface in the reference;
declared engine surface (SURVEY §2.C extension when registered).

Determinism: distances are the exact e12 contract shared with the
whole ANN family (per-element rounding before the integer sum); both
nearest selections tie → lowest neighbor id; the margin is a plain
integer difference (negative when a wrong-label vector sits closer
than every same-label one — the hardest case, present at every SF).
ORDER BY the unique query id.

Scale design (100 TB): the audited query slice is bounded BY CONTRACT
(|Q| = 10, the q48/q159 convention): one broadcast of the query
vectors streams over the corpus ONCE — |Q| x n distance rows, never
n x n — and every output derives from per-(query, side) min-windows
over that stream. Linear in the corpus with a 10x constant, the same
declared audit price as q159's exact leg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import query, tables

_N_QUERIES = 10  # the q48-family audited query slice (vec_id < 10)
_TOP_K = 10

# the exact e12 squared-distance twins (the pq_ann/ks edge-free
# restatement: one line each, no contract shared beyond the literal)
_D2_SQL = (
    "CAST(list_sum(list_transform(range(1, len({a}) + 1), i -> "
    "CAST(round((CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) * "
    "(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) * 1e12) AS BIGINT)))"
    " AS BIGINT)"
)
_D2_SPARK = (
    "aggregate(zip_with({a}, {b}, (x, y) -> "
    "cast(round((cast(x as double) - cast(y as double)) * "
    "(cast(x as double) - cast(y as double)) * 1e12) as bigint)), "
    "cast(0 as bigint), (acc, v) -> acc + v)"
)

_Q163_ORACLE = (
    "WITH qv AS (SELECT vec_id AS q_id, embedding AS qvec, "
    f"label AS q_label FROM embeddings WHERE vec_id < {_N_QUERIES}), "
    "xd AS (SELECT q_id, q_label, vec_id AS n_id, label AS n_label, "
    + _D2_SQL.format(a="qvec", b="embedding")
    + " AS d2 FROM qv, embeddings WHERE vec_id != q_id), "
    "pos AS (SELECT q_id, n_id AS pos_id, d2 AS pos_d2 FROM xd "
    "WHERE n_label = q_label "
    "QUALIFY row_number() OVER (PARTITION BY q_id "
    "ORDER BY d2 ASC, n_id ASC) = 1), "
    "neg AS (SELECT q_id, n_id AS neg_id, d2 AS neg_d2 FROM xd "
    "WHERE n_label != q_label "
    "QUALIFY row_number() OVER (PARTITION BY q_id "
    "ORDER BY d2 ASC, n_id ASC) = 1), "
    "topk AS (SELECT q_id, "
    "CAST(SUM(CASE WHEN n_label != q_label THEN 1 ELSE 0 END) AS BIGINT) "
    "AS neg_in_topk FROM (SELECT q_id, q_label, n_label FROM xd "
    "QUALIFY row_number() OVER (PARTITION BY q_id "
    f"ORDER BY d2 ASC, n_id ASC) <= {_TOP_K}) GROUP BY q_id) "
    "SELECT CAST(qv.q_id AS BIGINT) AS q_id, "
    "CAST(q_label AS BIGINT) AS q_label, "
    "CAST(pos_id AS BIGINT) AS pos_id, pos_d2, "
    "CAST(neg_id AS BIGINT) AS neg_id, neg_d2, "
    "CAST(neg_d2 - pos_d2 AS BIGINT) AS margin_e12, neg_in_topk "
    "FROM qv JOIN pos ON qv.q_id = pos.q_id "
    "JOIN neg ON qv.q_id = neg.q_id "
    "JOIN topk ON qv.q_id = topk.q_id ORDER BY q_id"
)

_Q163_DESCRIPTION = (
    "Q163: hard-negative mining audit — per audited query vector: the "
    "nearest same-label neighbor, the nearest different-label "
    "neighbor (the contrastive hard negative), the exact e12 integer "
    "margin between them (negative when label noise puts a wrong "
    "label closer than every right one), and the negative count in "
    "the exact top-10. Ties -> lowest id everywhere. Scale-correct: "
    "the 10 query vectors broadcast over ONE corpus pass (|Q| x n, "
    "never n x n) — the declared linear audit price shared with "
    "q159's exact leg."
)


def q163(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tables(spark, sf_dir)["embeddings"]
    qv = emb.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qvec"),
        F.col("label").alias("q_label"),
    )
    xd = (
        emb.crossJoin(F.broadcast(qv))
        .where(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id", "q_label",
            F.col("vec_id").alias("n_id"),
            F.col("label").alias("n_label"),
            F.expr(_D2_SPARK.format(a="qvec", b="embedding")).alias("d2"),
        )
        # three consumers (pos min, neg min, top-10 count) -> cache
        # the |Q| x n distance stream
        .cache()
    )
    w_side = Window.partitionBy("q_id").orderBy(
        F.col("d2").asc(), F.col("n_id").asc())
    pos = (
        xd.where(F.col("n_label") == F.col("q_label"))
        .withColumn("rn", F.row_number().over(w_side))
        .where(F.col("rn") == 1)
        .select("q_id", F.col("n_id").alias("pos_id"),
                F.col("d2").alias("pos_d2"))
    )
    neg = (
        xd.where(F.col("n_label") != F.col("q_label"))
        .withColumn("rn", F.row_number().over(w_side))
        .where(F.col("rn") == 1)
        .select("q_id", F.col("n_id").alias("neg_id"),
                F.col("d2").alias("neg_d2"))
    )
    topk = (
        xd.withColumn("rn", F.row_number().over(w_side))
        .where(F.col("rn") <= _TOP_K)
        .groupBy("q_id")
        .agg(
            F.sum(
                F.when(F.col("n_label") != F.col("q_label"), 1)
                .otherwise(0)
            ).cast("long").alias("neg_in_topk")
        )
    )
    labels = qv.select("q_id", "q_label")
    return (
        labels.join(pos, "q_id").join(neg, "q_id").join(topk, "q_id")
        .select(
            F.col("q_id").cast("long").alias("q_id"),
            F.col("q_label").cast("long").alias("q_label"),
            "pos_id", "pos_d2", "neg_id", "neg_d2",
            (F.col("neg_d2") - F.col("pos_d2")).cast("long")
            .alias("margin_e12"),
            "neg_in_topk",
        )
        .orderBy("q_id")
    )


STAGED = {
    "q163_hard_negative_mining": (q163, _Q163_ORACLE, _Q163_DESCRIPTION,
                                  ("llm", "similarity", "eval")),
}


def register() -> None:
    """r20 registration seam — see joins_ext.register for the pattern."""
    for name, (fn, oracle, desc, tags) in STAGED.items():
        query(name, oracle=oracle, description=desc, tags=tags)(fn)


__all__ = ["q163", "STAGED", "register"]
