"""New r10 surface — q69: exact per-group mean-centering of embeddings.

Reference parity: n/a; the vector-pipeline normalization step (center
embeddings per class/domain before similarity work — the standard
pre-pass for ANN index builds and embedding drift analysis).

Exactness contract: floating-point mean-centering is order-dependent
and can never hash-match across engines. So the centering is EXACT
integer arithmetic end to end: components scale to ints
(``round(x·1e6)``, the q62 contract; both engines round half-away),
and the centered output is the integer ``cᵢ·n − Sᵢ`` — the centered
value times the group size, which avoids division entirely (a consumer
divides by n·1e6 when it wants floats back). Every value is exact
int64; the whole result is value-oracled.

Scale design (100 TB): two passes over the vectors, one shuffle of
DIMENSION PARTIALS only. Pass 1 explodes to (label, dim, c) and
map-side-combines to per-(label, dim) sums — the shuffle carries
|labels|·64 partial rows per task, never vectors. The k×64 sum table
re-aggregates to k rows and BROADCASTS to pass 2, which centers each
vector row-locally (zip_with over 64 ints — interpreted higher-order
lambda, acceptable at O(64)/row; the q48-style Arrow pass takes over
when per-row work grows into real vector math). No vector ever
shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query, tables

_SCALE = 1_000_000
_DIM = 64

_Q69_ORACLE = (
    "WITH scaled AS (SELECT vec_id, label, "
    f"list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {_SCALE}) "
    "AS BIGINT)) AS c FROM embeddings), "
    f"dims AS (SELECT label, i AS dim, CAST(sum(c[i]) AS BIGINT) AS s "
    f"FROM scaled, range(1, {_DIM} + 1) t(i) GROUP BY label, i), "
    "sums AS (SELECT label, list(s ORDER BY dim) AS sv FROM dims GROUP BY label), "
    "counts AS (SELECT label, CAST(count(*) AS BIGINT) AS n_group "
    "FROM scaled GROUP BY label) "
    "SELECT sc.vec_id, sc.label, counts.n_group, "
    f"array_to_string(list_transform(range(1, {_DIM} + 1), "
    "i -> sc.c[i] * counts.n_group - sums.sv[i]), ',') AS centered "
    "FROM scaled sc JOIN sums USING (label) JOIN counts USING (label) "
    "ORDER BY vec_id"
)

_Q69_DESCRIPTION = (
    "Q69: exact per-label mean-centering of embeddings — components "
    "scale to ints (round(x*1e6)), per-(label, dim) sums shuffle as "
    "map-side-combined partials (|labels|*64 rows per task, never "
    "vectors), the k-row sum table broadcasts back, and each vector "
    "centers row-locally as the exact integer c_i*n - S_i (division-free "
    "— the consumer divides by n*1e6 for floats). Fully value-oracled "
    "where float centering never could be."
)


@query("q69_group_centered_embeddings", oracle=_Q69_ORACLE,
       description=_Q69_DESCRIPTION, tags=("llm",))
def q69(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tables(spark, sf_dir)["embeddings"]
    scaled = emb.select(
        "vec_id",
        "label",
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * _SCALE).cast("long"),
        ).alias("c"),
    )
    dims = scaled.select("label", F.posexplode("c").alias("dim", "v"))
    sums = (
        dims.groupBy("label", "dim")
        .agg(F.sum("v").alias("s"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "s"))),
                lambda e: e["s"],
            ).alias("sv")
        )
    )
    counts = scaled.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_group")
    )
    stats = F.broadcast(sums.join(counts, "label"))
    return (
        scaled.join(stats, "label")
        .select(
            "vec_id",
            "label",
            "n_group",
            F.concat_ws(
                ",",
                F.transform(
                    F.zip_with(
                        "c", "sv", lambda a, b: a * F.col("n_group") - b
                    ),
                    lambda y: y.cast("string"),
                ),
            ).alias("centered"),
        )
        .orderBy("vec_id")
    )


__all__ = ["q69"]
