"""New r10 surface — q71: overlapping document chunking (the RAG /
training-context preprocessing primitive: fixed-size character windows
with stride overlap, stable chunk coordinates).

Reference parity: n/a — the 589-LoC loader has no document surface;
this is part of the declared LLM-pipeline capability (SURVEY §2.C
extension, registered r10), the front half of every
chunk-embed-index pipeline (q48's similarity search consumes exactly
such chunks at production scale).

The operation: each document yields windows of ``_CHUNK`` characters
starting every ``_STRIDE`` characters (overlap = CHUNK − STRIDE), with
``(doc_id, chunk_idx, chunk_start)`` coordinates, the chunk text, its
exact length, and an ``is_last`` flag. Offset generation is a JVM-side
``sequence``/``explode`` (DuckDB mirrors with ``range``/``unnest``) —
no UDF, no Python. Empty documents yield zero chunks in both engines.

Scale design (100 TB): embarrassingly parallel — ZERO data shuffles;
the only exchange in the plan is the presentation sort's range
partitioning (pinned in tests/test_plan_shapes.py). Row amplification
is bounded by construction at ``ceil(n_chars / STRIDE)`` chunks per
document (×1.25 bytes at the default 500/400 operating point), so
``spark.sql.files.maxPartitionBytes`` sizing carries over with that
constant factor. Chunk coordinates are offsets, not content hashes —
a downstream exact/near-dup pass (q46/q47) composes over
``chunk_text`` unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query, tables

_CHUNK = 500  # window size, characters
_STRIDE = 400  # window start spacing (overlap = _CHUNK - _STRIDE)

_Q71_ORACLE = (
    "SELECT d.doc_id, "
    f"CAST(u.off // {_STRIDE} AS BIGINT) AS chunk_idx, "
    "CAST(u.off AS BIGINT) AS chunk_start, "
    f"CAST(length(substr(d.text, CAST(u.off AS BIGINT) + 1, {_CHUNK})) "
    "AS BIGINT) AS chunk_chars, "
    f"substr(d.text, CAST(u.off AS BIGINT) + 1, {_CHUNK}) AS chunk_text, "
    f"u.off + {_STRIDE} >= length(d.text) AS is_last "
    "FROM documents d, "
    f"LATERAL unnest(range(0, CAST(length(d.text) AS BIGINT), {_STRIDE})) "
    "AS u(off) ORDER BY d.doc_id, chunk_idx"
)

_Q71_DESCRIPTION = (
    "Q71: overlapping document chunking — 500-char windows every 400 "
    "chars (100-char overlap), with stable (doc_id, chunk_idx, "
    "chunk_start) coordinates, exact chunk length, and an is_last flag. "
    "Offsets come from a JVM-side sequence/explode (no UDF); zero data "
    "shuffles (plan-pinned — the only exchange is the presentation "
    "sort). Row amplification bounded at ceil(n_chars/stride) per doc."
)


@query("q71_document_chunking", oracle=_Q71_ORACLE,
       description=_Q71_DESCRIPTION, tags=("llm",))
def q71(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        tables(spark, sf_dir)["documents"]
        .select("doc_id", "text", F.length("text").alias("len"))
    )
    # sequence() needs stop >= start; greatest() guards len=0 (the [0]
    # offset it emits is dropped by the off < len filter, matching
    # DuckDB's empty range()).
    chunks = d.select(
        "doc_id", "text", "len",
        F.explode(
            F.sequence(
                F.lit(0), F.greatest(F.col("len") - 1, F.lit(0)),
                F.lit(_STRIDE),
            )
        ).alias("off"),
    ).where(F.col("off") < F.col("len"))
    chunk_text = F.col("text").substr(F.col("off") + 1, F.lit(_CHUNK))
    return chunks.select(
        "doc_id",
        F.floor(F.col("off") / _STRIDE).cast("long").alias("chunk_idx"),
        F.col("off").cast("long").alias("chunk_start"),
        F.length(chunk_text).cast("long").alias("chunk_chars"),
        chunk_text.alias("chunk_text"),
        (F.col("off") + _STRIDE >= F.col("len")).alias("is_last"),
    ).orderBy("doc_id", "chunk_idx")


__all__ = ["q71"]
