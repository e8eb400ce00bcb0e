"""New r10 surface (fifth batch) — q79: sorted-neighborhood entity
linkage — find near-duplicate part listings by blocking on the name's
head noun, sorting each block, and comparing every row to its next-k
neighbors with edit distance (the classic Hernandez–Stolfo
sorted-neighborhood method; the record-linkage / entity-resolution
primitive that complements the q46/q47 document dedup family with a
string-distance matcher over structured attributes).

Reference parity: n/a — no analytics surface in the reference; declared
engine surface (SURVEY §2.C extension, registered r10).

The operation: block parts by the second name token (``split_part``'s
noun: "red widget" → "widget"), order each block by (p_name,
p_partkey), pair each row with its ``lead(1)`` and ``lead(2)``
neighbors, and keep pairs with ``levenshtein(name_a, name_b) <= 2``
(exact-duplicate listings score 0; near-variants small). The distance
is the BYTE-granular Levenshtein contract (r13 catch, fixed in-window
by stale-slot eviction — GATE_r13.md): DuckDB's levenshtein edits
UTF-8 BYTES while Spark's edits code points, so the builder computes
the distance over the UTF-8 byte view (encode → reinterpret as
ISO-8859-1, one char per byte), which equals DuckDB's semantic for
ARBITRARY names and the plain character distance on ASCII (this
corpus — values unchanged). Pinned three ways on adversarial unicode
in tests/test_levenshtein_convention.py. No float, no rounding.

Scale design (100 TB): blocking IS the scale story — the window
partitions by block key, so the only exchange is one hash shuffle on
the noun and comparisons are 2 per row instead of O(block²) (the
sorted-neighborhood guarantee: duplicates sort adjacently within a
block). A global sliding window would be a single-partition sort — the
scale bug this design avoids (plan-pinned: exactly one hash exchange,
no single-partition Window). Skewed blocks (one dominant noun) would
salt the block key with a name prefix — documented, not needed at this
vocabulary. The lead-k comparison misses duplicates > k apart in sort
order; production runs multi-pass with rotated sort keys — one pass is
the declared surface here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import query, tables

_LEADS = (1, 2)
_MAX_DIST = 2

_Q79_ORACLE = (
    "WITH blocked AS (SELECT p_partkey, p_name, "
    "split_part(p_name, ' ', 2) AS block FROM part), "
    "neigh AS (SELECT block, p_partkey AS part_a, p_name AS name_a, "
    + ", ".join(
        f"lead(p_partkey, {j}) OVER w AS pk{j}, "
        f"lead(p_name, {j}) OVER w AS nm{j}"
        for j in _LEADS
    )
    + " FROM blocked WINDOW w AS (PARTITION BY block "
    "ORDER BY p_name, p_partkey)), "
    "pairs AS ("
    + " UNION ALL ".join(
        f"SELECT block, part_a, name_a, pk{j} AS part_b, nm{j} AS name_b "
        f"FROM neigh WHERE pk{j} IS NOT NULL"
        for j in _LEADS
    )
    + ") "
    "SELECT block, part_a, part_b, name_a, name_b, "
    "CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist, "
    "levenshtein(name_a, name_b) = 0 AS is_exact "
    f"FROM pairs WHERE levenshtein(name_a, name_b) <= {_MAX_DIST} "
    "ORDER BY part_a, part_b"
)

_Q79_DESCRIPTION = (
    "Q79: sorted-neighborhood entity linkage over part names — block on "
    "the head noun, sort blocks by (name, key), compare each row to its "
    "next-2 neighbors with exact Levenshtein, keep dist<=2. One hash "
    "exchange on the block key, 2 comparisons per row instead of "
    "O(block^2), never a single-partition global sort (plan-pinned). "
    "Integer edit distance under the byte-granular contract (UTF-8 "
    "byte view — the DuckDB semantic for arbitrary input, plain "
    "character distance on ASCII)."
)


@query("q79_sorted_neighborhood_linkage", oracle=_Q79_ORACLE,
       description=_Q79_DESCRIPTION, tags=("relational", "linkage"))
def q79(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = tables(spark, sf_dir)["part"].select(
        "p_partkey", "p_name",
        # coalesce to '' for single-token names: DuckDB split_part
        # returns '' where Spark getItem(1) returns NULL — the block
        # key must agree on both engines for any part dimension
        F.coalesce(F.split(F.col("p_name"), " ").getItem(1), F.lit(""))
        .alias("block"),
    )
    w = Window.partitionBy("block").orderBy("p_name", "p_partkey")
    neigh = parts.select(
        "block",
        F.col("p_partkey").alias("part_a"),
        F.col("p_name").alias("name_a"),
        *[c for j in _LEADS for c in (
            F.lead("p_partkey", j).over(w).alias(f"pk{j}"),
            F.lead("p_name", j).over(w).alias(f"nm{j}"),
        )],
    )
    # one explode instead of a per-lead UNION: union branches replay the
    # whole window lineage (2 exchanges + 2 sorts); this keeps ONE pass
    pairs = (
        neigh.select(
            "block", "part_a", "name_a",
            F.explode(F.array(*[
                F.struct(F.col(f"pk{j}").alias("part_b"),
                         F.col(f"nm{j}").alias("name_b"))
                for j in _LEADS
            ])).alias("nb"),
        )
        .select("block", "part_a", "name_a", "nb.part_b", "nb.name_b")
        .where(F.col("part_b").isNotNull())
    )
    # BYTE-granular Levenshtein (the DuckDB semantic) — see the module
    # docstring and tests/test_levenshtein_convention.py
    bv = "decode(encode({c}, 'utf-8'), 'iso-8859-1')"
    dist = F.expr(
        f"levenshtein({bv.format(c='name_a')}, {bv.format(c='name_b')})")
    return (
        pairs.withColumn("dist", dist.cast("long"))
        .where(F.col("dist") <= _MAX_DIST)
        .select(
            "block", "part_a", "part_b", "name_a", "name_b", "dist",
            (F.col("dist") == 0).alias("is_exact"),
        )
        .orderBy("part_a", "part_b")
    )


__all__ = ["q79"]
