"""STAGED r12 surface (built r10, NOT registered — rides r12's free
slots per GATE_r10.md's round-11/12 plan) — q89b: MinHash-estimated
source content overlap — the ESCALATION PATH q89's design note
promises: when exact pairwise shingle overlap gets hot (shared-
vocabulary corpora make the per-shingle pair fan-out approach
|sources|² on every shingle — q89 measured 3.43× wall at 10× data),
replace the shingle-level pair join with per-source MinHash signatures
whose pairwise comparison costs |sources|²·k, INDEPENDENT of corpus
size. The q48/q65 exact-vs-sketch pairing applied to set overlap: q89
stays the exact gate, this is the scale instrument.

Reference parity: n/a — no analytics surface in the reference; declared
engine surface (SURVEY §2.C extension when registered). Shingling is
the q47-family contract (``shingles(tokens, 5)`` / ``_SH5_SQL``).

    sig_i(source) = min over shingles sh of h_i(sh),   i = 1..k (k=64)
    Ĵ(a,b)        = |{i : sig_i(a) = sig_i(b)}| / k

h_i is the house md5-integer idiom salted per component
(``md5('mh<i>:' || sh)`` first-8-hex as BIGINT — deterministic, no RNG
state; Spark spells the same integer with ``conv()``, the splits.py
precedent). MinHash theory: P[sig_i(a) = sig_i(b)] = J(a,b) exactly,
so the match fraction is an unbiased estimate with stderr
√(J(1−J)/k) ≤ 0.0625 at k = 64. The estimate is DETERMINISTIC (fixed
salts), so the full output — including n_match — value-oracles
exactly; only its RELATION to the true J is statistical, and that is
what the pytest band pins (the q19/q65 tolerance-made-hashable
pattern, here pinned against the exact q89-side recomputation).

Scale design (100 TB): min is idempotent, so signatures need NO
distinct — the corpus is read once, each document computes its k
component-mins ROW-LOCALLY (nested higher-order transform over its own
shingle array; nothing materializes the shingle stream), and ONE
map-side-combined aggregation reduces to the (source, component) frame
— |sources|·k rows, the only shuffle. The pair comparison is a join of
two |sources|·k frames on the component index: |sources|²·k work, zero
dependence on corpus size. This beats q89's exact join the moment the
shared-shingle mass grows — exactly the regime q89 flags. Estimated-
hot pairs then re-run the exact form on demand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import shingles, tokens
from .llm_queries import _SH5_SQL, _TOKS_SQL
from .registry import query, tables

_K = 64  # signature components; stderr <= 1/(2*sqrt(k)) = 0.0625

_EST_FMT = (
    "CAST(round((CAST({m} AS DOUBLE) / CAST({k} AS DOUBLE)) * 1e6) "
    "AS BIGINT)"
)

_Q89B_ORACLE = (
    f"WITH tok AS (SELECT source, {_TOKS_SQL} AS t FROM documents), "
    f"sh AS (SELECT source, unnest({_SH5_SQL}) AS sh FROM tok), "
    f"comp AS (SELECT source, i, min(CAST(('0x' || substr(md5('mh' || "
    "CAST(i AS VARCHAR) || ':' || sh), 1, 8)) AS BIGINT)) AS sig "
    f"FROM sh CROSS JOIN range({_K}) r(i) GROUP BY source, i), "
    "pairs AS (SELECT a.source AS source_a, b.source AS source_b, "
    "CAST(count(CASE WHEN a.sig = b.sig THEN 1 END) AS BIGINT) AS n_match "
    "FROM comp a JOIN comp b ON a.i = b.i AND a.source < b.source "
    "GROUP BY a.source, b.source) "
    f"SELECT source_a, source_b, n_match, CAST({_K} AS BIGINT) AS k, "
    + _EST_FMT.format(m="n_match", k=_K)
    + " AS est_jaccard_e6 FROM pairs ORDER BY source_a, source_b"
)

_Q89B_DESCRIPTION = (
    "Q89b: MinHash-estimated source overlap (k=64, deterministic salted "
    "md5 components — the q89 escalation path): signatures computed "
    "row-locally per document (min is idempotent - no distinct, no "
    "shingle-stream materialization), ONE map-side-combined shuffle to "
    "the |sources|*k component frame, pair comparison |sources|^2*k - "
    "independent of corpus size. Deterministic, so fully value-oracled; "
    "the estimate-vs-exact band is pinned in pytest (q19/q65 pattern)."
)


def q89b(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables(spark, sf_dir)["documents"]
    # pre-project the shingle array ONCE per row: Spark performs no
    # common-subexpression elimination inside higher-order-function
    # lambdas, so inlining it under the k-component transform would
    # re-tokenize every document 64 times (~5× wall, measured)
    shingled = docs.select(
        "source", shingles(tokens(F.col("text")), 5).alias("shs")
    )
    # per-document component mins, row-local: for each salt i, the min
    # of the salted md5 integer over this document's shingles
    mins = F.transform(
        F.sequence(F.lit(0), F.lit(_K - 1)),
        lambda i: F.array_min(F.transform(
            F.col("shs"),
            lambda sh: F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("mh"), i.cast("string"),
                                   F.lit(":"), sh)), 1, 8
                ), 16, 10,
            ).cast("long"),
        )),
    )
    comp = (
        shingled.select("source", F.posexplode(mins).alias("i", "doc_min"))
        # shingle-less documents (< 5 tokens, NULL text) yield NULL
        # mins; drop them so a source with ONLY such docs vanishes from
        # the signature frame — matching the oracle, whose unnest([])
        # emits no rows for them at all
        .where(F.col("doc_min").isNotNull())
        .groupBy("source", "i")
        .agg(F.min("doc_min").alias("sig"))
    )
    a = comp.select(F.col("source").alias("source_a"),
                    F.col("i").alias("ia"), F.col("sig").alias("sig_a"))
    b = comp.select(F.col("source").alias("source_b"),
                    F.col("i").alias("ib"), F.col("sig").alias("sig_b"))
    pairs = (
        a.join(b, on=[a.ia == b.ib, a.source_a < b.source_b])
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.when(F.col("sig_a") == F.col("sig_b"), 1))
            .cast("long").alias("n_match")
        )
    )
    return pairs.select(
        "source_a", "source_b", "n_match",
        F.lit(_K).cast("long").alias("k"),
        F.expr(_EST_FMT.format(m="n_match", k=_K)).alias("est_jaccard_e6"),
    ).orderBy("source_a", "source_b")


STAGED = {
    "q89b_source_overlap_minhash": (q89b, _Q89B_ORACLE, _Q89B_DESCRIPTION,
                                    ("llm", "governance")),
}


def register() -> None:
    """r12 registration seam — see joins_ext.register for the pattern."""
    for name, (fn, oracle, desc, tags) in STAGED.items():
        query(name, oracle=oracle, description=desc, tags=tags)(fn)


__all__ = ["q89b", "STAGED", "register"]
