"""STAGED r20 surface (built late r14, NOT registered — GATE_r14.md's
round-20 note budgets the slot) — q169: partition-layout advisor —
the file-sizing twin of the q04e compactor and the q60 Z-order
layout: per source, the exact byte mass (text octets + a fixed
per-row envelope), the recommended file count for a 128 MiB target
(ceiling division, minimum one), the resulting rows-per-file, and
the small-files flag (mass below half a target file) that tells the
compactor this partition should merge INTO a neighbor instead of
writing its own files. The planning report an engine operator reads
before a rewrite — q04e then executes it.

Reference parity: the reference batches loads "to minimise the
number of load jobs" (readme.md:19) but never sizes outputs; this
is the sizing analytics that decision needs — declared engine
surface (SURVEY §2.C extension when registered).

Determinism: byte masses are exact integer sums of octet_length
(byte semantics identical in both engines) plus a constant per-row
envelope; file counts are ceiling divisions; rows_per_file is a
ceiling division by the file count. All integers, ORDER BY the
unique source key.

Scale design (100 TB): ONE map-side-combined aggregation over one
scan to the |sources|-row frame; every recommendation derives from
that frame with scalar arithmetic. This is exactly the statistics
pass a table service (compaction scheduler) runs per partition —
cheap enough to run after every load.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query, tables

_TARGET_BYTES = 128 * 1024 * 1024  # the classic HDFS/parquet target file
_ROW_ENVELOPE = 16                 # fixed per-row metadata allowance


_Q169_ORACLE = (
    "WITH mass AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_rows, "
    # DuckDB: strlen = UTF-8 BYTE length of a VARCHAR (octet_length
    # binds only to BLOB there); Spark's octet_length is the same
    # byte semantic — the q79/q140 byte-view convention
    f"CAST(SUM(strlen(text) + {_ROW_ENVELOPE}) AS BIGINT) "
    "AS est_bytes FROM documents GROUP BY source) "
    "SELECT source, n_rows, est_bytes, "
    f"CAST((est_bytes + {_TARGET_BYTES - 1}) // {_TARGET_BYTES} "
    "AS BIGINT) AS n_files, "
    "CAST((n_rows + "
    f"(est_bytes + {_TARGET_BYTES - 1}) // {_TARGET_BYTES} - 1) // "
    f"((est_bytes + {_TARGET_BYTES - 1}) // {_TARGET_BYTES}) "
    "AS BIGINT) AS rows_per_file, "
    f"CAST(est_bytes * 2 < {_TARGET_BYTES} AS BOOLEAN) AS is_small "
    "FROM mass ORDER BY source"
)

_Q169_DESCRIPTION = (
    "Q169: partition-layout advisor — per source: exact byte mass "
    "(text octets + a fixed per-row envelope), ceiling-div file "
    "count for a 128 MiB target (min one), ceiling-div rows per "
    "file, and the small-files merge flag (mass < half a target "
    "file) — the sizing report the q04e compactor executes. "
    "Scale-correct: one map-side combine over one scan to the "
    "|sources| frame; scalar arithmetic after."
)


def q169(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables(spark, sf_dir)["documents"]
    mass = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.octet_length("text") + F.lit(_ROW_ENVELOPE))
        .cast("long").alias("est_bytes"),
    )
    n_files = f"(est_bytes + {_TARGET_BYTES - 1}) div {_TARGET_BYTES}"
    return (
        mass.select(
            "source", "n_rows", "est_bytes",
            F.expr(f"cast({n_files} as bigint)").alias("n_files"),
            F.expr(
                f"cast((n_rows + {n_files} - 1) div ({n_files}) as bigint)"
            ).alias("rows_per_file"),
            F.expr(f"est_bytes * 2 < {_TARGET_BYTES}").alias("is_small"),
        )
        .orderBy("source")
    )


STAGED = {
    "q169_layout_advisor": (q169, _Q169_ORACLE, _Q169_DESCRIPTION,
                            ("engine", "maintenance")),
}


def register() -> None:
    """r20 registration seam — see joins_ext.register for the pattern."""
    for name, (fn, oracle, desc, tags) in STAGED.items():
        query(name, oracle=oracle, description=desc, tags=tags)(fn)


__all__ = ["q169", "STAGED", "register"]
