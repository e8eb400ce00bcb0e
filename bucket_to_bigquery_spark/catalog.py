"""Testdata catalog: lazy table handles over the driver's parquet tables.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet per table under an sf dir.

``load_tables`` returns plain DataFrames (lazy scans — Catalyst prunes
columns and pushes filters into the parquet reader). ``register_views``
additionally exposes them as temp views for ``spark.sql`` queries.
"""

from __future__ import annotations

import weakref
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from .session import tune

# Per-session cache of the lazy table handles. ``spark.read.parquet``
# costs a driver-side file listing + footer read (~0.1 s per table, ~1 s
# for the 10-table catalog) on EVERY call; every registered query builder
# calls ``tables()``, so across a 191-query bench run the repeated
# footer reads alone were worth minutes of wall time (r16 measurement:
# 1.0-1.4 s per warm load_tables call). The returned DataFrames are lazy,
# immutable plans over read-only testdata — reusing one handle per
# (session, sf_dir, table) changes no result, only skips re-resolving an
# identical scan relation. Keyed weakly by session so a stopped session's
# handles are collectable and a fresh session re-resolves from disk.
_HANDLES: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@lru_cache(maxsize=None)
def _nanos_ts_cols(path: str) -> tuple[str, ...]:
    """Columns stored as parquet timestamp[ns] (Spark can't read those natively)."""
    try:
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
        return tuple(f.name for f in schema if str(f.type) == "timestamp[ns]")
    except Exception:
        return ()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    try:
        per = _HANDLES.setdefault(spark, {})
    except TypeError:  # non-weakref-able session stand-in (tests)
        per = None
    key = (sf_dir, name)
    if per is not None and key in per:
        return per[key]
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    # With nanosAsLong=true (session.py) ns-timestamps arrive as int64 nanos;
    # rebuild microsecond timestamps by truncation (matches DuckDB ns→us).
    for c in _nanos_ts_cols(path):
        if isinstance(df.schema[c].dataType, LongType):
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
    if per is not None:
        per[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    tune(spark)
    return {t: load_table(spark, sf_dir, t) for t in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
