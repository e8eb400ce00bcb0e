"""Scalar-function library.

``local_time_col`` is the canonical expression for the reference's derived
``local_time`` (readme.md:46 / SURVEY §2.B B6): a naive-UTC timestamp plus a
fractional-hour ``utc_offset`` becomes local civil time by adding
``round(utc_offset * 60)`` minutes — minute-rounded exactly like the view
SQL the reference prescribes (its ``TIME_ADD(..., INTERVAL CAST(ROUND(
utc_offset*60) AS INT64) MINUTE)``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def local_time_col(ts: Column, utc_offset_hours: Column) -> Column:
    """timestamp + round(offset_hours*60) minutes, microsecond-preserving."""
    minutes = F.round(utc_offset_hours * 60).cast("int")
    return F.to_timestamp(
        F.timestamp_micros(F.unix_micros(ts) + minutes.cast("long") * 60_000_000)
    )


__all__ = ["local_time_col"]
