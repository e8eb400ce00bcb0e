"""As-of join (backward): for each left row, the latest right row with
``right.ts <= left.ts`` per key.

Implemented as union + window (SURVEY §2.C Q15 recipe): ONE shuffle on the
key — no range join, no nested loop — so it scales like a groupBy. This is
the classic event-stream enrichment pattern (e.g. "state as of this event").

Requires: right side unique per (key, ts) for deterministic results (ties
among right rows at identical (key, ts) would be resolved arbitrarily).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join; right ``value_cols`` arrive as ``<col><suffix>``,
    NULL when no right row precedes the left row.
    """
    # All right values ride in ONE struct that is non-null exactly on right
    # rows — so last(ignorenulls) picks the latest matching RIGHT ROW, and a
    # legitimately-NULL value column inside it is preserved (not skipped in
    # favor of an older row, which bare last(value, ignorenulls) would do).
    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__is_right"),
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("__rvals"),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__is_right"),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    # Within a key, order by ts; at equal ts the right row sorts FIRST so the
    # match is inclusive (right.ts <= left.ts).
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__rvals", F.last("__rvals", ignorenulls=True).over(w))

    out = u.where(F.col("__is_right") == 0)
    for c in value_cols:
        out = out.withColumn(c + suffix, F.col("__rvals").getField(c))
    return out.drop("__ts", "__is_right", "__rvals")
