"""Skew-resistant join via key salting (SURVEY §4 physical-execution notes).

When one join key dominates (a hot user, a null-heavy foreign key), a
plain shuffle join puts the whole hot key in ONE task — the straggler that
defines job wall-clock at 100 TB. AQE's skew-join split
(``spark.sql.adaptive.skewJoin``) handles sort-merge cases at runtime;
salting is the plan-level tool when AQE can't help (e.g. aggregations
after the join keep the skew, or the skewed side feeds a broadcast-unable
join).

``salted_join`` splits every left-side key into ``salt`` sub-keys and
replicates each right-side row ``salt`` times with matching sub-keys, so
the hot key's rows spread across ``salt`` tasks. Replication multiplies
the right side — use it when the right side is much smaller than the left
(but too big / ineligible to broadcast).

Semantics are identical to ``left.join(right, on, how)`` for ``inner`` and
``left`` joins; verified against the plain join in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__b2bqs_salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Join with salted keys: left rows get a random-but-deterministic salt
    (hash of all left columns mod ``salt``), right rows are replicated once
    per salt value. Output columns match ``left.join(right, on, how)``."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    l = left.withColumn(
        _SALT, F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(salt))
    )
    r = right.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return l.join(r, [*on, _SALT], how).drop(_SALT)
