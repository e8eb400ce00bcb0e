"""Custom operators the reference surface / north star needs but Spark lacks
as single built-ins. All are compositions of DataFrame ops (shuffle-aware,
codegen-friendly); none use row-at-a-time Python UDFs.
"""

from .asof_join import asof_join
from .range_join import range_join_bucketed

__all__ = ["asof_join", "range_join_bucketed"]
