"""Declared query surface. Importing this package registers every query
module into ``registry.REGISTRY``.

Modules are imported eagerly — an ImportError inside any of them must
surface loudly, not silently shrink the registry (and with it the
correctness/coverage gates).
"""

from __future__ import annotations

from . import relational  # noqa: F401
from . import scalar  # noqa: F401
from . import ingest_queries  # noqa: F401
from . import streaming_queries  # noqa: F401
from . import udf_queries  # noqa: F401
from . import llm_queries  # noqa: F401
from . import skew_queries  # noqa: F401
from . import pipeline_queries  # noqa: F401
from . import formats  # noqa: F401
from .registry import REGISTRY, Query


def all_queries() -> dict[str, Query]:
    return dict(REGISTRY)
