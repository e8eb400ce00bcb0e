"""Declared query surface. Importing this package registers every query
module into ``registry.REGISTRY``.
"""

from __future__ import annotations

from . import relational  # noqa: F401
from .registry import REGISTRY, Query

_MODULES_LOADED = ["relational"]

for _mod in ("scalar", "extensions", "streaming_queries"):
    try:  # modules land incrementally during the build
        __import__(f"{__name__}.{_mod}")
        _MODULES_LOADED.append(_mod)
    except ImportError:
        pass


def all_queries() -> dict[str, Query]:
    return dict(REGISTRY)
