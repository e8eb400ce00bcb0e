"""Manifest parsing — the reference's JSON config format (readme.md:53-86).

A manifest names a project, a notification topic (not needed here — Spark's
file-source discovery replaces PubSub, SURVEY §2.A A5/A17), and ``tasks``,
each mapping source glob patterns to one destination table with optional
typed ``fields`` and an optional ``timePartitioningField``.

Partition-field tri-state (BucketToBigQuery.js:314-319):
- key present with a name  → partition on that field;
- key absent (undefined)   → infer via the timestamp heuristic over the
  first 5 fields;
- key present and ``null`` → partitioning disabled.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field as dc_field
from typing import Any

_UNSET = object()  # manifest key absent (JS `undefined`) vs explicit null


@dataclass(frozen=True)
class Field:
    """A typed column from a manifest ``fields`` entry (readme.md:68-81)."""

    name: str
    type: str  # reference types: timestamp | float | string (+ int/date/bool here)


@dataclass
class Task:
    """One source→table load task (readme.md:62-83)."""

    sources: list[str]
    dataset: str
    table: str
    fields: list[Field] = dc_field(default_factory=list)
    # tri-state; use `partition_field_given` to distinguish absent vs null
    time_partitioning_field: str | None = None
    partition_field_given: bool = False
    location: str = "US"  # BucketToBigQuery.js:333 default

    @property
    def qualified_table(self) -> str:
        return f"{self.dataset}.{self.table}"


@dataclass
class Manifest:
    project: str
    tasks: list[Task]
    job_id_prefix: str = ""
    bucket_notification_topic: str = ""
    # `authentication` (readme.md:57-59) is cloud-credential plumbing with no
    # Spark analog — preserved for round-tripping, never interpreted.
    authentication: dict[str, Any] = dc_field(default_factory=dict)


def parse_task(raw: dict[str, Any]) -> Task:
    tpf = raw.get("timePartitioningField", _UNSET)
    return Task(
        sources=list(raw.get("sources", [])),
        dataset=raw.get("dataset", ""),
        table=raw["table"],
        fields=[Field(f["name"], str(f.get("type", "string")).lower())
                for f in raw.get("fields", []) or []],
        time_partitioning_field=None if tpf in (_UNSET, None) else str(tpf),
        partition_field_given=tpf is not _UNSET,
        location=raw.get("location", "US"),
    )


def parse_manifest(src: str | dict[str, Any]) -> Manifest:
    """Parse a manifest from a JSON string, a file path, or a dict."""
    if isinstance(src, dict):
        raw = src
    elif src.lstrip().startswith("{"):
        raw = json.loads(src)
    else:
        with open(src) as fh:
            raw = json.load(fh)
    return Manifest(
        project=raw.get("project", ""),
        tasks=[parse_task(t) for t in raw.get("tasks", [])],
        job_id_prefix=raw.get("jobIdPrefix", ""),
        bucket_notification_topic=raw.get("bucketNotificationTopic", ""),
        authentication=raw.get("authentication", {}) or {},
    )
