"""Ingest core — the reference's actual surface, re-expressed Spark-first.

The reference (``/root/reference``) is a Cloud Function that loads CSV files
from GCS into day-partitioned BigQuery tables, driven by a JSON manifest,
with positional auto-expanding schemas and an ``<table>_imported`` audit
table for idempotency. This package reproduces those semantics natively:

- :mod:`.manifest` — manifest parsing (readme.md:53-86).
- :mod:`.schema_registry` — positional prefix compatibility
  (``sameOrSuperSet``, BucketToBigQuery.js:12-25), float-typed schema
  expansion (:286-321), the timestamp-column heuristic (:27-30), and CSV
  header sniffing (:124-140).
- :mod:`.loader` — the batch load pipeline (:248-397): sniff → schema
  resolve/expand → ``_imported`` anti-join → staged batch write →
  idempotent publish → audit append. The audit write happens AFTER a
  successful publish (fixing the reference's mark-after-launch hazard,
  index.js:88-89), and the publish itself is retry-idempotent: each batch
  stages under a deterministic key and replaces its own files on retry,
  so a crash anywhere in the write→publish→audit window re-converges to
  exactly-once output instead of appending duplicates.
"""

from .manifest import Field, Manifest, Task, parse_manifest
from .schema_registry import (
    build_struct,
    expand_schema,
    infer_partition_field,
    likely_timestamp,
    same_or_super_set,
    sniff_csv_headers,
)
from .events import events_to_candidates, finalize_object_uris
from .loader import BatchLoader, LoadReport

__all__ = [
    "Field",
    "Manifest",
    "Task",
    "parse_manifest",
    "same_or_super_set",
    "likely_timestamp",
    "sniff_csv_headers",
    "build_struct",
    "expand_schema",
    "infer_partition_field",
    "BatchLoader",
    "LoadReport",
]
