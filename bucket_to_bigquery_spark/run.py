"""CLI runner — the reference's local entry point, Spark-native.

``index_node.js`` wraps the Cloud Function for local runs with two seams:
``DRY_RUN`` (print planned load jobs instead of launching, index.js:79-80)
and ``context.mockEvents`` (inject file URIs, bypassing PubSub,
index.js:49-50). Same surface here::

    python -m bucket_to_bigquery_spark.run --manifest m.json --warehouse /data/wh
    python -m bucket_to_bigquery_spark.run --manifest m.json --warehouse /data/wh \
        --dry-run                         # plan only, JSON to stdout
    python -m bucket_to_bigquery_spark.run --manifest m.json --warehouse /data/wh \
        --mock-files /drop/a.csv /drop/b.csv   # event-driven candidates

``DRY_RUN=1`` in the environment is honored like the reference's env seam.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from .ingest import BatchLoader, parse_manifest
from .session import get_spark


def _report_json(r) -> dict:
    return {
        "table": r.table,
        "jobId": r.job_id,
        "filesSeen": len(r.files_seen),
        "filesAlreadyImported": len(r.files_already_imported),
        "filesToLoad": r.files_loaded,
        "rowsLoaded": r.rows_loaded,
        "schema": [{"name": f.name, "type": f.type} for f in r.schema_fields],
        "expandedFields": [f.name for f in r.expanded_fields],
        "timePartitioningField": r.partition_field,
    }


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="bucket_to_bigquery_spark.run")
    ap.add_argument("--manifest", required=True, help="manifest JSON file/string")
    ap.add_argument("--warehouse", required=True, help="warehouse root directory")
    ap.add_argument("--dry-run", action="store_true",
                    help="plan loads and print them as JSON; write nothing")
    ap.add_argument("--mock-files", nargs="*", default=None,
                    help="candidate file URIs (bypasses event decode); "
                         "omit to glob the manifest sources")
    ap.add_argument("--mock-events", default=None,
                    help="JSON file or literal: a list of PubSub push "
                         "envelopes (the reference's context.mockEvents "
                         "seam) — decoded via OBJECT_FINALIZE filter, "
                         "base64 data parse, kind filter, selfLink dedup")
    ap.add_argument("--uri-format", default=None,
                    help="URI template for decoded events "
                         "(default gs://{bucket}/{name}); local test seam")
    args = ap.parse_args(argv)

    dry = args.dry_run or bool(os.environ.get("DRY_RUN"))
    manifest = parse_manifest(args.manifest)
    spark = get_spark("b2bqs-run")
    loader = BatchLoader(spark, args.warehouse)
    candidates = args.mock_files
    if args.mock_events is not None:
        from .ingest.events import GS_URI_FORMAT, events_to_candidates

        raw = args.mock_events
        if os.path.exists(raw):
            with open(raw) as fh:
                raw = fh.read()
        candidates = events_to_candidates(
            spark, json.loads(raw), uri_format=args.uri_format or GS_URI_FORMAT
        )
    reports = loader.run(manifest, candidate_files=candidates, dry_run=dry)
    print(json.dumps({"dryRun": dry, "tasks": [_report_json(r) for r in reports]},
                     indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
