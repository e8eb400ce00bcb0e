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

``setup`` validates an installation before any load runs — the analog of
the reference's ``setupBucket``/``ensureNotification`` provisioning step
(BucketToBigQuery.js:94-97, 66-78; its PubSub wiring has no Spark
counterpart, so validation here means: manifest well-formed, every source
pattern's base directory reachable, warehouse writable, and the resolved
schema/partition plan printed per task)::

    python -m bucket_to_bigquery_spark.run setup --manifest m.json \
        --warehouse /data/wh        # exit 0 iff everything checks out

``compact`` rewrites each task's table so every DAY partition holds one
file — the periodic maintenance pass that counters append-per-batch
small-file accumulation (the readme's partition-pruning claim,
readme.md:38-41, assumes well-sized partitions)::

    python -m bucket_to_bigquery_spark.run compact --manifest m.json \
        --warehouse /data/wh
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


def setup_main(argv: list[str]) -> int:
    """Validate manifest, source reachability, warehouse writability, and
    print the resolved schema/partition plan (no data written, nothing
    audited). Exit 0 iff every check passes.

    Paths may be schemed URIs — e.g. against an object store (connector
    jar + ``spark.hadoop.*`` credentials on the session; README
    "Remote object-store quickstart")::

        python -m bucket_to_bigquery_spark.run setup \\
            --manifest gs://cfg-bucket/manifest.json \\
            --warehouse gs://my-warehouse/wh

    Every check below routes through the per-URI FS seam (ingest/fs.py),
    so the probe write, glob, and header sniff exercise the exact I/O the
    load would."""
    from .ingest.fs import fs_for, glob_base
    from .ingest.schema_registry import TYPE_MAP, SchemaCompatError

    ap = argparse.ArgumentParser(prog="bucket_to_bigquery_spark.run setup")
    ap.add_argument("--manifest", required=True, help="manifest JSON file/string")
    ap.add_argument("--warehouse", required=True, help="warehouse root")
    args = ap.parse_args(argv)

    try:
        manifest = parse_manifest(args.manifest)
    except (OSError, ValueError, KeyError) as e:
        print(json.dumps({"ok": False,
                          "manifest": {"ok": False, "error": str(e)}}, indent=2))
        return 1

    spark = get_spark("b2bqs-setup")
    loader = BatchLoader(spark, args.warehouse)

    # warehouse writability: write/read-back/delete a probe object
    wh = {"path": args.warehouse, "ok": True}
    probe = f"{args.warehouse.rstrip('/')}/.b2bqs_setup_probe"
    try:
        fs = fs_for(spark, args.warehouse)
        fs.write_bytes(probe, b"ok")
        wh["ok"] = fs.read_bytes(probe) == b"ok"
        fs.delete(probe)
    except Exception as e:  # noqa: BLE001 — any FS failure is the finding
        wh.update(ok=False, error=f"{type(e).__name__}: {e}")

    tasks_out, ok = [], wh["ok"]
    if not manifest.tasks:
        ok = False
    for task in manifest.tasks:
        problems: list[str] = []
        if not task.table:
            problems.append("task has no table")
        if not task.dataset:
            problems.append("task has no dataset")
        for f in task.fields:
            if f.type.lower() not in TYPE_MAP:
                problems.append(
                    f"field {f.name!r}: unknown type {f.type!r} degrades to string"
                )
        for pattern in task.sources:
            base = glob_base(pattern)
            try:
                if not fs_for(spark, base).exists(base):
                    problems.append(f"source base not reachable: {base}")
            except Exception as e:  # noqa: BLE001
                problems.append(f"source {pattern}: {type(e).__name__}: {e}")
        files = [] if problems else loader.resolve_files(task)
        plan = {}
        if files:
            headers = loader._widest_headers(files)
            if headers is None:
                problems.append("no parseable file among matches")
            else:
                try:
                    fields, _added, pfield = loader._resolve_schema(task, headers)
                    plan = {
                        "schema": [{"name": f.name, "type": f.type}
                                   for f in fields],
                        "timePartitioningField": pfield,
                    }
                except SchemaCompatError as e:
                    problems.append(str(e))
        tasks_out.append({
            "table": task.qualified_table,
            "sources": task.sources,
            "filesMatched": len(files),
            **plan,
            "problems": problems,
            "ok": not problems,
        })
        ok = ok and not problems
    print(json.dumps(
        {"ok": ok, "warehouse": wh, "tasks": tasks_out}, indent=2
    ))
    return 0 if ok else 1


def compact_main(argv: list[str]) -> int:
    """Compact every manifest task's table (one file per DAY partition)."""
    ap = argparse.ArgumentParser(prog="bucket_to_bigquery_spark.run compact")
    ap.add_argument("--manifest", required=True, help="manifest JSON file/string")
    ap.add_argument("--warehouse", required=True, help="warehouse root")
    args = ap.parse_args(argv)
    manifest = parse_manifest(args.manifest)
    spark = get_spark("b2bqs-compact")
    loader = BatchLoader(spark, args.warehouse)
    out = []
    for task in manifest.tasks:
        try:
            n_files = loader.compact(task)
            out.append({"table": task.qualified_table, "files": n_files,
                        "ok": True})
        except Exception as e:  # noqa: BLE001 — report per-table, keep going
            out.append({"table": task.qualified_table, "ok": False,
                        "error": f"{type(e).__name__}: {e}"})
    ok = all(t["ok"] for t in out)
    print(json.dumps({"ok": ok, "tables": out}, indent=2))
    return 0 if ok else 1


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] == "setup":
        return setup_main(argv[1:])
    if argv and argv[0] == "compact":
        return compact_main(argv[1:])
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
