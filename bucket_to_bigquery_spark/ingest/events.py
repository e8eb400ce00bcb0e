"""Event-envelope decode — the reference's ``getTriggeredTaskInfos`` front
half (BucketToBigQuery.js:208-246), Spark-native.

The reference receives PubSub push envelopes, keeps ``OBJECT_FINALIZE``
notifications, base64-decodes ``message.data`` into a storage-object JSON,
keeps ``kind == 'storage#object'``, dedups by ``selfLink`` (redelivered
notifications), and builds ``gs://<bucket>/<name>`` URIs that are then
minimatch'd against each task's sources. Everything through URI extraction
is a row pipeline — expressed here as DataFrame transforms so a backlog of
millions of notifications decodes executor-side (unbase64 + from_json are
JVM builtins; no Python in the loop). The per-task source matching stays in
:meth:`BatchLoader.resolve_files` via ``candidate_files``, same split as
the reference (decode once, match per task).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ENVELOPE_SCHEMA = "message struct<attributes: map<string,string>, data: string>"
_OBJECT_SCHEMA = "kind string, selfLink string, bucket string, name string"

GS_URI_FORMAT = "gs://{bucket}/{name}"  # reference's hardcoded scheme (js:236)


def finalize_object_uris(
    envelopes: DataFrame,
    envelope_col: str = "envelope",
    uri_format: str = GS_URI_FORMAT,
) -> DataFrame:
    """Raw envelope JSON strings → one ``uri`` row per finalized object.

    Semantics parity with BucketToBigQuery.js:213-236:

    - only ``message.attributes.eventType == 'OBJECT_FINALIZE'`` survives;
    - ``message.data`` is base64-decoded and parsed as JSON (an absent or
      undecodable payload fails the kind filter, as in the reference where
      a null ``data`` can't match ``kind``);
    - only ``kind == 'storage#object'`` survives;
    - one row per distinct ``selfLink`` (``uniqBy`` — duplicates carry the
      same bucket/name, so the URI set is order-independent).

    ``uri_format`` is a local-test seam; the default is the reference's
    ``gs://`` scheme.
    """
    uri = F.lit(uri_format)
    uri = F.replace(uri, F.lit("{bucket}"), F.col("d.bucket"))
    uri = F.replace(uri, F.lit("{name}"), F.col("d.name"))
    return (
        envelopes.select(
            F.from_json(F.col(envelope_col), ENVELOPE_SCHEMA).alias("e")
        )
        .where(F.col("e.message.attributes")["eventType"] == "OBJECT_FINALIZE")
        .select(
            F.from_json(
                F.unbase64(F.col("e.message.data")).cast("string"),
                _OBJECT_SCHEMA,
            ).alias("d")
        )
        .where(F.col("d.kind") == "storage#object")
        .select(F.col("d.selfLink").alias("selfLink"), uri.alias("uri"))
        .dropDuplicates(["selfLink"])
        .select("uri")
    )


def events_to_candidates(
    spark: SparkSession,
    events: list[dict],
    uri_format: str = GS_URI_FORMAT,
) -> list[str]:
    """Decode a batch of envelope dicts (the ``mockEvents`` seam,
    index.js:49-50) into the sorted candidate-URI list that feeds
    ``BatchLoader.run(candidate_files=...)``.

    The driver-side collect is bounded by the load contract (the reference
    processes one notification batch per invocation); an unbounded backlog
    would keep :func:`finalize_object_uris` as a DataFrame and stream it
    into the audit anti-join instead.
    """
    if not events:
        return []
    df = spark.createDataFrame(
        [(json.dumps(e),) for e in events], ["envelope"]
    )
    rows = finalize_object_uris(df, uri_format=uri_format).collect()
    return sorted(r["uri"] for r in rows)


__all__ = ["ENVELOPE_SCHEMA", "finalize_object_uris", "events_to_candidates"]
