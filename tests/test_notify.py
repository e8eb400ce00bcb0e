"""q108 notification-driven ingest (queries/notify.py).

The entry's parity claims (BucketToBigQuery.js:99-121 pull loop,
:213-236 decode, index.js:53 batch cap — by declared replacement:
socket feed + checkpointed idempotent sink, commit ≡ ack):

1. **Decode-filter truth table** — the deterministic envelope corpus
   exercises every reference filter (eventType, kind, JSON parse,
   payload decode) and the selfLink redelivery dedup; the batch decode
   of the exact feed q108 serves over the socket must keep precisely
   the finalized-object URI set.
2. **Live-socket end-to-end** — ``_feed_and_sink`` against a tiny
   synthetic id list on a real ephemeral TCP socket: committed URIs
   equal the derivation, batch dirs are checkpoint-committed.
3. **Exactly-once audit** — the builder refuses to publish a sink that
   lost or duplicated a URI (asserted by the RuntimeError contract on
   a corrupted sink, mirroring q41's pre-publish count check).

Oracle parity for q108 itself runs in test_oracle_parity.py like every
registered entry (and was pinned ad-hoc at sf0.001+sf0.01 before
registration).
"""

from __future__ import annotations

import pytest

from bucket_to_bigquery_spark.ingest.events import finalize_object_uris
from bucket_to_bigquery_spark.queries.notify import (
    _BUCKET,
    _DEL,
    _DUP,
    _KIND,
    _MOD,
    _envelope,
    _envelope_lines,
    _feed_and_sink,
)


def test_envelope_corpus_exercises_every_filter():
    ids = [0, 20, 40, 60, 100, 120]
    lines = _envelope_lines(ids)
    # one good envelope per id, plus: dup for %40, delete for %60,
    # wrong-kind for %100, and the two decode-noise lines
    n_dup = sum(1 for i in ids if i % _DUP == 0)
    n_del = sum(1 for i in ids if i % _DEL == 0)
    n_kind = sum(1 for i in ids if i % _KIND == 0)
    assert len(lines) == len(ids) + n_dup + n_del + n_kind + 2
    assert any("OBJECT_DELETE" in ln for ln in lines)
    # the wrong-kind noise lives INSIDE the base64 payload
    import base64
    import json

    def _kind(ln: str) -> str | None:
        try:
            e = json.loads(ln)
            return json.loads(
                base64.b64decode(e["message"]["data"])
            ).get("kind")
        except Exception:  # noqa: BLE001 — the decode-noise lines
            return None

    assert any(_kind(ln) == "storage#bucket" for ln in lines)
    assert any(not ln.startswith("{") for ln in lines)  # non-JSON noise


def test_batch_decode_of_the_feed_keeps_only_finalized_objects(spark):
    ids = [0, 20, 40, 60, 100, 120, 140]
    df = spark.createDataFrame(
        [(ln,) for ln in _envelope_lines(ids)], ["envelope"]
    )
    got = sorted(
        r["uri"] for r in finalize_object_uris(df).collect()
    )
    assert got == sorted(f"gs://{_BUCKET}/obj/{i}.csv" for i in ids)


def test_feed_and_sink_live_socket(spark, tmp_path):
    ids = [0, _MOD, _DUP, _DEL, _KIND]
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    _feed_and_sink(
        spark, _envelope_lines(ids), expected=len(ids),
        sink=sink, ckpt=ckpt, timeout_s=120.0,
    )
    rows = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(sink).collect()
    )
    got = sorted(r["uri"] for r in rows)
    assert got == sorted(f"gs://{_BUCKET}/obj/{i}.csv" for i in ids)
    # ack ≡ checkpoint commit: the run left a committed offset log
    import os

    assert os.path.isdir(f"{ckpt}/commits")
    assert os.listdir(f"{ckpt}/commits")


def test_feed_and_sink_fails_loudly_on_shortfall(spark, tmp_path):
    """A stalled feed / dropped row must raise, not publish silently —
    the q41 pre-publish discipline. Expecting MORE URIs than the feed
    contains forces the timeout path."""
    ids = [0, _MOD]
    with pytest.raises(RuntimeError, match="expected"):
        _feed_and_sink(
            spark, _envelope_lines(ids), expected=len(ids) + 1,
            sink=str(tmp_path / "s"), ckpt=str(tmp_path / "c"),
            timeout_s=15.0,
        )


def test_envelope_shape_matches_reference_contract():
    """The envelope is the A5/A7 shape ingest.events decodes: message
    .attributes.eventType + base64 message.data of a storage#object."""
    import base64
    import json

    e = json.loads(_envelope(7))
    assert e["message"]["attributes"]["eventType"] == "OBJECT_FINALIZE"
    obj = json.loads(base64.b64decode(e["message"]["data"]))
    assert obj["kind"] == "storage#object"
    assert obj["bucket"] == _BUCKET
    assert obj["name"] == "obj/7.csv"
    assert obj["selfLink"].endswith("obj%2F7.csv")
