"""scratch.py staleness contract (ADVICE r6 #2): the scratch key embeds
a source-content fingerprint, so regenerating testdata in place can
never serve a stale materialized corpus."""

from __future__ import annotations

import os

from bucket_to_bigquery_spark.scratch import materialize_once, scratch_path


def test_scratch_key_is_deterministic_for_unchanged_source(tmp_path):
    src = tmp_path / "sf9"
    src.mkdir()
    (src / "documents.parquet").write_bytes(b"v1")
    assert scratch_path("x", str(src)) == scratch_path("x", str(src))


def test_scratch_key_tracks_source_size_and_mtime(tmp_path):
    src = tmp_path / "sf9"
    src.mkdir()
    f = src / "documents.parquet"
    f.write_bytes(b"v1")
    p1 = scratch_path("x", str(src))
    f.write_bytes(b"v2-longer")  # size change
    p2 = scratch_path("x", str(src))
    assert p2 != p1
    # mtime-only change (same size), e.g. an equal-size regeneration
    os.utime(f, ns=(1, 1))
    p3 = scratch_path("x", str(src))
    assert p3 not in (p1, p2)


def test_regenerated_source_rematerializes(tmp_path):
    src = tmp_path / "sf9"
    src.mkdir()
    f = src / "documents.parquet"
    f.write_bytes(b"v1")
    calls: list[str] = []

    def write(tmp: str) -> None:
        os.makedirs(tmp, exist_ok=True)
        calls.append(tmp)

    materialize_once(scratch_path("corp", str(src)), write)
    materialize_once(scratch_path("corp", str(src)), write)
    assert len(calls) == 1  # unchanged source: published once, reused
    f.write_bytes(b"v2!")  # in-place regeneration
    materialize_once(scratch_path("corp", str(src)), write)
    assert len(calls) == 2  # new fingerprint -> fresh materialization
