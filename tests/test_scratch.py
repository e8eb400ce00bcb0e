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


def test_publish_prunes_stale_fingerprint_siblings(tmp_path):
    import shutil

    from bucket_to_bigquery_spark import scratch

    src = tmp_path / "sf9"
    src.mkdir()
    f = src / "documents.parquet"
    f.write_bytes(b"v1")

    def write(tmp: str) -> None:
        os.makedirs(tmp, exist_ok=True)

    p1 = materialize_once(scratch_path("prune", str(src)), write)
    parent = os.path.dirname(p1)
    # a crashed writer's temp dir for the OLD key must also go
    stale_tmp = p1 + ".tmp.99999"
    os.makedirs(stale_tmp, exist_ok=True)
    # a DIFFERENT sf tag under the same name must be spared
    other_tag = os.path.join(parent, "sfX-deadbeef")
    os.makedirs(other_tag, exist_ok=True)

    f.write_bytes(b"v2!")  # in-place regeneration -> new fingerprint
    p2 = materialize_once(scratch_path("prune", str(src)), write)
    assert p2 != p1
    assert not os.path.exists(p1), "stale-fingerprint sibling not pruned"
    assert not os.path.exists(stale_tmp), "stale temp leftover not pruned"
    assert os.path.exists(other_tag), "different-tag sibling wrongly pruned"
    assert os.path.exists(p2)
    # a live racer's temp for the CURRENT key is spared (use a real
    # live process as the owner — the sweep checks pid liveness)
    import subprocess

    racer = subprocess.Popen(["sleep", "60"])
    try:
        live_tmp = f"{p2}.tmp.{racer.pid}"
        os.makedirs(live_tmp, exist_ok=True)
        scratch._prune_stale_siblings(p2)
        assert os.path.exists(live_tmp), (
            "live same-key racer temp wrongly pruned"
        )
    finally:
        racer.kill()
        racer.wait()
    shutil.rmtree(parent, ignore_errors=True)


def test_crashed_write_publishes_nothing_and_rebuilds(tmp_path):
    # Atomic-publish contract the r8 migration leans on for the q04/q41
    # pipeline builds: a write callback that dies mid-build must leave NO
    # published path (readers can never see the half-built warehouse), and
    # the next call must rebuild from scratch.
    import pytest

    src = tmp_path / "sf9"
    src.mkdir()
    (src / "documents.parquet").write_bytes(b"v1")
    path = scratch_path("crash", str(src))
    calls: list[str] = []

    def dying_write(tmp: str) -> None:
        os.makedirs(tmp, exist_ok=True)
        open(os.path.join(tmp, "partial"), "w").close()
        calls.append(tmp)
        raise RuntimeError("simulated mid-build crash")

    with pytest.raises(RuntimeError):
        materialize_once(path, dying_write)
    assert not os.path.exists(path), "crashed build must publish nothing"
    # ADVICE r8 #3: the crash must not strand the temp dir either — the
    # exception handler removes it before propagating.
    parent = os.path.dirname(path)
    leftovers = [e for e in os.listdir(parent) if ".tmp." in e]
    assert leftovers == [], f"crashed write stranded its temp: {leftovers}"

    def good_write(tmp: str) -> None:
        os.makedirs(tmp, exist_ok=True)
        calls.append(tmp)

    out = materialize_once(path, good_write)
    assert out == path and os.path.exists(os.path.join(path, ".b2bqs_done"))
    assert len(calls) == 2  # the crash never counted as a publish
    import shutil

    shutil.rmtree(os.path.dirname(path), ignore_errors=True)


def test_marker_on_disk_short_circuits_second_process(tmp_path):
    # A second process finding the winner's on-disk marker must skip its
    # own build entirely (the _PUBLISHED memo is process-local; the
    # marker is the cross-process signal).
    import shutil

    from bucket_to_bigquery_spark import scratch

    src = tmp_path / "sf9"
    src.mkdir()
    (src / "documents.parquet").write_bytes(b"v1")
    path = scratch_path("race", str(src))

    def winner_write(tmp: str) -> None:
        os.makedirs(tmp, exist_ok=True)
        open(os.path.join(tmp, "winner"), "w").close()

    materialize_once(path, winner_write)
    scratch._PUBLISHED.discard(path)  # forget; simulate a second process
    calls: list[str] = []
    materialize_once(path, lambda tmp: calls.append(tmp))
    assert calls == [], "marker on disk must short-circuit a second build"
    assert os.path.exists(os.path.join(path, "winner"))
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)


def test_losing_racer_keeps_winner_and_discards_own_temp(tmp_path):
    # The true rename-collision path: the loser passes the marker check
    # (nothing published yet), builds its temp copy, and the WINNER
    # publishes while the loser is still writing — the loser's
    # os.rename then fails against the winner's non-empty directory, and
    # the loser must discard its own temp and leave the winner's copy
    # untouched. The winner is simulated from inside the loser's write
    # callback (exactly the mid-build interleaving of a real race).
    import shutil

    from bucket_to_bigquery_spark import scratch

    src = tmp_path / "sf9"
    src.mkdir()
    (src / "documents.parquet").write_bytes(b"v1")
    path = scratch_path("race2", str(src))

    def loser_write(tmp: str) -> None:
        os.makedirs(tmp, exist_ok=True)
        open(os.path.join(tmp, "loser"), "w").close()
        # winner publishes mid-build (marker included)
        os.makedirs(path, exist_ok=True)
        open(os.path.join(path, "winner"), "w").close()
        with open(os.path.join(path, scratch._DONE), "w") as fh:
            fh.write("ok")

    out = materialize_once(path, loser_write)
    assert out == path
    assert os.path.exists(os.path.join(path, "winner")), "winner clobbered"
    assert not os.path.exists(os.path.join(path, "loser")), (
        "loser's copy must not replace the winner's"
    )
    leftovers = [e for e in os.listdir(os.path.dirname(path))
                 if ".tmp." in e]
    assert leftovers == [], f"loser's temp not discarded: {leftovers}"
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)


def test_dead_owner_temp_reclaimed_on_next_materialize(tmp_path):
    # The SIGKILL edge of ADVICE r8 #3: a writer killed before its
    # cleanup handler leaves `<path>.tmp.<dead-pid>`. The next
    # materialize of the same key must reclaim it (the sibling sweep
    # checks owner-pid liveness), so nothing is stranded forever.
    import shutil
    import subprocess

    src = tmp_path / "sf9"
    src.mkdir()
    (src / "documents.parquet").write_bytes(b"v1")
    path = scratch_path("killed", str(src))

    # a genuinely dead pid: a child that has exited and been reaped
    proc = subprocess.Popen(["true"])
    proc.wait()
    dead_tmp = f"{path}.tmp.{proc.pid}"
    os.makedirs(dead_tmp, exist_ok=True)
    open(os.path.join(dead_tmp, "half-built"), "w").close()

    def write(tmp: str) -> None:
        os.makedirs(tmp, exist_ok=True)

    out = materialize_once(path, write)
    assert out == path and os.path.exists(path)
    assert not os.path.exists(dead_tmp), (
        "dead writer's temp not reclaimed on next materialize"
    )
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)


def test_owner_alive_semantics():
    import subprocess

    from bucket_to_bigquery_spark.scratch import _owner_alive

    assert _owner_alive(str(os.getpid())) is True
    proc = subprocess.Popen(["true"])
    proc.wait()
    assert _owner_alive(str(proc.pid)) is False
    # unparseable suffixes are conservatively treated as live
    assert _owner_alive("not-a-pid") is True
    assert _owner_alive("") is True


def test_prune_never_touches_paths_outside_scratch_root(tmp_path):
    from bucket_to_bigquery_spark import scratch

    foreign = tmp_path / "data" / "sf9-aaaa"
    sibling = tmp_path / "data" / "sf9-bbbb"
    foreign.mkdir(parents=True)
    sibling.mkdir()
    scratch._prune_stale_siblings(str(foreign))
    assert sibling.exists()
