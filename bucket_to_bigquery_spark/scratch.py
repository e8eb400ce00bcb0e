"""Atomic write-once scratch materialization for derived bench inputs.

Used by the q46-q54 planted-corpus builders (llm_queries/_dedup_corpus,
_embedding_dedup_pairs) and, since r7, q48d's prebuilt-IVF-index writer.
Differs from relational._materialize_once (the q02/q05 scratch writer)
in HOW the publish happens: the data is written to a process-private
temp directory and published with one ``os.rename`` — so a reader can
never observe a half-written directory, even if two processes race to
be first writer (the loser's rename fails and its temp dir is
discarded). relational.py still carries its original non-atomic variant
because a change there pulls its 35 (mostly out-of-window) entries into
the 50-slot correctness gate (tools/check_gate_rotation.py); migrating
it is the first r8 task (GATE_r07.md).

Staleness contract (explicit): scratch is keyed by the sf_dir BASENAME,
not by content — regenerating the testdata in place serves stale
derived corpora until ``/tmp/b2bqs`` is wiped. That is the established
repo-wide scratch contract (see .claude/skills/verify: "deterministic
paths, safe to wipe").
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

_ROOT = "/tmp/b2bqs/v3"
_DONE = ".b2bqs_done"
_PUBLISHED: set[str] = set()


def scratch_path(name: str, sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir))
    return f"{_ROOT}/{name}/{tag}"


def materialize_once(path: str, write: Callable[[str], None]) -> str:
    """Write derived data exactly once per path, atomically published.

    First writer: writes to ``<path>.tmp.<pid>``, drops the done-marker
    inside, then renames into place — one atomic publish, no observable
    half-written state. Losing racers (rename fails because the winner's
    directory exists) discard their temp copy. A leftover UN-marked
    ``path`` from a crashed pre-atomic writer is removed before the
    rename attempt.
    """
    marker = os.path.join(path, _DONE)
    if path not in _PUBLISHED:
        if not os.path.exists(marker):
            tmp = f"{path}.tmp.{os.getpid()}"
            shutil.rmtree(tmp, ignore_errors=True)
            write(tmp)
            with open(os.path.join(tmp, _DONE), "w") as fh:
                fh.write("ok")
            if os.path.exists(path) and not os.path.exists(marker):
                # crashed non-atomic writer left debris; safe to clear
                shutil.rmtree(path, ignore_errors=True)
            try:
                os.rename(tmp, path)
            except OSError:
                # another process published first; keep theirs
                shutil.rmtree(tmp, ignore_errors=True)
        _PUBLISHED.add(path)
    return path
