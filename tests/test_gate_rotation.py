"""The gate-rotation invariant, enforced CI-style (VERDICT r4 item #3):
every registry entry whose implementing files changed since the last
driver round commit must sort inside the driver gate's 50-entry window."""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_gate_rotation import check, default_base_ref


def test_changed_entries_are_in_gate_window():
    problems = check()
    assert not problems, "\n".join(problems)


def test_gate_names_are_parseable():
    # _gate_name must reject names outside the qNN[v]_ convention instead
    # of mis-sorting them (ADVICE r4)
    import pytest

    from __spark_entry__ import _gate_name

    assert _gate_name("q01_parquet_scan") in {"q01_parquet_scan", "a01_parquet_scan"}
    with pytest.raises(ValueError):
        _gate_name("r01_weird")
    with pytest.raises(ValueError):
        _gate_name("quux")


def test_base_ref_detection_matches_driver_convention():
    base = default_base_ref()
    if base is None:  # fresh repo: nothing to check
        return
    subject = subprocess.check_output(
        ["git", "log", "-1", "--format=%s", base],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        text=True,
    ).strip()
    assert subject.startswith("round ")
