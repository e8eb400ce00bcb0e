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


def test_ast_fingerprint_ignores_comments_and_docstrings_only():
    # the semantic-diff exemption: comment/docstring/formatting edits are
    # not behavior changes (wide-fan-in files like scratch.py could never
    # fit a window otherwise); ANY code-level edit must still register
    from tools.check_gate_rotation import ast_fingerprint

    base = 'def f(x):\n    """old doc."""\n    return x + 1  # add one\n'
    doc_edit = 'def f(x):\n    """new doc, rewritten."""\n    # renamed comment\n    return x + 1\n'
    fmt_edit = "def f(x):\n    return (x\n            + 1)\n"
    code_edit = 'def f(x):\n    """old doc."""\n    return x + 2\n'
    docstring_only_body = 'def f(x):\n    """just a doc."""\n'
    assert ast_fingerprint(base) == ast_fingerprint(doc_edit)
    assert ast_fingerprint(base) == ast_fingerprint(fmt_edit)
    assert ast_fingerprint(base) != ast_fingerprint(code_edit)
    # a function whose body is ONLY a docstring stays parseable (Pass fill)
    assert ast_fingerprint(docstring_only_body) is not None
    # unparseable → None (callers treat as changed)
    assert ast_fingerprint("def f(:") is None


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
