"""Rules of the multi-round rotation deferral (tools/deferred_rotation.json).

The r11 scratch.py crashed-writer fix ships under the 2-round split
committed in GATE_r10.md: scratch.py implements 88 registry entries —
more than one 50-slot gate window — so 38 of them defer to the r12
window. ``evaluate_deferral`` mechanizes the split so the second half
cannot silently slip; these tests pin each rule with synthetic inputs
(the live repo state is exercised by tests/test_gate_rotation.py).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from check_gate_rotation import DEFERRAL_FILE, evaluate_deferral  # noqa: E402

REG = {"q1_a", "q2_b", "q3_c", "q4_d"}


def _deferral(entries, files=("pkg/wide.py",)):
    return {"changed_files": list(files), "entries": list(entries)}


def test_no_deferral_is_a_noop():
    problems, exempt = evaluate_deferral(
        None, None, REG, {"pkg/wide.py"}, lambda n: False, {})
    assert problems == [] and exempt == set()


def test_created_this_round_exempts_covered_entries():
    impl_changed = {"q1_a": {"pkg/wide.py"}, "q2_b": {"pkg/wide.py"}}
    problems, exempt = evaluate_deferral(
        None, _deferral(["q1_a", "q2_b"]), REG, {"pkg/wide.py"},
        lambda n: False, impl_changed)
    assert problems == []
    assert exempt == {"q1_a", "q2_b"}


def test_no_piggybacking_other_changes_under_the_exemption():
    # q2_b is ALSO touched by a non-deferred file: it must still rotate
    # in-window, so it earns no exemption.
    impl_changed = {
        "q1_a": {"pkg/wide.py"},
        "q2_b": {"pkg/wide.py", "pkg/other.py"},
    }
    problems, exempt = evaluate_deferral(
        None, _deferral(["q1_a", "q2_b"]), REG,
        {"pkg/wide.py", "pkg/other.py"}, lambda n: False, impl_changed)
    assert problems == []
    assert exempt == {"q1_a"}


def test_unknown_entries_and_unchanged_covered_files_fail():
    problems, exempt = evaluate_deferral(
        None, _deferral(["q9_zz"]), REG, set(), lambda n: False, {})
    assert exempt == set()
    assert any("unknown entries" in p for p in problems)
    assert any("did not behaviorally change" in p for p in problems)


def test_carried_a_second_round_fails():
    d = _deferral(["q1_a"])
    problems, exempt = evaluate_deferral(
        d, d, REG, set(), lambda n: True, {})
    assert exempt == set()
    assert any("very next round" in p for p in problems)


def test_boundary_commit_is_not_a_carry():
    # ADVICE r15 #1: the driver's "round N:" boundary commit resolves as
    # its own base ref, so at the START of round N+1 the file exists at
    # both base and HEAD with zero work done — that is the pending
    # obligation, not a carried deferral. It must not fail until
    # behavioral package work begins without resolving it.
    d = dict(_deferral(["q1_a"]), created_round=15)
    # pristine start of the resolution round: no behavioral change yet
    problems, exempt = evaluate_deferral(
        d, d, REG, set(), lambda n: False, {}, base_round_n=15)
    assert problems == [] and exempt == set()
    # work has begun (changed non-empty) but the file is still alive
    problems, _ = evaluate_deferral(
        d, d, REG, {"pkg/other.py"}, lambda n: False, {}, base_round_n=15)
    assert any("due THIS round" in p for p in problems)
    # the gate file alone counts as work begun (review finding r16: a
    # rotation starts with a GATE_PRIORITY rewrite even when no package
    # file changes behaviorally — the obligation must not stay silent)
    problems, _ = evaluate_deferral(
        d, d, REG, set(), lambda n: False, {}, base_round_n=15,
        gate_file_changed=True)
    assert any("due THIS round" in p for p in problems)
    # a deferral created BEFORE the base round is a genuine carry even at
    # a pristine boundary
    old = dict(_deferral(["q1_a"]), created_round=14)
    problems, _ = evaluate_deferral(
        old, old, REG, set(), lambda n: False, {}, base_round_n=15)
    assert any("very next round" in p for p in problems)
    # unknown base round number keeps the conservative carry semantics
    problems, _ = evaluate_deferral(
        d, d, REG, set(), lambda n: False, {}, base_round_n=None)
    assert any("very next round" in p for p in problems)


def test_resolve_and_create_in_one_round():
    # r16 shape: the round resolves the prior deferral (entries rotated
    # in-window) AND creates a new one for its own wide-fan-in change.
    old = dict(_deferral(["q1_a"]), created_round=15)
    new = dict(
        _deferral(["q2_b"], files=("pkg/wide2.py",)), created_round=16)
    impl_changed = {"q2_b": {"pkg/wide2.py"}}
    # legal: old entry in-window, new file behaviorally changed
    problems, exempt = evaluate_deferral(
        old, new, REG, {"pkg/wide2.py"}, lambda n: n == "q1_a",
        impl_changed, base_round_n=15)
    assert problems == []
    assert exempt == {"q2_b"}
    # the old deferral's entries must STILL rotate in-window this round
    problems, exempt = evaluate_deferral(
        old, new, REG, {"pkg/wide2.py"}, lambda n: False,
        impl_changed, base_round_n=15)
    assert any("q1_a" in p for p in problems)
    assert exempt == {"q2_b"}  # the new deferral still applies
    # a head file with the SAME created_round is the carried base file,
    # not a new deferral — conservative carry semantics hold
    same = dict(_deferral(["q1_a"]), created_round=15)
    problems, _ = evaluate_deferral(
        same, same, REG, {"pkg/wide.py"}, lambda n: True, {},
        base_round_n=15)
    assert any("due THIS round" in p for p in problems)
    # a head created_round that is not base+1 cannot claim the
    # resolve-and-create path: once work exists, the unresolved base
    # obligation fires exactly as if no head file had been written
    stale = dict(_deferral(["q2_b"]), created_round=17)
    problems, _ = evaluate_deferral(
        old, stale, REG, {"pkg/wide.py"}, lambda n: True, {},
        base_round_n=15)
    assert any("due THIS round" in p for p in problems)
    # unknown base round: conservative carry even with a head file
    problems, _ = evaluate_deferral(
        old, new, REG, set(), lambda n: True, {}, base_round_n=None)
    assert any("very next round" in p for p in problems)


def test_resolution_round_requires_listed_entries_in_window():
    d = _deferral(["q1_a", "q2_b"])
    # resolved correctly: file deleted, everything in-window
    problems, _ = evaluate_deferral(d, None, REG, set(), lambda n: True, {})
    assert problems == []
    # resolved wrongly: q2_b left out of the window
    problems, _ = evaluate_deferral(
        d, None, REG, set(), lambda n: n == "q1_a", {})
    assert len(problems) == 1 and "q2_b" in problems[0]


def test_resolution_ignores_deregistered_entries():
    # an entry renamed/removed since the deferral was written must not
    # brick the resolution round — nothing is left to rotate for it
    d = _deferral(["q1_a", "q9_gone"])
    problems, _ = evaluate_deferral(
        d, None, REG, set(), lambda n: n == "q1_a", {})
    assert problems == []


def test_live_deferral_file_matches_registry_and_window_plan():
    # Whatever deferral is live (r11: scratch.py/38 entries; r15:
    # operators/dedup.py/3 entries), it must name EXACTLY the
    # registered dependents of its changed files that sit OUTSIDE the
    # gate window — computed from MODULE_DEPS, not trusted from the
    # file — and every changed file must be a real package file.
    repo = os.path.join(os.path.dirname(__file__), "..")
    path = os.path.join(repo, DEFERRAL_FILE)
    if not os.path.exists(path):
        return  # resolution round: rules above still apply via check()
    with open(path) as fh:
        deferral = json.load(fh)
    sys.path.insert(0, repo)
    import inspect

    from __spark_entry__ import GATE_PRIORITY
    from bucket_to_bigquery_spark.queries import all_queries
    from tools.check_gate_rotation import MODULE_DEPS

    entries = set(deferral["entries"])
    changed = set(deferral["changed_files"])
    assert entries and changed
    for f in changed:
        assert os.path.exists(os.path.join(repo, f)), f
    assert entries <= set(all_queries())
    assert entries.isdisjoint(GATE_PRIORITY), (
        "a deferred entry is aliased in-window — it should not be listed"
    )
    expected = set()
    for name, q in all_queries().items():
        rel = os.path.relpath(inspect.getmodule(q.builder).__file__, repo)
        impl = {rel} | set(MODULE_DEPS.get(rel, []))
        if impl & changed and name not in GATE_PRIORITY:
            expected.add(name)
    assert entries == expected, (
        f"deferral entries != out-of-window dependents of changed files: "
        f"extra={sorted(entries - expected)} missing={sorted(expected - entries)}"
    )


def test_deferred_entries_replay_off_gate(spark, sf_dir):
    """ADVICE r11 #1: a deferral postpones GATE evidence, not ALL
    evidence. Whenever a live deferral file exists, every listed entry
    replays against its oracle right here — so a regression in the
    wide-fan-in change that only affects the deferred families is
    caught by the creating round's CI, one round before the gate sees
    it. Skips (cheaply) in resolution rounds like r12, where the file
    is gone and the entries are in-window."""
    repo = os.path.join(os.path.dirname(__file__), "..")
    path = os.path.join(repo, DEFERRAL_FILE)
    if not os.path.exists(path):
        import pytest

        pytest.skip("no active rotation deferral — entries are gate-visible")
    with open(path) as fh:
        deferral = json.load(fh)
    sys.path.insert(0, repo)
    from bucket_to_bigquery_spark.queries import all_queries

    from .oracle import compare, duck_connection

    reg = all_queries()
    duck = duck_connection(sf_dir)
    try:
        failures = []
        for name in sorted(deferral["entries"]):
            if name not in reg:
                continue  # deregistered since the deferral was written
            problems = compare(name, spark, duck, sf_dir, reg)
            if problems:
                failures.append(f"{name}: " + "; ".join(problems))
        assert not failures, "\n".join(failures)
    finally:
        duck.close()
