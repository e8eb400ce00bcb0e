"""Property-based tests (SURVEY §5.4): randomized jagged CSVs and
column-growth sequences against the loader's invariants —
- columns are never reordered, renamed, or removed;
- short rows always null-fill (never corrupt a load);
- any prefix-compatible growth sequence resolves to the widest schema;
- ``same_or_super_set`` is symmetric, reflexive, and prefix-sound.

Pure-Python properties use hypothesis; the Spark end-to-end property runs
a bounded number of randomized examples (JVM round-trips are slow).
"""

from __future__ import annotations

import csv
import os
import random
import shutil

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bucket_to_bigquery_spark.ingest import (
    BatchLoader,
    Field,
    expand_schema,
    parse_manifest,
    same_or_super_set,
)

names = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=6), min_size=0, max_size=8,
    unique=True,
)


@given(names)
def test_prefix_reflexive(a):
    assert same_or_super_set(a, a)


@given(names, st.integers(min_value=0, max_value=8))
def test_prefix_of_self_passes_both_ways(a, k):
    prefix = a[: min(k, len(a))]
    assert same_or_super_set(a, prefix)
    assert same_or_super_set(prefix, a)


@given(names, names)
def test_prefix_symmetric_and_sound(a, b):
    assert same_or_super_set(a, b) == same_or_super_set(b, a)
    # sound: true iff one IS a prefix of the other
    is_prefix = a[: len(b)] == b or b[: len(a)] == a
    assert same_or_super_set(a, b) == is_prefix


@given(names)
def test_expansion_resolves_to_widest(headers):
    # growing the same header list step by step always lands on the full
    # list, every appended field float-typed, original prefix untouched
    fields: list[Field] = []
    for i in range(len(headers)):
        fields = expand_schema(fields, headers[: i + 1])
    assert [f.name for f in fields] == headers
    assert all(f.type == "float" for f in fields)


@settings(max_examples=30)
@given(names, names)
def test_incompatible_never_silently_passes(a, b):
    from bucket_to_bigquery_spark.ingest.schema_registry import SchemaCompatError

    fields = [Field(n, "float") for n in a]
    if a[: len(b)] == b or b[: len(a)] == a:
        expand_schema(fields, b)  # must not raise
    else:
        with pytest.raises(SchemaCompatError):
            expand_schema(fields, b)


BASE = "/tmp/b2bqs_prop_ingest"


def test_randomized_jagged_growth_end_to_end(spark):
    """Randomized growth + jagged batches: N files with monotonically
    growing headers and randomly truncated rows; the final table must hold
    every row, with exactly the missing trailing cells NULL."""
    rng = random.Random(42)
    shutil.rmtree(BASE, ignore_errors=True)
    all_cols = ["ts", "loc"] + [f"ch{i}" for i in range(1, 6)]  # widest file: 7 cols
    expected_rows = 0
    expected_nulls = {c: 0 for c in all_cols}
    for fidx in range(6):
        width = 2 + fidx  # headers grow one column per file
        header = all_cols[:width]
        path = f"{BASE}/src/f{fidx:02d}.csv"
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w", newline="") as fh:
            w = csv.writer(fh, lineterminator="\n")
            w.writerow(header)
            for r in range(rng.randint(2, 5)):
                # jagged: each row keeps a random prefix of its file's width
                keep = rng.randint(1, width)
                row = [f"2024-01-0{(r % 8) + 1} 00:00:00", f"loc{r}"] + [
                    str(float(i)) for i in range(width - 2)
                ]
                w.writerow(row[:keep])
                expected_rows += 1
                for c in all_cols[keep:]:
                    expected_nulls[c] += 1
    manifest = parse_manifest(
        {
            "project": "prop",
            "tasks": [
                {
                    "sources": [f"{BASE}/src/*.csv"],
                    "dataset": "d",
                    "table": "t",
                    "fields": [
                        {"name": "ts", "type": "timestamp"},
                        {"name": "loc", "type": "string"},
                    ],
                }
            ],
        }
    )
    loader = BatchLoader(spark, f"{BASE}/wh")
    (report,) = loader.run(manifest)
    assert report.rows_loaded == expected_rows
    assert [f.name for f in report.schema_fields] == all_cols
    df = loader.read_table(manifest.tasks[0])
    assert df.count() == expected_rows
    assert df.columns == all_cols  # order preserved, nothing renamed
    for c in all_cols:
        assert df.where(f"{c} IS NULL").count() == expected_nulls[c], c
    shutil.rmtree(BASE, ignore_errors=True)
