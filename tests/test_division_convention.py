"""Cross-engine pin of the integer-division convention the time-bucket
queries rely on (q84/q118/q128/q129 and every `unix_micros ... div`
site): Spark's `div`, DuckDB's `//` on BIGINTs, and the brute-force
replays' truncate-toward-zero helper must agree on BOTH signs.

Why this exists (two review catches in r13): Python's `//` FLOORS
(-1 // 86400 == -1) while both engines TRUNCATE toward zero
(-1 div 86400 == 0), and a double-division + cast can round a
just-before-boundary quotient across the boundary. Midnight-aligned
testdata masks both divergences, so the engines are pinned here on
adversarial values instead of waiting for a generator change to break
a driver hash.
"""

from __future__ import annotations

import random

import duckdb

_US_PER_DAY = 86_400_000_000

# boundary-adversarial numerators: exact multiples of the divisor,
# ±1 around them, both signs, plus seeded random 63-bit values
_EDGES = [0, 1, -1, _US_PER_DAY, _US_PER_DAY - 1, _US_PER_DAY + 1,
          -_US_PER_DAY, -_US_PER_DAY + 1, -_US_PER_DAY - 1,
          3 * _US_PER_DAY - 1, -3 * _US_PER_DAY + 1,
          2**62, -(2**62), 2**53 + 1, -(2**53) - 1]
_RNG = random.Random(20260815)
_VALUES = _EDGES + [_RNG.randrange(-2**62, 2**62) for _ in range(200)]


def _trunc_div(a: int, b: int) -> int:
    """The replay helper: truncate toward zero (NOT Python floor //)."""
    q = abs(a) // b
    return q if a >= 0 else -q


def test_python_floor_differs_on_negatives():
    """Self-check that the pin is non-vacuous: plain // would fail."""
    assert (-1) // _US_PER_DAY == -1
    assert _trunc_div(-1, _US_PER_DAY) == 0


def test_duckdb_intdiv_truncates_toward_zero():
    con = duckdb.connect()
    for v in _VALUES:
        got = con.execute(
            f"SELECT CAST({v} AS BIGINT) // CAST({_US_PER_DAY} AS BIGINT)"
        ).fetchone()[0]
        assert got == _trunc_div(v, _US_PER_DAY), v
    con.close()


def test_spark_div_truncates_toward_zero(spark):
    df = spark.createDataFrame([(v,) for v in _VALUES], "a long")
    rows = df.selectExpr("a", f"a div {_US_PER_DAY} AS d").collect()
    for r in rows:
        assert r.d == _trunc_div(r.a, _US_PER_DAY), r.a


def test_double_division_rounds_across_boundaries(spark):
    """The q118 review catch, pinned as a counterexample: double `/` +
    truncating cast crosses a day boundary that integer `div` does not,
    once the quotient's distance to an integer falls under half an ulp."""
    # one microsecond before midnight of day 2^17 (~year 2328): the
    # quotient k − 1/N sits within half an ulp of k once k ≥ 2^17
    v = 2**17 * _US_PER_DAY - 1
    row = spark.createDataFrame([(v,)], "a long").selectExpr(
        f"CAST(a / {_US_PER_DAY} AS LONG) AS dbl",
        f"a div {_US_PER_DAY} AS intd",
    ).collect()[0]
    assert row.intd == 2**17 - 1  # exact
    assert row.dbl == 2**17  # the double quotient rounded up — the bug


def test_duckdb_epoch_us_binds_integer_intdiv():
    """ADVICE r14 #2 closure: the `epoch_us(ts) // N` oracle sites
    (bursts/actives/anomaly/funnel_ttc/latency/rfm/seasonality/trend)
    truncate like Spark `div` ONLY because `//` binds BIGINT // BIGINT —
    on DOUBLE operands DuckDB 1.0's `//` is PLAIN DIVISION (measured
    here), not integer division at all. Pin the type assumption
    (epoch_us → BIGINT) and the counterexample that makes it
    load-bearing."""
    con = duckdb.connect()
    t = con.execute(
        "SELECT typeof(epoch_us(TIMESTAMP '1969-12-31 23:59:59.999999'))"
    ).fetchone()[0]
    assert t == "BIGINT", t
    # the guarded divergence: same numerator, DOUBLE operand floors
    big, dbl = con.execute(
        f"SELECT CAST(-1 AS BIGINT) // {_US_PER_DAY}, "
        f"CAST(-1 AS DOUBLE) // {_US_PER_DAY}"
    ).fetchone()
    assert big == 0  # truncate toward zero ≡ Spark div
    # DOUBLE `//` degenerates to plain division — fractional "buckets";
    # the bug the type pin guards
    assert dbl != 0 and abs(dbl) < 1, dbl
    con.close()


def test_pre_1970_bucket_parity_end_to_end(spark):
    """Negative-epoch timestamps bucket identically in both engines:
    DuckDB `epoch_us(ts) // day` vs Spark `unix_micros(ts) div day`."""
    stamps = [
        "1969-12-31 23:59:59.999999",  # -1 us → bucket 0 (trunc), -1 (floor)
        "1969-12-31 00:00:00",
        "1969-12-30 23:59:59.999999",
        "1932-06-15 07:30:00",
        "1970-01-01 00:00:00",
        "1970-01-02 00:00:00.000001",
    ]
    con = duckdb.connect()
    duck = [
        con.execute(
            f"SELECT epoch_us(TIMESTAMP '{s}') // {_US_PER_DAY}"
        ).fetchone()[0]
        for s in stamps
    ]
    con.close()
    df = spark.createDataFrame([(s,) for s in stamps], "s string")
    got = [
        r.b
        for r in df.selectExpr(
            f"unix_micros(CAST(s AS TIMESTAMP)) div {_US_PER_DAY} AS b"
        ).collect()
    ]
    assert got == duck, (got, duck)
