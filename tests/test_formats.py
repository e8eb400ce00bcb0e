"""q02c XML round-trip edge cases the sf-table parity run cannot force:
markup-significant characters, whitespace shapes, and nulls.

The oracle-parity suite proves the orders table round-trips bit-exact;
this suite pins the properties that make that hold — the writer/reader
pair must escape/unescape element text (&, <, >, quotes), preserve
leading/trailing/internal whitespace, and map an absent element back to
NULL under an explicit schema — on a synthetic frame that contains each
hazard explicitly (testdata free text is not guaranteed to).
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

ROWS = [
    Row(id=1, s="plain", d=1.5, n=7),
    Row(id=2, s="amp & angle <tag> 'q' \"qq\"", d=-0.0, n=None),
    Row(id=3, s="  leading and trailing  ", d=float("inf"), n=0),
    Row(id=4, s=None, d=None, n=-1),
    Row(id=5, s="unicode é中文 and ]]> seq", d=1e-300, n=2**62),
]

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("s", T.StringType()),
        T.StructField("d", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)


@pytest.fixture(scope="module")
def roundtripped(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("xmlrt") / "data")
    df = spark.createDataFrame(ROWS, SCHEMA)
    df.write.format("xml").option("rowTag", "r").mode("overwrite").save(path)
    back = (
        spark.read.format("xml")
        .option("rowTag", "r")
        # mirrors q02c: the reader's default trims surrounding spaces,
        # which is lossy — rely on writer-side escaping instead
        .option("ignoreSurroundingSpaces", False)
        .schema(SCHEMA)
        .load(path)
    )
    rows = {r["id"]: r for r in back.collect()}
    yield rows
    shutil.rmtree(path, ignore_errors=True)


def test_xml_escapes_markup_characters(roundtripped):
    assert roundtripped[2]["s"] == "amp & angle <tag> 'q' \"qq\""


def test_xml_preserves_whitespace(roundtripped):
    assert roundtripped[3]["s"] == "  leading and trailing  "


def test_xml_preserves_unicode_and_cdata_end(roundtripped):
    assert roundtripped[5]["s"] == "unicode é中文 and ]]> seq"


def test_xml_null_fields_round_trip_as_null(roundtripped):
    assert roundtripped[4]["s"] is None
    assert roundtripped[4]["d"] is None
    assert roundtripped[2]["n"] is None


def test_xml_control_chars_fail_loudly_not_silently(spark, tmp_path):
    # XML 1.0 cannot represent 0x01; the writer must FAIL the job
    # (dead-or-correct), never drop or substitute the byte. Legal
    # whitespace controls (tab) and DEL are representable and exact.
    from py4j.protocol import Py4JJavaError
    from pyspark.sql import Row
    from pyspark.sql.utils import CapturedException

    path = str(tmp_path / "ctl")
    bad = spark.createDataFrame([Row(id=1, s="a\x01b")], SCHEMA[:2])
    with pytest.raises((Py4JJavaError, CapturedException)):
        bad.write.format("xml").option("rowTag", "r").save(path)

    ok_path = str(tmp_path / "ok")
    ok = spark.createDataFrame([Row(id=1, s="tab\there \x7f del")], SCHEMA[:2])
    ok.write.format("xml").option("rowTag", "r").save(ok_path)
    back = (
        spark.read.format("xml").option("rowTag", "r")
        .option("ignoreSurroundingSpaces", False)
        .schema(T.StructType(SCHEMA[:2])).load(ok_path)
    )
    assert back.collect()[0]["s"] == "tab\there \x7f del"


def test_xml_numeric_fidelity(roundtripped):
    # -0.0 keeps its sign bit, denormal-near doubles and int64 extremes
    # survive the text representation
    import math

    assert math.copysign(1.0, roundtripped[2]["d"]) == -1.0
    assert roundtripped[3]["d"] == float("inf")
    assert roundtripped[5]["d"] == 1e-300
    assert roundtripped[5]["n"] == 2**62


# ---------------------------------------------------------------------------
# Randomized round-trip: any XML-1.0-representable string survives
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# XML 1.0 Char production: #x9 | #xA | #xD | [#x20-#xD7FF] |
# [#xE000-#xFFFD] | [#x10000-#x10FFFF]. The writer escapes markup and
# CR (&#xd; — sparing it from parser line-ending normalization), so
# everything in the production must survive bit-exact; everything
# outside it fails the write loudly (pinned above).
_xml_char = st.characters(
    blacklist_categories=("Cs",),  # surrogates are not chars
    blacklist_characters=(
        [chr(c) for c in range(0x20) if c not in (0x09, 0x0A, 0x0D)]
        + ["￾", "￿"]
    ),
)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(alphabet=_xml_char, max_size=40), min_size=1, max_size=8))
def test_xml_roundtrips_any_representable_string(spark, tmp_path_factory, texts):
    import shutil as _shutil

    from pyspark.sql import Row

    path = str(tmp_path_factory.mktemp("xmlprop") / "data")
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("s", T.StringType())]
    )
    rows = [Row(id=i, s=s) for i, s in enumerate(texts)]
    spark.createDataFrame(rows, schema).coalesce(1) \
        .write.format("xml").option("rowTag", "r").mode("overwrite").save(path)
    back = (
        spark.read.format("xml").option("rowTag", "r")
        .option("ignoreSurroundingSpaces", False)
        .schema(schema).load(path)
    )
    got = {r["id"]: r["s"] for r in back.collect()}
    # exact: with surrounding-space trimming off, even the empty string
    # survives as '' (an empty element), distinct from NULL (an absent
    # element — pinned in test_xml_null_fields_round_trip_as_null)
    assert got == dict(enumerate(texts))
    _shutil.rmtree(path, ignore_errors=True)
