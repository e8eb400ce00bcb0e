"""The local correctness gate: every registered query vs its DuckDB oracle.

Runs at sf0.001 by default (fast inner loop); set B2BQS_TEST_SF_DIR to
/root/testdata/sf0.01 to mirror the driver's t2 gate exactly.
"""

from __future__ import annotations

import pytest

from bucket_to_bigquery_spark.queries import all_queries

from .oracle import compare, duck_connection

QUERIES = all_queries()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("qname", sorted(QUERIES))
def test_query_matches_oracle(qname, spark, duck, sf_dir):
    problems = compare(qname, spark, duck, sf_dir, QUERIES)
    assert not problems, f"{qname}: " + "; ".join(problems)
