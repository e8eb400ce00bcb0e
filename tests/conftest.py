from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bucket_to_bigquery_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("B2BQS_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("B2BQS_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("b2bqs-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
