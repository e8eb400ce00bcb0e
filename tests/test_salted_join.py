"""salted_join must be semantically identical to the plain join."""

from __future__ import annotations

import pytest

from bucket_to_bigquery_spark.catalog import load_tables
from bucket_to_bigquery_spark.operators.salted_join import salted_join


def _sorted_rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_matches_plain_join(spark, sf_dir, how):
    t = load_tables(spark, sf_dir)
    orders = t["orders"].select("o_orderkey", "o_custkey", "o_totalprice")
    cust = t["customer"].select("c_custkey", "c_nkey") \
        if "c_nkey" in t["customer"].columns else t["customer"]
    cust = cust.withColumnRenamed("c_custkey", "o_custkey")
    cols = ["o_orderkey", "o_custkey"]
    plain = orders.join(cust, ["o_custkey"], how)
    salted = salted_join(orders, cust, ["o_custkey"], how, salt=4)
    assert sorted(plain.columns) == sorted(salted.columns)
    assert _sorted_rows(plain, cols) == _sorted_rows(salted, cols)


def test_salted_join_spreads_hot_key(spark):
    # a single hot key must land in multiple salt buckets
    from pyspark.sql import functions as F

    left = spark.range(10000).select(F.lit(1).alias("k"), F.col("id"))
    right = spark.createDataFrame([(1, "x")], ["k", "v"])
    out = salted_join(left, right, ["k"], "inner", salt=8)
    assert out.count() == 10000
    salts = (
        left.withColumn(
            "s", F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(8))
        )
        .select("s").distinct().count()
    )
    assert salts == 8  # the hot key's rows occupy every salt bucket
