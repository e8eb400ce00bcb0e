"""Declared scalar-function surface: SURVEY §2.C Q30–Q35 (strings,
date/time incl. the reference's ``local_time`` expression, math, arrays,
map/struct, conditionals).

All expressions are Spark built-ins (JVM-side, whole-stage codegen) — no
UDFs. Transcendentals (ln/exp/pow) are rounded because JVM libm and
DuckDB's C libm may differ in the final ulp; everything else is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import local_time_col
from .registry import dsum_sql, query, tables


@query(
    "q30_string_funcs",
    oracle=(
        "SELECT p_partkey, "
        "concat(p_brand, '#', p_name) AS full_name, "
        "substr(p_name, 1, 5) AS name5, "
        "upper(p_brand) AS brand_up, "
        "lower(p_type) AS type_lo, "
        "trim(p_name) AS name_trim, "
        "replace(p_name, 'a', '@') AS name_repl, "
        "string_split(p_name, ' ')[1] AS first_word, "
        "CAST(length(p_name) AS BIGINT) AS name_len, "
        "(p_type LIKE 'PROMO%') AS is_promo, "
        "regexp_extract(p_name, '^(\\w+)', 1) AS rex_word, "
        "regexp_replace(p_name, '[aeiou]', '_', 'g') AS no_vowels, "
        "lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad "
        "FROM part ORDER BY p_partkey"
    ),
    description="Q30: string functions over part (B5 superset).",
)
def q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return (
        t["part"]
        .select(
            "p_partkey",
            F.concat(F.col("p_brand"), F.lit("#"), F.col("p_name")).alias("full_name"),
            F.substring("p_name", 1, 5).alias("name5"),
            F.upper("p_brand").alias("brand_up"),
            F.lower("p_type").alias("type_lo"),
            F.trim("p_name").alias("name_trim"),
            F.regexp_replace("p_name", "a", "@").alias("name_repl"),
            F.element_at(F.split("p_name", " "), 1).alias("first_word"),
            F.length("p_name").cast("long").alias("name_len"),
            F.col("p_type").like("PROMO%").alias("is_promo"),
            F.regexp_extract("p_name", r"^(\w+)", 1).alias("rex_word"),
            F.regexp_replace("p_name", "[aeiou]", "_").alias("no_vowels"),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        )
        .orderBy("p_partkey")
    )


@query(
    "q31_datetime_funcs",
    oracle=(
        "SELECT o_orderkey, "
        "CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start, "
        "CAST(year(o_orderdate) AS BIGINT) AS yr, "
        "CAST(month(o_orderdate) AS BIGINT) AS mo, "
        "CAST(day(o_orderdate) AS BIGINT) AS dy, "
        "CAST(o_orderdate AS DATE) + 7 AS plus_week, "
        "CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_95, "
        "epoch_us(o_orderdate) AS epoch_micros, "
        "strftime(o_orderdate, '%Y-%m') AS ym "
        "FROM orders ORDER BY o_orderkey"
    ),
    description="Q31: date/time functions over orders (B5 superset).",
)
def q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return (
        t["orders"]
        .select(
            "o_orderkey",
            # date-typed on both engines: DuckDB's date_trunc over a timestamp
            # yields TIMESTAMP too, but month boundaries are civil dates — cast
            # both sides so the comparison is type-stable.
            F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
            F.year("o_orderdate").cast("long").alias("yr"),
            F.month("o_orderdate").cast("long").alias("mo"),
            F.dayofmonth("o_orderdate").cast("long").alias("dy"),
            F.date_add(F.col("o_orderdate").cast("date"), 7).alias("plus_week"),
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
            .cast("long")
            .alias("days_since_95"),
            # cast is a no-op once the catalog reads this column as TIMESTAMP
            # (session.py inferTimestampNTZ=false) but keeps the query valid
            # even on a session where that conf is locked (NTZ input).
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("epoch_micros"),
            F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q31b_local_time_ordered_view",
    oracle=(
        "SELECT event_id, user_id, event_type, value, "
        "ts + to_minutes(CAST(round(((user_id % 49) - 24) / 2.0 * 60) AS BIGINT)) AS local_time "
        "FROM events ORDER BY event_id"
    ),
    description=(
        "Q31b: the reference's `<table>_ordered` view (readme.md:43-48 / "
        "SURVEY B3/B4/B6): hide raw timestamp+offset, expose local_time = "
        "timestamp + round(utc_offset*60) minutes. utc_offset derived "
        "deterministically from user_id (testdata has no offset column)."
    ),
)
def q31b(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    offset_hours = (F.col("user_id") % 49 - 24) / 2.0
    return (
        t["events"]
        .withColumn("local_time", local_time_col(F.col("ts"), offset_hours))
        .drop("ts", "props")  # SELECT * EXCEPT(timestamp, utc_offset) parity
        .orderBy("event_id")
    )


@query(
    "q31c_stacked_views",
    oracle=(
        "WITH events_ordered AS (SELECT event_id, user_id, event_type, value, "
        "ts + to_minutes(CAST(round(((user_id % 49) - 24) / 2.0 * 60) AS BIGINT)) "
        "AS local_time FROM events), "
        "events_hourly AS (SELECT date_trunc('hour', local_time) AS local_hour, "
        "event_type, COUNT(*) AS n, " + dsum_sql("value", "total")
        + " FROM events_ordered GROUP BY local_hour, event_type) "
        "SELECT local_hour, event_type, n, total FROM events_hourly "
        "WHERE event_type IN ('click', 'view') "
        "ORDER BY local_hour, event_type"
    ),
    description=(
        "Q31c (B8): stacked views — `<table>_ordered` on the base view, an "
        "hourly rollup view on THAT, queried through spark.sql with a "
        "predicate on top. Views are expanded and optimized by Catalyst, "
        "so the event_type filter pushes through both view layers into the "
        "parquet scan (better than the reference's BigQuery result cache: "
        "optimization crosses view boundaries). The hot intermediate view "
        "is cached — the readme's 'views can be cached' claim (readme."
        "md:43-48), Spark-native."
    ),
)
def q31c(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import register_views

    register_views(spark, sf_dir)  # base temp views (catalog layer)
    offset_sql = (
        "ts + make_interval(0, 0, 0, 0, 0, "
        "cast(round(((user_id % 49) - 24) / 2.0 * 60) as int), 0)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW events_ordered AS "
        f"SELECT event_id, user_id, event_type, value, {offset_sql} AS local_time "
        "FROM events"
    )
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW events_hourly AS "
        "SELECT date_trunc('hour', local_time) AS local_hour, event_type, "
        "COUNT(*) AS n, "
        "CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total "
        "FROM events_ordered GROUP BY local_hour, event_type"
    )
    spark.catalog.cacheTable("events_hourly")
    return spark.sql(
        "SELECT local_hour, event_type, n, total FROM events_hourly "
        "WHERE event_type IN ('click', 'view') "
        "ORDER BY local_hour, event_type"
    )


@query(
    "q32_math_funcs",
    oracle=(
        "SELECT l_orderkey, l_linenumber, "
        "abs(l_discount - 0.05) AS abs_disc, "
        "round(l_extendedprice, 1) AS price_r1, "
        "CAST(floor(l_extendedprice) AS BIGINT) AS price_floor, "
        "CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil, "
        "sqrt(l_quantity) AS qty_sqrt, "
        "round(pow(l_quantity, 2), 4) AS qty_sq, "
        "round(ln(l_extendedprice), 6) AS price_ln, "
        "round(exp(l_discount), 6) AS disc_exp, "
        "CAST(sign(l_discount - 0.05) AS BIGINT) AS disc_sign, "
        "l_orderkey % 7 AS key_mod, "
        "greatest(l_tax, l_discount) AS hi, "
        "least(l_tax, l_discount) AS lo "
        "FROM lineitem ORDER BY l_orderkey, l_linenumber"
    ),
    description="Q32: math functions over lineitem (B5 superset).",
)
def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return (
        t["lineitem"]
        .select(
            "l_orderkey",
            "l_linenumber",
            F.abs(F.col("l_discount") - 0.05).alias("abs_disc"),
            F.round("l_extendedprice", 1).alias("price_r1"),
            F.floor("l_extendedprice").cast("long").alias("price_floor"),
            F.ceil("l_extendedprice").cast("long").alias("price_ceil"),
            F.sqrt("l_quantity").alias("qty_sqrt"),
            F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
            F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
            F.round(F.exp("l_discount"), 6).alias("disc_exp"),
            F.signum(F.col("l_discount") - 0.05).cast("long").alias("disc_sign"),
            (F.col("l_orderkey") % 7).alias("key_mod"),
            F.greatest("l_tax", "l_discount").alias("hi"),
            F.least("l_tax", "l_discount").alias("lo"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


def _arr_str(col):  # array<float-ish> -> "i,i,..." of round(x*1e6) bigints
    """Serialize a float array deterministically for cross-engine hashing.

    The driver's value-hash canonicalizes results through pandas, which cannot
    hash ndarray cells — so array outputs must leave the engine as strings.
    Scaled-integer formatting (round(x*1e6) as bigint) sidesteps float-to-text
    divergence between the JVM and DuckDB.
    """
    return F.array_join(
        F.transform(col, lambda x: F.round(x.cast("double") * 1e6).cast("long").cast("string")),
        ",",
    )


def _arr_str_sql(expr: str) -> str:
    return (
        f"array_to_string(list_transform({expr}, "
        "x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)), ',')"
    )


@query(
    "q33_array_funcs",
    oracle=(
        "SELECT vec_id, "
        "CAST(len(embedding) AS BIGINT) AS dim, "
        "CAST(embedding[1] AS DOUBLE) AS first_val, "
        f"{_arr_str_sql('embedding[1:3]')} AS head3, "
        f"{_arr_str_sql('list_transform(embedding, x -> CAST(x AS DOUBLE) * 2.0)')} AS doubled, "
        f"{_arr_str_sql('list_filter(embedding, x -> x > 0)')} AS positives, "
        f"{_arr_str_sql('list_sort(embedding)')} AS sorted_vals, "
        "list_contains(embedding, CAST(0.0 AS FLOAT)) AS has_zero "
        "FROM embeddings ORDER BY vec_id"
    ),
    description=(
        "Q33: array / higher-order functions over embeddings.embedding. "
        "Array outputs serialized to scaled-int strings (driver-hashable)."
    ),
)
def q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    emb = F.col("embedding")
    return (
        t["embeddings"]
        .select(
            "vec_id",
            F.size(emb).cast("long").alias("dim"),
            F.element_at(emb, 1).cast("double").alias("first_val"),
            _arr_str(F.slice(emb, 1, 3)).alias("head3"),
            _arr_str(F.transform(emb, lambda x: x.cast("double") * 2.0)).alias("doubled"),
            _arr_str(F.filter(emb, lambda x: x > 0)).alias("positives"),
            _arr_str(F.sort_array(emb)).alias("sorted_vals"),
            F.array_contains(emb, F.lit(0.0).cast("float")).alias("has_zero"),
        )
        .orderBy("vec_id")
    )


@query(
    "q33b_vector_norm",
    oracle=(
        "SELECT vec_id, CAST(SUM(CAST(round((x * x) * 1e12) AS BIGINT)) AS BIGINT) AS norm_sq_e12 "
        "FROM (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings) "
        "GROUP BY vec_id ORDER BY vec_id"
    ),
    description=(
        "Q33b: exact vector norm via explode + order-independent integer sum. "
        "Each term is the SAME IEEE double on both engines ((x*x)*1e12 — "
        "deterministic fp ops), rounded to an exact BIGINT, so the sum is "
        "bit-stable regardless of partial-aggregation order. A double→DECIMAL "
        "cast is NOT cross-engine stable (1-ulp rounding divergence) — the "
        "similarity kernels reuse this scaled-int pattern instead."
    ),
)
def q33b(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    x = F.col("x").cast("double")
    return (
        t["embeddings"]
        .select("vec_id", F.explode("embedding").alias("x"))
        .select("vec_id", F.round((x * x) * F.lit(1e12)).cast("long").alias("xx"))
        .groupBy("vec_id")
        .agg(F.sum("xx").alias("norm_sq_e12"))
        .orderBy("vec_id")
    )


@query(
    "q34_map_struct_funcs",
    oracle=(
        "SELECT event_id, "
        "CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val, "
        "array_to_string(list_sort(json_keys(props)), ',') AS prop_keys, "
        "event_type AS s_type, value AS s_value "
        "FROM events ORDER BY event_id"
    ),
    description=(
        "Q34: map/struct functions — props parsed to MAP via from_json, "
        "element_at + map_keys; struct built then field-projected."
    ),
)
def q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    m = F.from_json("props", "map<string,bigint>")
    s = F.struct(F.col("event_type").alias("t"), F.col("value").alias("v"))
    return (
        t["events"]
        .select(
            "event_id",
            F.element_at(m, "k").alias("k_val"),
            # sorted + joined: key order out of a JSON parse is document order
            # on both engines, but sorting makes that a non-dependency — and
            # the driver's pandas hasher needs a string, not an ndarray.
            F.array_join(F.array_sort(F.map_keys(m)), ",").alias("prop_keys"),
            s.getField("t").alias("s_type"),
            s.getField("v").alias("s_value"),
        )
        .orderBy("event_id")
    )


@query(
    "q35_conditional_funcs",
    oracle=(
        "SELECT event_id, "
        "CASE WHEN value < 10 THEN 'low' WHEN value < 50 THEN 'mid' ELSE 'high' END AS bucket, "
        "coalesce(nullif(event_type, 'error'), 'none') AS type_or_none, "
        "ifnull(nullif(value, 0.0), -1.0) AS value_or_neg1, "
        "CASE WHEN nullif(value, 0.0) IS NOT NULL THEN 'Y' ELSE 'N' END AS nvl2_flag "
        "FROM events ORDER BY event_id"
    ),
    description="Q35: CASE WHEN / COALESCE / NULLIF / IFNULL / NVL2.",
)
def q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    v = F.col("value")
    return (
        t["events"]
        .select(
            "event_id",
            F.when(v < 10, "low").when(v < 50, "mid").otherwise("high").alias("bucket"),
            F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("none")).alias(
                "type_or_none"
            ),
            F.ifnull(F.nullif(v, F.lit(0.0)), F.lit(-1.0)).alias("value_or_neg1"),
            F.nvl2(F.nullif(v, F.lit(0.0)), F.lit("Y"), F.lit("N")).alias("nvl2_flag"),
        )
        .orderBy("event_id")
    )
