"""Scalar-function queries (SURVEY.md §2C).

String, date, math, CASE, JSON and array functions — all JVM-side
built-ins (whole-stage codegen), no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from octopufs_spark.registry import register
from octopufs_spark.tables import load


@register(
    "q_scalar_string",
    oracle="""
SELECT c_custkey,
       UPPER(c_name) AS u_name,
       SUBSTR(c_name, 1, 5) AS name5,
       CAST(LENGTH(c_name) AS BIGINT) AS name_len,
       TRIM(c_name) AS t_name,
       c_name || '-' || c_mktsegment AS tagged
FROM customer
""",
)
def q_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper / substr / length / trim / concat over c_name."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("u_name"),
        F.substring("c_name", 1, 5).alias("name5"),
        F.length("c_name").cast("long").alias("name_len"),
        F.trim(F.col("c_name")).alias("t_name"),
        F.concat_ws("-", "c_name", "c_mktsegment").alias("tagged"),
    )


@register(
    "q_scalar_date",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(month(o_orderdate) AS BIGINT) AS o_month,
       CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS month_start,
       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_95
FROM orders
""",
)
def q_scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year / month / date_trunc / datediff over o_orderdate."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("o_year"),
        F.month("o_orderdate").cast("long").alias("o_month"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_95"),
    )


@register(
    "q_scalar_math",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ABS(l_extendedprice - 1000.0) AS abs_dev,
       CAST(FLOOR(l_extendedprice) AS BIGINT) AS floor_price,
       CAST(CEIL(l_extendedprice) AS BIGINT) AS ceil_price,
       CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS round_price,
       l_extendedprice * (1 - l_discount) AS disc_price
FROM lineitem
""",
)
def q_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs / floor / ceil / round + arithmetic expression.

    round goes through DECIMAL so half-up behavior matches across
    engines; floor/ceil normalize to BIGINT; disc_price is the same
    IEEE expression on both sides.
    """
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 1000.0).alias("abs_dev"),
        F.floor("l_extendedprice").cast("long").alias("floor_price"),
        F.ceil("l_extendedprice").cast("long").alias("ceil_price"),
        F.round(F.col("l_extendedprice").cast("decimal(18,2)"), 1).cast("double").alias("round_price"),
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("disc_price"),
    )


@register(
    "q_scalar_case",
    oracle="""
SELECT c_custkey, c_acctbal,
       CASE WHEN c_acctbal < 0 THEN 'negative'
            WHEN c_acctbal < 1000 THEN 'low'
            WHEN c_acctbal < 5000 THEN 'mid'
            ELSE 'high' END AS bal_band
FROM customer
""",
)
def q_scalar_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN banding of account balances."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        "c_acctbal",
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 1000, "low")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("bal_band"),
    )


@register(
    "q_scalar_json",
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
FROM events
""",
)
def q_scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events.props string column."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return e.select(
        "event_id",
        k.alias("k_str"),
        k.cast("long").alias("k_val"),
    )


@register(
    "q_scalar_array",
    oracle="""
SELECT vec_id, label,
       CAST(len(embedding) AS BIGINT) AS dim,
       CAST(embedding[1] AS DOUBLE) AS first_elem,
       CAST(embedding[len(embedding)] AS DOUBLE) AS last_elem
FROM embeddings
""",
)
def q_scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array size + element access over the embedding column.

    float32 elements are cast to double (exact widening) on both sides;
    DuckDB lists are 1-indexed, Spark arrays 0-indexed.
    """
    e = load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").cast("long").alias("dim"),
        F.col("embedding").getItem(0).cast("double").alias("first_elem"),
        F.element_at("embedding", -1).cast("double").alias("last_elem"),
    )


@register(
    "q_scalar_higher_order",
    oracle="""
SELECT doc_id,
       len(list_filter(string_split(text, ' '), x -> len(x) > 4)) AS n_long_words,
       COALESCE(array_to_string(list_sort(list_transform(list_filter(string_split(text, ' '),
                                                                     x -> len(x) > 6),
                                                         x -> upper(x))), ' '),
                '') AS long_upper,
       CAST(list_sum(list_transform(string_split(text, ' '), x -> len(x))) AS BIGINT)
         AS total_chars
FROM documents WHERE doc_id < 200
""",
)
def q_scalar_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions — transform/filter/aggregate
    lambdas evaluated JVM-side (DuckDB twins: list_transform /
    list_filter / list_sum). Array results are sorted then joined to a
    single string: order-independent AND hashable by harnesses that
    canonicalize via pandas sort_values (raw list cells are not)."""
    words = F.split(F.col("text"), " ")
    return (
        load(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 200)
        .select(
            "doc_id",
            F.size(F.filter(words, lambda x: F.length(x) > 4)).alias("n_long_words"),
            F.array_join(
                F.sort_array(
                    F.transform(
                        F.filter(words, lambda x: F.length(x) > 6),
                        lambda x: F.upper(x),
                    )
                ),
                " ",
            ).alias("long_upper"),
            F.aggregate(
                F.transform(words, lambda x: F.length(x).cast("long")),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("total_chars"),
        )
    )
