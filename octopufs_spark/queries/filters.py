"""Filter / predicate queries (SURVEY.md §2C).

Date-range, IN-list, LIKE and compound boolean predicates — the filter
shapes the reference's own fixtures exercise
(reference: src/test/scala/TestUtils.scala:28,37,41,56,71-72). All are
plain `where` clauses so Catalyst pushes them into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from octopufs_spark.registry import register
from octopufs_spark.tables import load


@register(
    "q_filter_range",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_shipdate
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.02 AND 0.06
""",
)
def q_filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-range + numeric BETWEEN filter, pushed down to the scan."""
    li = load(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.02, 0.06)
    ).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"
    )


@register(
    "q_filter_in",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
""",
)
def q_filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list filter (reference: isin at src/test/scala/TestUtils.scala:71-72)."""
    return load(spark, sf_dir, "orders").where(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )


@register(
    "q_filter_like",
    oracle="SELECT p_partkey, p_name, p_brand, p_type, p_size FROM part WHERE p_type LIKE '%AND%'",
)
def q_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE substring filter (reference: partition substring match,
    metastore/package.scala:30)."""
    return (
        load(spark, sf_dir, "part")
        .where(F.col("p_type").like("%AND%"))
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
    )


@register(
    "q_filter_compound",
    oracle="""
SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
FROM customer WHERE c_acctbal > 0 AND c_mktsegment <> 'BUILDING'
""",
)
def q_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound boolean predicate."""
    return load(spark, sf_dir, "customer").where(
        (F.col("c_acctbal") > 0) & (F.col("c_mktsegment") != "BUILDING")
    )
