"""Set-operation queries (SURVEY.md §2C).

UNION ALL / INTERSECT / EXCEPT. EXCEPT carries the semantics of the
reference's folder diff (reference: Delta.scala:47-48).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from octopufs_spark.registry import register
from octopufs_spark.tables import load


@register(
    "q_set_union",
    oracle="""
SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
UNION ALL
SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '2-HIGH'
""",
)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two filtered slices (reference: union reduce at
    metastore/package.scala:59)."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT")
    high = o.where(F.col("o_orderpriority") == "2-HIGH")
    return urgent.unionAll(high)


@register(
    "q_set_intersect",
    oracle="""
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey AS c_custkey FROM orders
""",
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): BUILDING-segment customers that have orders."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    building = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    with_orders = o.select(F.col("o_custkey").alias("c_custkey"))
    return building.intersect(with_orders)


@register(
    "q_set_except",
    oracle="""
SELECT c_custkey FROM customer
EXCEPT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
""",
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): custkeys without urgent orders — Delta.getDelta shape."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.subtract(o)  # subtract == EXCEPT DISTINCT


@register(
    "q_set_intersect_all",
    oracle="""
SELECT l_suppkey, l_returnflag FROM lineitem WHERE l_quantity <= 25
INTERSECT ALL
SELECT l_suppkey, l_returnflag FROM lineitem WHERE l_quantity >= 20
""",
)
def q_set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset intersection (each row kept
    min(count_left, count_right) times), the bag semantics plain
    INTERSECT's dedup destroys. Spark plans it as a count-matching
    aggregate, one shuffle per side."""
    li = load(spark, sf_dir, "lineitem").select("l_suppkey", "l_returnflag")
    a = li.where(F.col("l_quantity") <= 25)
    b = li.where(F.col("l_quantity") >= 20)
    return a.intersectAll(b)


@register(
    "q_set_except_all",
    oracle="""
SELECT l_suppkey, l_returnflag FROM lineitem WHERE l_quantity <= 25
EXCEPT ALL
SELECT l_suppkey, l_returnflag FROM lineitem WHERE l_quantity >= 20
""",
)
def q_set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference (left multiplicity minus right
    multiplicity, floored at zero); the reference's folder-diff is the
    distinct special case (Delta.scala:47-48)."""
    li = load(spark, sf_dir, "lineitem").select("l_suppkey", "l_returnflag")
    a = li.where(F.col("l_quantity") <= 25)
    b = li.where(F.col("l_quantity") >= 20)
    return a.exceptAll(b)
