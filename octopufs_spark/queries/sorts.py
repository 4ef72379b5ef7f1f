"""Sort / limit / top-k queries (SURVEY.md §2C).

orderBy+limit compiles to TakeOrderedAndProject — a per-partition
top-k then a driver-side merge of k·p rows, never a full sort — which
is exactly the scale-safe plan for top-k at 100 TB.
(reference analog: sorted-median file sizing, Coalesce.scala:25.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from octopufs_spark.registry import register
from octopufs_spark.tables import load


@register(
    "q_topk_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
""",
)
def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10 largest orders (deterministic tiebreak on orderkey)."""
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "q_sort_multikey",
    oracle="""
SELECT s_suppkey, s_name, s_nationkey, s_acctbal
FROM supplier ORDER BY s_nationkey ASC, s_acctbal DESC
""",
)
def q_sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global sort (range-partitioned exchange + local sort)."""
    return (
        load(spark, sf_dir, "supplier")
        .orderBy(F.asc("s_nationkey"), F.desc("s_acctbal"))
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    )
