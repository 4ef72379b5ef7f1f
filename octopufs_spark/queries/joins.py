"""Join queries (SURVEY.md §2C).

Inner / broadcast / outer / semi / anti / theta / multi-way joins.
The anti-join is the relational heart of the reference's tree-diff
(reference: Delta.scala:47-48 — set difference both directions).

Scale notes: small dimensions (region, nation) are explicitly
broadcast; fact-fact joins shuffle on their keys and rely on AQE for
skew handling. At 100 TB the orders⋈customer join is a sort-merge
shuffle on the key — co-locate by bucketing both tables on custkey to
eliminate it entirely (octopufs_spark/scale.py write_bucketed; the
zero-Exchange join is asserted in tests/test_scale.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from octopufs_spark.queries.common import SQL_REVENUE, revenue_col
from octopufs_spark.registry import register
from octopufs_spark.tables import load


@register(
    "q_join_inner",
    oracle="""
SELECT o.o_orderkey, c.c_name, o.o_totalprice
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
""",
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join orders ⋈ customer on custkey."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_name", "o_totalprice"
    )


@register(
    "q_join_broadcast",
    oracle="""
SELECT n.n_nationkey, n.n_name, r.r_name
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
""",
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-hash join: tiny region dim shipped to every task."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name", "r_name"
    )


@register(
    "q_join_left",
    oracle="""
SELECT c.c_custkey, c.c_name, o.o_orderkey
FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
""",
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join: customers kept even with no orders."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey"
    )


@register(
    "q_join_semi",
    oracle="""
SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers having at least one order."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi")


@register(
    "q_join_anti",
    oracle="""
SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
FROM customer c WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
""",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no urgent orders.

    Same semantics as the reference's folder diff
    (reference: Delta.scala:47-48, set-difference of listings).
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti")


@register(
    "q_join_theta_range",
    oracle="""
SELECT l.l_orderkey, l.l_linenumber, p.p_partkey, l.l_extendedprice, p.p_retailprice
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_extendedprice > p.p_retailprice * 10
""",
)
def q_join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join with a theta residual predicate (range comparison)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .where(F.col("l_extendedprice") > F.col("p_retailprice") * 10)
        .select("l_orderkey", "l_linenumber", "p_partkey", "l_extendedprice", "p_retailprice")
    )


@register(
    "q_join_multi",
    oracle=f"""
SELECT n.n_name,
       CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS revenue,
       COUNT(*) AS nrows
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
)
def q_join_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way join lineitem ⋈ orders ⋈ customer ⋈ nation → revenue per nation.

    nation is broadcast; the two fact joins shuffle on their keys with
    map-side partial aggregation after.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(revenue_col()).cast("double").alias("revenue"),
            F.count("*").alias("nrows"),
        )
    )
