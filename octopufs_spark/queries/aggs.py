"""Aggregation queries (SURVEY.md §2C).

Hash aggregates with map-side partial combine; sums/avgs use the
decimal-exact normalization from common.py so Spark and the DuckDB
oracle agree bit-for-bit (the reference's own tests assert exactly
these sum/count invariants — reference: src/test/scala/DeltaTest.scala:18-21,
TestUtils.scala:67-69).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from octopufs_spark.queries.common import DEC, SQL_DAVG, SQL_DSUM, SQL_REVENUE, davg, dsum, revenue_col
from octopufs_spark.registry import register
from octopufs_spark.tables import load


@register(
    "q_agg_sum_group",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {SQL_DSUM.format(col="l_quantity", alias="sum_qty")},
       {SQL_DSUM.format(col="l_extendedprice", alias="sum_base_price")},
       CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS sum_disc_price,
       {SQL_DAVG.format(col="l_quantity", alias="avg_qty")},
       {SQL_DAVG.format(col="l_extendedprice", alias="avg_price")},
       COUNT(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
)
def q_agg_sum_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the flagship aggregate."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_base_price"),
        F.sum(revenue_col()).cast("double").alias("sum_disc_price"),
        davg("l_quantity", "avg_qty"),
        davg("l_extendedprice", "avg_price"),
        F.count("*").alias("count_order"),
    )


@register(
    "q_agg_count_distinct",
    oracle="""
SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS distinct_parts
FROM lineitem GROUP BY l_returnflag
""",
)
def q_agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct count per group (reference asserts distinct counts,
    src/test/scala/TestUtils.scala:67-69)."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("distinct_parts"))
    )


@register(
    "q_agg_approx_distinct",
    oracle="""
SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       CAST(ABS(CAST(approx_count_distinct(l_partkey) AS DOUBLE)
                / COUNT(DISTINCT l_partkey) - 1.0) <= 0.05 AS BOOLEAN)
         AS within_tolerance
FROM lineitem
""",
)
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — scale path for distinct
    counting. Sketch estimates are engine-specific, so the checkable
    contract is the tolerance, not the estimate: each engine asserts
    its own HLL lands within 5% of its own exact count (both run in
    one pass) and emits (exact_parts, within_tolerance), which hashes
    deterministically. Spark's rsd=0.02 and DuckDB's default HLL are
    both far inside 5% at every fixture scale."""
    agg = load(spark, sf_dir, "lineitem").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
    )
    return agg.select(
        "exact_parts",
        (
            F.abs(F.col("approx_parts").cast("double") / F.col("exact_parts") - 1.0)
            <= 0.05
        ).alias("within_tolerance"),
    )


@register(
    "q_agg_having",
    oracle="""
SELECT c_nationkey, COUNT(*) AS num_customers
FROM customer GROUP BY c_nationkey HAVING COUNT(*) > 5
""",
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group + HAVING-style post-aggregation filter."""
    return (
        load(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("num_customers"))
        .where(F.col("num_customers") > 5)
    )


@register(
    "q_agg_rollup",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority,
       {SQL_DSUM.format(col="o_totalprice", alias="sum_price")},
       COUNT(*) AS cnt
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (status → status+priority → grand total)."""
    return (
        load(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(dsum("o_totalprice", "sum_price"), F.count("*").alias("cnt"))
    )


@register(
    "q_agg_cube",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority,
       {SQL_DSUM.format(col="o_totalprice", alias="sum_price")},
       COUNT(*) AS cnt
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations."""
    return (
        load(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(dsum("o_totalprice", "sum_price"), F.count("*").alias("cnt"))
    )


@register(
    "q_agg_stats",
    oracle="""
SELECT CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
       CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
       SQRT((CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity))
            / (COUNT(l_quantity) - 1)) AS stddev_qty
FROM lineitem
""",
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max/avg/stddev of l_quantity.

    stddev is computed from exact decimal sums (sum, sum-of-squares)
    with the identical double expression on both engines, so the result
    is bit-stable — native stddev_samp implementations differ in
    accumulation order across engines.
    """
    li = load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast(DEC)
    sum_q = F.sum(q).cast("double")
    sum_q2 = F.sum(q * q).cast("double")
    n = F.count("l_quantity")
    return li.agg(
        F.min("l_quantity").cast("double").alias("min_qty"),
        F.max("l_quantity").cast("double").alias("max_qty"),
        (sum_q / n).alias("avg_qty"),
        F.sqrt((sum_q2 - sum_q * sum_q / n) / (n - F.lit(1))).alias("stddev_qty"),
    )


@register(
    "q_agg_corr",
    oracle="""
SELECT l_returnflag, ROUND(corr_raw, 12) AS corr_qty_price FROM (
SELECT l_returnflag,
       (COUNT(*) * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE))
       / (SQRT(COUNT(*) * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE))
          * SQRT(COUNT(*) * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 - CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)))
       AS corr_raw
FROM lineitem GROUP BY l_returnflag
)
""",
)
def q_agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation from first principles: exact decimal sums
    (sx, sy, sxy, sxx, syy) combined with the identical double formula
    on both engines — native corr() implementations differ in
    accumulation order. Rounded to 12 digits: decimal->double casts of
    wide sums can differ by 1 ulp between engines (DuckDB's cast is not
    always correctly rounded), which is noise for a [-1,1] statistic."""
    li = load(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast(DEC)
    y = F.col("l_extendedprice").cast(DEC)
    n = F.count("*")
    sx = F.sum(x).cast("double")
    sy = F.sum(y).cast("double")
    sxy = F.sum(x * y).cast("double")
    sxx = F.sum(x * x).cast("double")
    syy = F.sum(y * y).cast("double")
    return li.groupBy("l_returnflag").agg(
        F.round(
            (n * sxy - sx * sy) / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)), 12
        ).alias("corr_qty_price")
    )
