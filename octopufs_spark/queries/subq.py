"""Correlated-subquery and argmin/argmax SQL surface: EXISTS / NOT
EXISTS, correlated scalar subqueries, max_by/min_by/count_if, and
calendar-interval arithmetic (date_trunc / last_day / month spans).

These are Catalyst features, not new operators: correlated EXISTS
decorrelates to semi/anti joins, scalar subqueries to left outer
aggregate joins — the point of registering them is to pin that the
decorrelated plans stay broadcast-friendly and hash-compare against a
second engine running the IDENTICAL SQL.

Registers after trainprep/curation (queries/__init__.py) to respect
the fresh-first driver-sample ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from octopufs_spark.registry import register
from octopufs_spark.tables import load

_EXISTS_SQL = """
WITH idle AS (
  SELECT c_nationkey, COUNT(*) AS n_idle
  FROM {customer} c
  WHERE NOT EXISTS (SELECT 1 FROM {orders} o WHERE o.o_custkey = c.c_custkey)
  GROUP BY c_nationkey
), big AS (
  SELECT c_nationkey, COUNT(*) AS n_big
  FROM {customer} c
  WHERE EXISTS (SELECT 1 FROM {orders} o
                WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
  GROUP BY c_nationkey
)
SELECT n.n_name,
       CAST(COALESCE(i.n_idle, 0) AS BIGINT) AS idle_customers,
       CAST(COALESCE(b.n_big, 0) AS BIGINT) AS big_spenders
FROM {nation} n
LEFT JOIN idle i ON i.c_nationkey = n.n_nationkey
LEFT JOIN big b ON b.c_nationkey = n.n_nationkey
"""


@register(
    "q_sql_exists_correlated",
    oracle=_EXISTS_SQL.format(customer="customer", orders="orders", nation="nation"),
)
def q_sql_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS per nation: customers with no
    orders at all vs customers with at least one >150k order. Catalyst
    decorrelates both subqueries into a left-anti and a left-semi hash
    join on o_custkey — the scale-safe shape (one shuffle each on the
    join key, orders never materialized per-customer). Identical SQL
    runs as the DuckDB oracle."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("_ex_customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("_ex_orders")
    load(spark, sf_dir, "nation").createOrReplaceTempView("_ex_nation")
    return spark.sql(
        _EXISTS_SQL.format(customer="_ex_customer", orders="_ex_orders", nation="_ex_nation")
    )


_SCALAR_SUBQ_DUCK = """
SELECT n.n_name,
       CAST((SELECT COUNT(*) FROM customer c
             WHERE c.c_nationkey = n.n_nationkey) AS BIGINT) AS n_cust,
       COALESCE((SELECT MAX(c.c_acctbal) FROM customer c
                 WHERE c.c_nationkey = n.n_nationkey), -1.0) AS top_bal,
       CAST(FLOOR((SELECT COUNT(*) FROM customer c
                   WHERE c.c_nationkey = n.n_nationkey) * 1000.0
                  / (SELECT COUNT(*) FROM customer)) AS BIGINT) AS share_milli
FROM nation n
"""


@register("q_sql_scalar_subquery", oracle=_SCALAR_SUBQ_DUCK)
def q_sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subqueries, correlated and not: per-nation customer count
    and max balance (correlated aggregates over customer) plus an
    uncorrelated global-count denominator turned into an integer
    per-mille share. Catalyst decorrelates each scalar into a grouped
    customer aggregate broadcast into a left outer join (observed plan:
    three aggregate subtrees — Spark 4 does not CSE the repeated count
    subquery — each a narrow 1-2 column scan with map-side partial
    aggregation, so the per-nation loop a naive executor would run
    never happens), and the uncorrelated count into a 1-row
    single-partition aggregate (bounded by definition). share_milli
    uses BIGINT floor division on both sides (Spark `DIV`; the oracle
    spells FLOOR per the DuckDB rounding-cast gotcha)."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("_ss_customer")
    load(spark, sf_dir, "nation").createOrReplaceTempView("_ss_nation")
    return spark.sql(
        """
SELECT n.n_name,
       CAST((SELECT COUNT(*) FROM _ss_customer c
             WHERE c.c_nationkey = n.n_nationkey) AS BIGINT) AS n_cust,
       COALESCE((SELECT MAX(c.c_acctbal) FROM _ss_customer c
                 WHERE c.c_nationkey = n.n_nationkey), -1.0) AS top_bal,
       CAST((SELECT COUNT(*) FROM _ss_customer c
             WHERE c.c_nationkey = n.n_nationkey) * 1000
            DIV (SELECT COUNT(*) FROM _ss_customer) AS BIGINT) AS share_milli
FROM _ss_nation n
"""
    )


@register(
    "q_agg_arg_extremes",
    oracle="""
WITH k AS (
  SELECT c_mktsegment, c_name, c_acctbal,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) * 10000000 + c_custkey AS ord_key
  FROM customer
)
SELECT c_mktsegment,
       arg_max(c_name, ord_key) AS richest,
       arg_min(c_name, ord_key) AS poorest,
       CAST(count_if(c_acctbal < 0.0) AS BIGINT) AS n_overdrawn,
       CAST(COUNT(*) AS BIGINT) AS n_cust
FROM k GROUP BY c_mktsegment
""",
)
def q_agg_arg_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmin/argmax aggregates: per market segment, the customer name
    at the maximum and minimum account balance (max_by / min_by) plus a
    count_if. The ordering key packs (balance cents, custkey) into one
    BIGINT so ties on balance break deterministically by key — without
    that, max_by's tie choice is engine-defined and the hash compare
    would be flaky. The 10^7 stride keeps the packing collision-free up
    to 10M customers (~sf66). Single hash aggregate, map-side
    combinable: max_by carries one (key, value) pair per partition,
    the same cost as MAX at any scale."""
    cust = load(spark, sf_dir, "customer")
    k = cust.select(
        "c_mktsegment",
        "c_name",
        "c_acctbal",
        (F.round(F.col("c_acctbal") * 100).cast("long") * 10000000 + F.col("c_custkey")).alias(
            "ord_key"
        ),
    )
    return k.groupBy("c_mktsegment").agg(
        F.expr("max_by(c_name, ord_key)").alias("richest"),
        F.expr("min_by(c_name, ord_key)").alias("poorest"),
        F.expr("count_if(c_acctbal < 0.0)").cast("long").alias("n_overdrawn"),
        F.count("*").alias("n_cust"),
    )


@register(
    "q_scalar_interval",
    oracle="""
SELECT CAST(date_trunc('quarter', o_orderdate) AS DATE) AS qtr,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(datediff('day', o_orderdate, last_day(o_orderdate))) AS BIGINT) AS days_to_eom,
       CAST(MAX(year(o_orderdate) * 12 + month(o_orderdate))
            - MIN(year(o_orderdate) * 12 + month(o_orderdate)) AS BIGINT) AS month_span,
       CAST(SUM(CASE WHEN month(o_orderdate)
                        = month(CAST(date_trunc('quarter', o_orderdate) AS DATE))
                THEN 1 ELSE 0 END) AS BIGINT) AS first_month_orders
FROM orders GROUP BY 1
""",
)
def q_scalar_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic surface: quarter bucketing (date_trunc),
    end-of-month distance (last_day + datediff), month-index spans, and
    first-month-of-quarter classification — all integer day/month
    counts, so the quarterly report hashes identically across engines.
    One scan, one ~30-key aggregate; every expression is a JVM date
    intrinsic inside whole-stage codegen (no Python, no UDF)."""
    o = load(spark, sf_dir, "orders").select("o_orderdate")
    qtr = F.date_trunc("quarter", F.col("o_orderdate")).cast("date")
    mon_idx = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    rows = o.select(
        qtr.alias("qtr"),
        F.datediff(F.last_day("o_orderdate"), F.col("o_orderdate")).alias("eom_gap"),
        mon_idx.alias("mon_idx"),
        (F.month("o_orderdate") == F.month(qtr)).alias("is_first_month"),
    )
    return rows.groupBy("qtr").agg(
        F.count("*").alias("n_orders"),
        F.sum("eom_gap").cast("long").alias("days_to_eom"),
        (F.max("mon_idx") - F.min("mon_idx")).cast("long").alias("month_span"),
        F.sum(F.when(F.col("is_first_month"), 1).otherwise(0))
        .cast("long")
        .alias("first_month_orders"),
    )
