"""Window-function queries (SURVEY.md §2C).

Ranking, running aggregates with explicit frames, and lag. Order-by
keys always include a unique tiebreaker (orderkey / event_id) so
results are deterministic across engines. Running sums go through the
decimal-exact path — a ROWS frame fixes the accumulation order, but
decimal keeps it order-independent anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from octopufs_spark.queries.common import DEC
from octopufs_spark.registry import register
from octopufs_spark.tables import load


@register(
    "q_window_rank",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
""",
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by totalprice (deterministic tiebreak)."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        load(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "q_window_running",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
FROM orders
""",
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-customer total with an explicit ROWS frame."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("running_total"),
    )


@register(
    "q_window_lag",
    oracle="""
SELECT event_id, user_id, ts,
       epoch_ms(CAST(ts AS TIMESTAMP)) - LAG(epoch_ms(CAST(ts AS TIMESTAMP))) OVER (
         PARTITION BY user_id ORDER BY ts, event_id) AS gap_ms
FROM events
""",
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap in milliseconds via LAG."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ; unix_millis needs TIMESTAMP (identity cast
    # under the session's pinned UTC timezone).
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    return load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        (ms - F.lag(ms).over(w)).alias("gap_ms"),
    )


@register(
    "q_window_range_time",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey
         ORDER BY date_diff('day', DATE '1970-01-01', o_orderdate)
         RANGE BETWEEN 90 PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS trailing_90d
FROM orders
""",
)
def q_window_range_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-90-day spend per customer via a time-RANGE frame — the
    value-based frame ROWS windows can't express (peers at the same day
    aggregate together; sparse order dates still bound by calendar
    time, not row count).

    Both engines order by integer days-since-epoch so the RANGE
    arithmetic is exact; the decimal sum keeps the result
    order-independent. One shuffle on the partition key."""
    day = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
    w = Window.partitionBy("o_custkey").orderBy(day.cast("long")).rangeBetween(-90, 0)
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("trailing_90d"),
    )


@register(
    "q_window_percent_cume",
    oracle="""
SELECT s_suppkey, s_acctbal,
       ROUND(PERCENT_RANK() OVER (ORDER BY s_acctbal, s_suppkey), 9) AS pct_rank,
       ROUND(CUME_DIST() OVER (ORDER BY s_acctbal, s_suppkey), 9) AS cume
FROM supplier
""",
)
def q_window_percent_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENT_RANK and CUME_DIST over a deterministic total order
    (acctbal with suppkey tiebreak), computed WITHOUT the
    single-partition WindowExec a bare ``Window.orderBy`` plans (at
    100× the table serializes through one core). The total order makes
    every row its own peer group, so both functions are pure rank
    arithmetic over a distributed global row number
    (scale.global_row_number: range partition → parallel local ranks →
    broadcast prefix offsets): PERCENT_RANK = (rn-1)/(n-1),
    CUME_DIST = rn/n. Rounded 9 to absorb engines' division-order
    difference."""
    from octopufs_spark.scale import global_row_number

    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    ranked, n = global_row_number(supp, ["s_acctbal", "s_suppkey"])
    return ranked.select(
        "s_suppkey",
        "s_acctbal",
        F.round((F.col("_rn") - 1) / F.lit(max(n - 1, 1)), 9).alias("pct_rank"),
        F.round(F.col("_rn") / F.lit(n), 9).alias("cume"),
    )


@register(
    "q_window_ignore_nulls",
    oracle="""
WITH base AS (
  SELECT o_custkey, o_orderkey, o_orderdate,
         CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_totalprice END AS px
  FROM orders
)
SELECT o_custkey, o_orderkey,
       LAST_VALUE(px IGNORE NULLS) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS last_known_price
FROM base
""",
)
def q_window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window semantics: carry the last known (non-null)
    price forward per customer — the gap-fill primitive for sparse
    observations (a third of prices nulled deterministically). One
    customer-key exchange, one sort."""
    o = load(spark, sf_dir, "orders")
    base = o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.when(F.col("o_orderkey") % 3 == 0, None)
        .otherwise(F.col("o_totalprice"))
        .alias("px"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return base.select(
        "o_custkey",
        "o_orderkey",
        F.last("px", ignorenulls=True).over(w).alias("last_known_price"),
    )
