"""Scans / sources / sinks (SURVEY.md §2C).

Parquet scan + column-pruned projection (reference exercises these at
Coalesce.scala:37 and src/test/scala/TestUtils.scala:28), and a
partitioned-sink round trip (reference: partitionBy writes at
src/test/scala/TestUtils.scala:30-31).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from octopufs_spark.registry import register
from octopufs_spark.tables import load


@register(
    "q_scan_parquet",
    oracle="SELECT r_regionkey, r_name FROM region",
)
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full parquet scan of region, all columns."""
    return load(spark, sf_dir, "region").select("r_regionkey", "r_name")


@register(
    "q_scan_projection",
    oracle="SELECT l_orderkey, l_partkey, l_quantity FROM lineitem",
)
def q_scan_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned projection: scan should read only 3 columns."""
    return load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")


@register(
    "q_sink_partitioned",
    oracle="""
SELECT EXTRACT(year FROM o_orderdate) AS o_year, COUNT(*) AS cnt
FROM orders GROUP BY 1
""",
)
def q_sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write orders partitioned by year(o_orderdate), re-read, count per year.

    Partitioned write + partition-pruned re-read (reference pattern:
    src/test/scala/TestUtils.scala:30-31 partitionBy saveAsTable). The
    round-trip is lossless, so the re-read counts hash-match an oracle
    computed straight from the source table.
    """
    out = tempfile.mkdtemp(prefix="octopufs_sink_")
    orders = load(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("int")
    )
    orders.write.mode("overwrite").partitionBy("o_year").parquet(out)
    back = spark.read.parquet(out)
    return (
        back.groupBy(F.col("o_year").cast("long").alias("o_year"))
        .agg(F.count("*").alias("cnt"))
    )
