"""Loaders for the driver-generated parquet fixtures (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file (or directory) per table under
``{sf_dir}/{name}.parquet``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    # Deterministic semantics under ANY caller's session (the
    # correctness driver builds its own): timestamps must render as the
    # parquet wall-clock values (what DuckDB sees), so pin UTC.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark rejects
        # unless nanosAsLong is set. Sessions built by get_spark have it;
        # set it here too.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # events.ts is parquet TIMESTAMP(NANOS): read as long nanos
        # (spark.sql.legacy.parquet.nanosAsLong) and truncated to µs —
        # the same floor DuckDB applies casting TIMESTAMP_NS → TIMESTAMP.
        import pyspark.sql.functions as F

        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz"))
    return df
