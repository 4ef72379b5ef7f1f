"""Cross-engine numeric normalization helpers.

The driver hash-compares Spark results against DuckDB. Double-precision
aggregation order differs between engines, so naive SUM(double) can
drift in the last bits. The fixture money/quantity columns are
2-decimal values, so we sum them as DECIMAL(18,2) (exact, order
independent) and cast the final result to DOUBLE — bit-identical in
both engines. Averages are expressed as exact-decimal-sum / count in
double, again bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def dsum(col: str | Column, alias: str) -> Column:
    """Exact SUM of a 2-decimal double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: str | Column, alias: str) -> Column:
    """Exact-sum / count average of a 2-decimal column, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def revenue_col() -> Column:
    """l_extendedprice * (1 - l_discount), exact in DECIMAL (scale 4)."""
    return F.col("l_extendedprice").cast(DEC) * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))


# SQL fragments for DuckDB oracles — keep in lockstep with the helpers.
SQL_DSUM = "CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE) AS {alias}"
SQL_DAVG = "CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE) / COUNT({col}) AS {alias}"
SQL_REVENUE = "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
