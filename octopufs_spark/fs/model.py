"""Value types of the filesystem toolkit.

Mirrors the reference's case classes (reference: fs/FsElement.scala:9,
fs/Paths.scala:8, fs/FsOperationResult.scala:8) — plus DataFrame
schemas for the inventory representation, since at 100 TB a listing is
itself a dataset.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import BooleanType, LongType, StringType, StructField, StructType

INVENTORY_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("is_dir", BooleanType(), False),
        StructField("byte_size", LongType(), False),
    ]
)

RESULT_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("success", BooleanType(), False),
    ]
)


@dataclass(frozen=True)
class FsElement:
    """One file or directory (reference: fs/FsElement.scala:9)."""

    path: str
    is_dir: bool
    byte_size: int


@dataclass(frozen=True)
class Paths:
    """Source→target pair for copy/move (reference: fs/Paths.scala:8)."""

    source_path: str
    target_path: str


@dataclass(frozen=True)
class FsOperationResult:
    """Per-path outcome (reference: fs/FsOperationResult.scala:8)."""

    path: str
    success: bool


def inventory_df(spark: SparkSession, elements: list[FsElement]) -> DataFrame:
    """Materialize a listing as the inventory DataFrame."""
    rows = [(e.path, e.is_dir, e.byte_size) for e in elements]
    return spark.createDataFrame(rows, INVENTORY_SCHEMA)
