"""Tree diff + rsync-style synchronize.

Rebuild of the reference's Delta (reference: Delta.scala:40-50): list
both trees, strip prefixes, set-difference on (relative path, size) in
both directions. This is the reference's one truly relational operator
— expressed here as DataFrame anti-joins, which is exactly how it
scales: at 100 TB the two listings are themselves large datasets, and
an anti-join shuffles on (rel_path, byte_size) instead of building
driver-side sets.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from octopufs_spark.fs.core import get_filesystem, list_tree
from octopufs_spark.fs.distributed import copy_files
from octopufs_spark.fs.local import delete_paths
from octopufs_spark.fs.model import Paths, inventory_df

log = logging.getLogger(__name__)


def _rel_inventory(spark: SparkSession, uri: str) -> DataFrame:
    """Inventory DataFrame with prefix-stripped relative paths (files only)."""
    from octopufs_spark.fs.model import FsElement

    _, root = get_filesystem(uri)
    elements = [
        FsElement(e.path[len(root) + 1 :], False, e.byte_size)
        for e in list_tree(uri)
        if not e.is_dir
    ]
    df = inventory_df(spark, elements)
    return df.select(F.col("path").alias("rel_path"), F.col("byte_size"))


def get_delta(
    spark: SparkSession, src_uri: str, trg_uri: str
) -> tuple[list[str], list[str]]:
    """(missing_in_target, only_in_target) as relative paths
    (reference: getDelta, Delta.scala:40-50)."""
    src = _rel_inventory(spark, src_uri)
    trg = _rel_inventory(spark, trg_uri)
    on = ["rel_path", "byte_size"]
    missing = [r.rel_path for r in src.join(trg, on, "left_anti").collect()]
    extra = [r.rel_path for r in trg.join(src, on, "left_anti").collect()]
    return missing, extra


def synchronize(
    spark: SparkSession, src_uri: str, trg_uri: str, task_count: int = -1
) -> None:
    """Make target mirror source: delete extras, copy missing
    (reference: synchronize, Delta.scala:25-32)."""
    missing, extra = get_delta(spark, src_uri, trg_uri)
    src_prefix = src_uri.rstrip("/")
    trg_prefix = trg_uri.rstrip("/")
    if extra:
        delete_paths([f"{trg_prefix}/{rel}" for rel in extra])
    if missing:
        copy_files(
            spark,
            [Paths(f"{src_prefix}/{rel}", f"{trg_prefix}/{rel}") for rel in missing],
            task_count,
        )
    log.info("synchronize: copied %d, deleted %d", len(missing), len(extra))
