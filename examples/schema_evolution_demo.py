"""Schema-evolution / table-maintenance demo — the no-rewrite
lakehouse lifecycle in one run:

1. seed a partitioned manifest table (hive layout, zone maps) and
   MOR-delete a key range (delete vector, no files touched),
2. rename ALL columns metadata-only — including the partition column
   and the delete-vector key column — then append under the new names
   (ZERO data files rewritten by the renames),
3. show the unified read, the still-applying vector, and partition
   pruning resolving the renamed column through its alias chain,
4. AS OF TIMESTAMP time travel to each earlier state,
5. zero-copy CLONE (hard links), diverge the clone, fully rewrite and
   vacuum the SOURCE — the clone is unaffected,
6. RESTORE the source to its pre-rename state and read DESCRIBE
   HISTORY.

Run: python examples/schema_evolution_demo.py
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from octopufs_spark.manifest import (  # noqa: E402
    ManifestTable,
    clone_table,
    compact_and_commit,
    write_and_commit,
)
from octopufs_spark.merge import delete_where_mor  # noqa: E402
from octopufs_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark()
    work = tempfile.mkdtemp(prefix="schevo_demo_")
    table = ManifestTable(f"{work}/events")

    def rows(lo: int, n: int):
        return spark.range(lo, lo + n).select(
            F.col("id"),
            (F.col("id") % 4).cast("string").alias("shard"),
            (F.col("id") * 2).alias("v"),
        )

    # 1. seed + MOR delete (vector keyed on `id`, files untouched)
    write_and_commit(rows(0, 4000).repartition("shard"), table,
                     partition_by=["shard"], stats=True)
    delete_where_mor(spark, table, spark.range(0, 400).select("id"), keys=["id"])
    assert table.read(spark).count() == 3600
    ts_before_rename = table.commit_timestamp(table.latest_version())

    # 2. metadata-only renames: partition column AND vector key column
    files_before = table.read_manifest().files
    table.rename_column("id", "event_id")
    table.rename_column("shard", "bucket")
    table.rename_column("v", "value")
    assert table.read_manifest().files == files_before  # zero rewrites
    write_and_commit(
        rows(4000, 1000).select(
            F.col("id").alias("event_id"),
            F.col("shard").alias("bucket"),
            F.col("v").alias("value"),
        ).repartition("bucket"),
        table, mode="append", partition_by=["bucket"],
    )

    # 3. unified read: old files (id/shard/v) + new files under one schema,
    # the id-keyed vector still applies, pruning resolves bucket -> shard
    got = table.read(spark)
    assert got.count() == 4600 and "event_id" in got.columns
    assert "id" not in got.columns and "v" not in got.columns
    keep, skipped = table.prune_plan([("bucket", "=", "2")])
    assert skipped >= 3, "renamed partition column must still prune"
    n2 = table.read_pruned(spark, [("bucket", "=", "2")]).where(
        F.col("bucket") == "2").count()
    print(f"pruned read bucket=2: {n2} rows, {skipped} files skipped")

    # 4. AS OF TIMESTAMP: the pre-rename state, by time
    old = table.read(spark, timestamp=ts_before_rename)
    assert "id" in old.columns and old.count() == 3600

    # 5. zero-copy clone; diverge it; source rewrite+vacuum can't hurt it
    clone = clone_table(table, f"{work}/events_clone")
    write_and_commit(
        spark.range(9000, 9500).select(
            F.col("id").alias("event_id"),
            F.lit("9").alias("bucket"),
            (F.col("id") * 2).alias("value"),
        ), clone, mode="append",
    )
    compact_and_commit(spark, table, target_file_bytes=1 << 40)
    table.vacuum(keep_versions=1, retention_seconds=0)
    assert clone.read(spark).count() == 5100
    assert table.read(spark).count() == 4600
    print("clone survives source rewrite+vacuum:", clone.read(spark).count())

    # 6. RESTORE the clone to its pre-divergence state; show history
    clone.restore(1)
    assert clone.read(spark).count() == 4600
    hist = clone.history(limit=5)
    ops = [e["operation"] for e in hist]
    assert ops[0] == "restore" and "clone" in ops
    print("history (newest first):", [(e["version"], e["operation"]) for e in hist])

    print("OK")


if __name__ == "__main__":
    main()
