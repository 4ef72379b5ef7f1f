"""End-to-end CDC/upsert demo — the mutable-table surface in one run:

1. seed a partitioned manifest table (hive layout, zone maps),
2. apply a CDC stream through the txn-idempotent MERGE sink
   (foreachBatch MERGE, exactly-once across restarts),
3. MOR-delete two key ranges (no data files touched), then fold the
   vectors back to one with consolidate_delete_vectors,
4. auto_optimize: per-partition scoped compaction commits,
5. show the final state: exact rows, one delete vector, partition
   identity preserved through its own compaction, partition pruning.

Run: python examples/cdc_upsert_demo.py
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from octopufs_spark.manifest import ManifestTable, auto_optimize, write_and_commit  # noqa: E402
from octopufs_spark.merge import (  # noqa: E402
    consolidate_delete_vectors,
    delete_where_mor,
    manifest_merge_stream_writer,
)
from octopufs_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark()
    work = tempfile.mkdtemp(prefix="cdc_demo_")
    table = ManifestTable(f"{work}/accounts")

    def rows(lo: int, n: int, val: int):
        return spark.range(lo, lo + n).select(
            F.col("id"),
            (F.col("id") % 4).cast("int").alias("region"),
            F.lit(val).alias("balance"),
        )

    # 1. seed: 4 hive partitions, several commits' worth of files
    write_and_commit(rows(0, 2000, 100).repartition(4), table,
                     partition_by=["region"], stats=True)
    for k in range(1, 4):
        write_and_commit(rows(2000 * k, 2000, 100).repartition(4), table,
                         mode="append", partition_by=["region"])
    print(f"seeded: {len(table.read_manifest().files)} files across "
          f"{table.latest_version()} commits")

    # 2. CDC stream -> MERGE sink (updates for 0..999, inserts 50000..50999)
    cdc_src = f"{work}/cdc"
    ckpt = f"{work}/ckpt"
    rows(0, 1000, 777).coalesce(1).write.parquet(cdc_src)
    rows(50_000, 1000, 5).coalesce(1).write.mode("append").parquet(cdc_src)

    stream = (
        spark.readStream.schema("id bigint, region int, balance int")
        .option("maxFilesPerTrigger", 1)
        .parquet(cdc_src)
    )
    q = (
        manifest_merge_stream_writer(stream, table, ["id"], writer_id="cdc",
                                     partition_by=["region"])
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    t = table.read(spark)
    print(f"after CDC: {t.count()} rows, "
          f"updated={t.where(F.col('balance') == 777).count()}, "
          f"inserted={t.where(F.col('balance') == 5).count()}")

    # 3. MOR deletes + vector consolidation
    delete_where_mor(spark, table, spark.range(100, 200), ["id"])
    delete_where_mor(spark, table, spark.range(300, 400), ["id"])
    n_vec = len(table.read_manifest().meta["delete_vectors"])
    consolidate_delete_vectors(spark, table)
    print(f"deletes: {n_vec} vectors folded to "
          f"{len(table.read_manifest().meta['delete_vectors'])}, "
          f"rows now {table.read(spark).count()}")

    # 4. per-partition OPTIMIZE (MERGE rewrote the snapshot; appends
    # and the hive seed leave partitions fragmented across commits)
    done = auto_optimize(spark, table, target_file_bytes=64 * 1024 * 1024,
                         min_files=2)
    print(f"auto_optimize compacted {len(done)} partition(s): {sorted(done)}")

    # 5. final checks: exactness, identity, pruning
    final = table.read(spark)
    assert final.count() == 4 * 2000 + 1000 - 200
    assert final.where(F.col("id").between(100, 199)).count() == 0
    keep, skipped = table.prune_plan([("region", "=", 2)])
    print(f"partition pruning region=2: scan {len(keep)} files, skip {skipped}")
    got = table.read_pruned(spark, [("region", "=", 2)]).where(F.col("region") == 2)
    assert got.count() == final.where(F.col("region") == 2).count()
    print("OK")


if __name__ == "__main__":
    main()
