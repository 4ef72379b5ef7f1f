"""End-to-end lakehouse streaming demo — the manifest-table streaming
surface in one run:

1. seed a bronze manifest table and land three more batch commits,
2. stream bronze -> silver incrementally (manifest_stream source with
   maxFilesPerTrigger rate limiting, manifest_stream_writer sink with
   (writer_id, batch_id) exactly-once commits), with a transform in
   the middle,
3. stop the stream, land more bronze commits, RESTART from the
   checkpoint — only the new commits flow, nothing re-lands,
4. OPTIMIZE the silver table: Z-order re-cluster on two columns with
   zone maps + Bloom filters recollected at commit,
5. run a pruned point-in-rectangle read and show the file-skipping
   counts,
6. vacuum with the retention window and show time travel still works
   for retained versions.

Every primitive here is covered by the registered query inventory and
the manifest/streaming pytest suites; this script shows them composed
the way a production ingest would actually run.

Run: python examples/lakehouse_stream_demo.py
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from octopufs_spark.manifest import (  # noqa: E402
    ManifestTable,
    compact_and_commit,
    manifest_stream_writer,
    write_and_commit,
)
from octopufs_spark.session import get_spark  # noqa: E402
from octopufs_spark.sources import register_manifest_stream  # noqa: E402


def main() -> None:
    spark = get_spark()
    register_manifest_stream(spark)
    work = tempfile.mkdtemp(prefix="lakehouse_demo_")
    bronze = ManifestTable(f"{work}/bronze")
    silver = ManifestTable(f"{work}/silver")
    ckpt = f"{work}/ckpt"

    def batch(lo: int, n: int):
        return spark.range(lo, lo + n).select(
            F.col("id"),
            (F.col("id") % 64).alias("x"),
            (F.col("id") / 64).cast("long").alias("y"),
            (F.col("id") * 3 % 997).alias("v"),
        )

    # 1. bronze ingest: the seed commit
    write_and_commit(batch(0, 4096).repartition(4), bronze)
    print(f"bronze seeded: {len(bronze.read_manifest().files)} files")

    # 2. stream bronze -> silver with a transform and a files/trigger
    # cap. maxFilesPerTrigger bounds every micro-batch AFTER the first
    # (Spark resolves the first end-offset before handing the reader
    # any position), so commits arriving while the stream runs land as
    # separate bounded batches instead of coalescing into one.
    def make_stream():
        return (
            spark.readStream.format("manifest_stream")
            .option("path", bronze.root)
            .option("maxFilesPerTrigger", "8")
            .load()
            .withColumn("v2", F.col("v") * 2)
        )

    def silver_count() -> int:
        try:
            return silver.read(spark).count()
        except FileNotFoundError:
            return 0

    import time

    q = (
        manifest_stream_writer(make_stream(), silver, writer_id="bronze2silver")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + 120
    while silver_count() < 4096 and time.time() < deadline:
        time.sleep(0.5)
    # three more bronze commits while the stream is live: the cap
    # (8 files/trigger vs 32-file commits) forces one batch per commit
    for k in range(1, 4):
        write_and_commit(batch(4096 * k, 4096), bronze, mode="append")
    while silver_count() < 4 * 4096 and time.time() < deadline:
        time.sleep(0.5)
    q.stop()
    n1 = silver_count()
    print(f"silver while live: {n1} rows across "
          f"{silver.latest_version()} rate-limited stream commits")

    def run_stream():
        q = (
            manifest_stream_writer(make_stream(), silver, writer_id="bronze2silver")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    # 3. more bronze while the stream is down; restart drains only the
    # delta. Python sources fall back to SINGLE-batch execution under
    # availableNow, and maxFilesPerTrigger is a HARD cap (an oversized
    # commit splits across triggers) — so one run processes at most one
    # capped batch of the backlog; loop until the count stops moving,
    # exactly what an operational catch-up job does.
    write_and_commit(batch(100_000, 2048), bronze, mode="append")
    prev, cur = -1, silver_count()
    while cur != prev:
        run_stream()
        prev, cur = cur, silver_count()
    got = silver.read(spark)
    n2 = got.count()
    dupes = n2 - got.select("id").distinct().count()
    print(f"silver after restart: {n2} rows (+{n2 - n1}), duplicates: {dupes}")
    assert dupes == 0 and n2 == 4 * 4096 + 2048

    # 4. OPTIMIZE ZORDER (x, y) with skipping metadata recollected
    v = compact_and_commit(
        spark, silver, target_file_bytes=64 * 1024, zorder_by=("x", "y"), stats=True
    )
    m = silver.read_manifest()
    print(f"optimized: v{v}, {len(m.files)} z-ordered files, "
          f"stats for {len(m.meta['file_stats'])} files")

    # 5. pruned 2-D read
    preds = [("x", "=", 3), ("y", "=", 3)]
    keep, skipped = silver.prune_plan(preds)
    rect = silver.read_pruned(spark, preds).where((F.col("x") == 3) & (F.col("y") == 3))
    print(f"point-in-rectangle read: scanned {len(keep)} files, "
          f"skipped {skipped}, rows {rect.count()}")
    assert skipped >= 1

    # 6. vacuum (retention window) + time travel on a retained version
    removed = silver.vacuum(keep_versions=2)
    print(f"vacuum removed {len(removed)} files "
          "(retention window protects this run's fresh files)")
    tt = silver.read(spark, version=silver.latest_version()).count()
    print(f"time travel to latest retained version: {tt} rows")
    print("OK")


if __name__ == "__main__":
    main()
