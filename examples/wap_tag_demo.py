"""Write-audit-publish + tag demo — keeping bad data out of a live
table without a staging copy, then pinning the good snapshot:

1. seed a manifest table; start streaming-reading it,
2. STAGE a batch with ``wap_id`` — it lands in the version log but
   main readers, later commits, and the stream all skip it,
3. audit the staged snapshot in place (by explicit version); the
   first batch FAILS the audit (nulls planted) and is ABORTED — main
   never saw it,
4. re-stage a clean batch; a concurrent normal append lands mid-audit
   (chaining to main's head, not the staged snapshot); the audit
   passes and PUBLISH re-applies the staged batch onto the advanced
   head — the stream now sees exactly the published rows, once,
5. TAG the published version, OPTIMIZE + aggressively vacuum — the
   tagged snapshot stays readable through the ref while untagged
   history is pruned,
6. fork a BRANCH, land two commits + a branch OPTIMIZE on it (main
   untouched throughout), stream the branch's lineage, then
   fast-forward the whole line onto main in one metadata commit.

Run: python examples/wap_tag_demo.py
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from octopufs_spark.manifest import (  # noqa: E402
    ManifestTable,
    compact_and_commit,
    write_and_commit,
)
from octopufs_spark.session import get_spark  # noqa: E402
from octopufs_spark.sources import register_manifest_stream  # noqa: E402


def main() -> None:
    spark = get_spark()
    register_manifest_stream(spark)
    work = tempfile.mkdtemp(prefix="wap_demo_")
    table = ManifestTable(f"{work}/metrics")

    def rows(lo: int, n: int, null_every: int = 0):
        df = spark.range(lo, lo + n).select(
            "id", (F.col("id") * 2).alias("v")
        )
        if null_every:
            df = df.withColumn(
                "v", F.when(F.col("id") % null_every == 0, None).otherwise(F.col("v"))
            )
        return df

    # 1. seed main
    write_and_commit(rows(0, 1000), table)
    print(f"seeded v1: {table.read(spark).count()} rows")

    streamed: list[int] = []

    def drain_stream() -> None:
        q = (
            spark.readStream.format("manifest_stream")
            .option("path", table.root)
            .load()
            .writeStream.foreachBatch(
                lambda df, _b: streamed.extend(r.id for r in df.collect())
            )
            .option("checkpointLocation", f"{work}/ck")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain_stream()
    assert len(streamed) == 1000

    # 2.+3. stage a BAD batch, audit it, abort
    bad_v = write_and_commit(rows(1000, 200, null_every=7), table,
                             mode="append", wap_id="ingest-42")
    assert table.read(spark).count() == 1000, "staged rows leaked into main!"
    nulls = table.read(spark, version=bad_v).where(F.col("v").isNull()).count()
    print(f"audit of staged v{bad_v}: {nulls} null rows -> ABORT")
    table.abort_wap(wap_id="ingest-42")

    # 4. re-stage clean; a normal append races the audit; publish
    good_v = write_and_commit(rows(1000, 200), table, mode="append", wap_id="ingest-43")
    write_and_commit(rows(5000, 50), table, mode="append")  # racer on main
    assert table.read_manifest().parent != good_v  # racer chained to main
    audit_ok = table.read(spark, version=good_v).where(F.col("v").isNull()).count() == 0
    assert audit_ok
    pv = table.publish_wap(wap_id="ingest-43")
    print(f"published staged v{good_v} as v{pv}: {table.read(spark).count()} rows")
    assert table.read(spark).count() == 1250

    drain_stream()
    # exactly once: the aborted batch never streamed, the published one did
    assert sorted(streamed) == sorted(
        list(range(0, 1000)) + list(range(1000, 1200)) + list(range(5000, 5050))
    )
    print("stream saw published rows exactly once (aborted batch absent)")

    # 5. tag, rewrite everything, vacuum aggressively — the tag holds
    table.create_tag("ingest-43-approved", version=pv)
    compact_and_commit(spark, table)
    removed = table.vacuum(keep_versions=1, retention_seconds=0)
    tagged = table.read(spark, tag="ingest-43-approved").count()
    print(f"vacuum pruned {len(removed)} objects; tagged snapshot still reads {tagged} rows")
    assert tagged == 1250
    hist = [(h["version"], h["operation"], h["staged"]) for h in table.history()]
    print(f"history (retained): {hist}")

    # 6. branch: two commits, stream them, branch OPTIMIZE, fast-forward.
    # The earlier aggressive vacuum pruned pre-tag history, so the
    # branch stream starts AT the fork (startingVersion) instead of
    # replaying from v0 — the same contract as any vacuumed stream.
    main_before = table.read(spark).count()
    fork_v = table.create_branch("backfill")
    write_and_commit(rows(2000, 300), table, mode="append", branch="backfill")
    write_and_commit(rows(2300, 200), table, mode="append", branch="backfill")
    assert table.read(spark).count() == main_before, "branch leaked into main!"
    branch_rows: list[int] = []
    bq = (
        spark.readStream.format("manifest_stream")
        .option("path", table.root)
        .option("branch", "backfill")
        .option("startingVersion", str(fork_v + 1))
        .load()
        .writeStream.foreachBatch(
            lambda df, _b: branch_rows.extend(r.id for r in df.collect())
        )
        .option("checkpointLocation", f"{work}/ck_branch")
        .trigger(availableNow=True)
        .start()
    )
    bq.awaitTermination(120)
    assert len(branch_rows) == 500  # the branch's own commits
    compact_and_commit(spark, table, branch="backfill")
    ffv = table.fast_forward("backfill")
    print(
        f"branch 'backfill': +500 rows staged, streamed {len(branch_rows)} "
        f"branch rows, compacted on-branch, fast-forwarded as v{ffv}: "
        f"{table.read(spark).count()} rows"
    )
    assert table.read(spark).count() == main_before + 500
    print(f"detail: {({k: table.detail()[k] for k in ('version', 'num_files', 'tags', 'branches')})}")

    spark.stop()
    print("OK")


if __name__ == "__main__":
    main()
