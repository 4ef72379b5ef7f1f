"""Streaming → manifest-table integration: a foreachBatch sink that
MERGEs each micro-batch into a manifest table by key. Because the
merge is keyed on the immutable event_id, replaying a batch is a
no-op — exactly-once lands from idempotence plus the manifest's
atomic commit, the same recipe a production lakehouse sink uses.

Also covers DataFrame.observe (inline metric collection): the batch
twin's observed metrics must equal a direct aggregation."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from octopufs_spark.manifest import ManifestTable
from octopufs_spark.merge import merge_upsert_manifest
from octopufs_spark.tables import load
from tests.conftest import SF_DIR


def test_foreachbatch_merge_sink_exactly_once(spark, tmp_path):
    src = tmp_path / "src"
    ev = (
        load(spark, SF_DIR, "events")
        .select("event_id", "user_id", "event_type", "value")
        .where(F.col("event_id") < 2000)
    )
    # 4 files => multiple micro-batches with maxFilesPerTrigger=1
    ev.repartition(4).write.mode("overwrite").parquet(str(src))

    table = ManifestTable(str(tmp_path / "tbl"))
    empty = spark.createDataFrame([], ev.schema)
    empty.write.mode("overwrite").parquet(f"{table.root}/seed")
    table.commit_overwrite("seed", operation="seed")

    def sink(batch_df, batch_id):
        merge_upsert_manifest(spark, table, batch_df, keys=["event_id"])
        # Replay the same batch: idempotent by key, so no duplicates.
        merge_upsert_manifest(spark, table, batch_df, keys=["event_id"])

    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(
        str(src)
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(180)

    final = table.read(spark)
    assert final.count() == ev.count()
    assert final.agg(F.countDistinct("event_id")).collect()[0][0] == ev.count()
    got = final.agg(F.sum("value").cast("decimal(18,2)").cast("double")).collect()[0][0]
    want = ev.agg(F.sum("value").cast("decimal(18,2)").cast("double")).collect()[0][0]
    assert got == want
    # one seed + 2 merges per micro-batch, all atomic commits
    assert len(table.versions()) >= 3


def test_observe_metrics_match_direct_agg(spark):
    obs = Observation("ingest_stats")
    o = load(spark, SF_DIR, "orders").observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
        F.max("o_orderdate").alias("max_date"),
    )
    o.write.format("noop").mode("overwrite").save()
    direct = (
        load(spark, SF_DIR, "orders")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
            F.max("o_orderdate").alias("max_date"),
        )
        .collect()[0]
    )
    got = obs.get
    assert got["n"] == direct["n"]
    assert got["total"] == direct["total"]
    assert got["max_date"] == direct["max_date"]


def test_manifest_merge_stream_sink_exactly_once(spark, tmp_path):
    """Streaming UPSERT into a manifest table: micro-batches MERGE
    atomically, a restart replays nothing (txn marks), and updates
    actually update — the final table holds each key once with its
    latest value."""
    from pyspark.sql import functions as F

    from octopufs_spark.manifest import ManifestTable
    from octopufs_spark.merge import manifest_merge_stream_writer

    src = str(tmp_path / "cdc_src")
    ckpt = str(tmp_path / "cdc_ckpt")
    table = ManifestTable(str(tmp_path / "cdc_tbl"))
    # batch A: keys 0..49 v=1
    spark.range(0, 50).withColumn("val", F.lit(1)).coalesce(1).write.parquet(src)

    def run():
        stream = (
            spark.readStream.schema("id bigint, val int")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            manifest_merge_stream_writer(stream, table, ["id"], writer_id="cdc")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    run()
    assert {(r.id, r.val) for r in table.read(spark).collect()} == {
        (i, 1) for i in range(50)
    }
    # while down: updates for 0..9 (v=2) and inserts 100..109
    spark.range(0, 10).withColumn("val", F.lit(2)).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.range(100, 110).withColumn("val", F.lit(3)).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run()
    rows = {(r.id, r.val) for r in table.read(spark).collect()}
    want = (
        {(i, 2) for i in range(10)}
        | {(i, 1) for i in range(10, 50)}
        | {(i, 3) for i in range(100, 110)}
    )
    assert rows == want, "merge sink lost an update or duplicated a key"
    # replays are no-ops: re-merging an already-committed batch id
    from octopufs_spark.merge import merge_upsert_manifest

    before = table.latest_version()
    skipped = merge_upsert_manifest(
        spark, table, spark.range(0, 5).withColumn("val", F.lit(9)),
        ["id"], txn=("cdc", 0),
    )
    assert skipped is None and table.latest_version() == before
