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
