"""State-store batch reader (Spark 4 ``statestore`` / ``state-metadata``
data sources): inspect a streaming checkpoint's operator state as a
DataFrame — the observability surface for debugging stateful queries
(what keys are live, how big state is, per-partition skew) without
replaying the stream."""

from __future__ import annotations

from pyspark.sql import functions as F

from octopufs_spark.tables import load
from tests.conftest import SF_DIR


def test_state_metadata_and_contents_match_batch(spark, tmp_path):
    src = tmp_path / "src"
    ev = load(spark, SF_DIR, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    ev.write.mode("overwrite").parquet(str(src))
    ckpt = str(tmp_path / "ckpt")

    stream = spark.readStream.schema(ev.schema).parquet(str(src))
    agg = stream.withWatermark("ts", "1 hour").groupBy(F.window("ts", "1 day")).count()
    q = (
        agg.writeStream.format("memory")
        .queryName("ssr_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination(120)

    meta = spark.read.format("state-metadata").load(ckpt).collect()
    assert len(meta) == 1
    assert meta[0]["operatorName"] == "stateStoreSave"
    assert meta[0]["numPartitions"] == int(spark.conf.get("spark.sql.shuffle.partitions"))

    state = (
        spark.read.format("statestore")
        .load(ckpt)
        .select(
            F.col("key.window.start").alias("w_start"),
            F.col("value.count").alias("n"),
        )
        .collect()
    )
    # Watermark GC keeps only windows newer than max_ts - 1h; whatever
    # remains must match a batch recount of the same windows.
    assert len(state) >= 1
    batch = {
        r["w_start"]: r["count"]
        for r in ev.groupBy(F.window("ts", "1 day")).count().select(
            F.col("window.start").alias("w_start"), "count"
        ).collect()
    }
    for r in state:
        assert batch[r["w_start"]] == r["n"]
