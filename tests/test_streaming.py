"""Structured Streaming tests: file-source micro-batches into memory
sinks; batch-equivalence of windowed aggregations; watermark dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from octopufs_spark import streaming
from octopufs_spark.tables import load
from tests.conftest import SF_DIR


@pytest.fixture()
def event_files(spark, tmp_path):
    """events split into 3 parquet files → 3 micro-batches."""
    src = str(tmp_path / "stream_src")
    load(spark, SF_DIR, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).repartition(3).write.mode("overwrite").parquet(src)
    return src


def _run(stream_df, name, mode="append"):
    q = streaming.run_to_memory_sink(stream_df, name, mode)
    q.processAllAvailable()
    q.stop()
    return q


def test_tumbling_stream_matches_batch(spark, event_files):
    events = streaming.read_events_stream(spark, event_files)
    _run(streaming.tumbling_counts(events), "t_tumble", mode="complete")
    got = {
        (r.window_start, r.event_type): (r.cnt, round(r.sum_value, 2))
        for r in spark.table("t_tumble").collect()
    }
    batch = (
        load(spark, SF_DIR, "events")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"), F.sum("value").alias("sum_value"))
    )
    want = {
        (r.w.start, r.event_type): (r.cnt, round(r.sum_value, 2)) for r in batch.collect()
    }
    assert got == want


def test_dedup_stream(spark, tmp_path):
    src = str(tmp_path / "dup_src")
    base = load(spark, SF_DIR, "events").limit(100).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    base.write.mode("overwrite").parquet(src)
    base.limit(50).write.mode("append").parquet(src)  # duplicate half
    events = streaming.read_events_stream(spark, src)
    _run(streaming.deduped_events(events), "t_dedup")
    assert spark.table("t_dedup").count() == 100


def test_session_stream_runs(spark, event_files):
    events = streaming.read_events_stream(spark, event_files)
    _run(streaming.session_counts(events), "t_session", mode="complete")
    rows = spark.table("t_session").collect()
    assert len(rows) > 0
    assert all(r.session_end > r.session_start for r in rows)
