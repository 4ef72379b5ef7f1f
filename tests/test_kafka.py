"""Env-gated Kafka streaming integration suite.

Runs when OCTOPUFS_TEST_KAFKA=<bootstrap servers> points at a live
broker AND the spark-sql-kafka connector is on the JVM classpath
(spark.jars.packages=org.apache.spark:spark-sql-kafka-0-10_2.13:...).
Neither exists in this sandbox (no network, connector not shipped), so
the module skips cleanly here and runs where a broker is credentialed
— mirroring tests/test_objectstore.py and the reference's env-gated
HDFS suites (reference: src/test/scala/AclTest.scala:25).
"""

from __future__ import annotations

import os
import uuid

import pytest

KAFKA = os.environ.get("OCTOPUFS_TEST_KAFKA", "")

pytestmark = pytest.mark.skipif(
    not KAFKA,
    reason="set OCTOPUFS_TEST_KAFKA=<bootstrap servers> (with the "
    "spark-sql-kafka connector on the classpath) to run Kafka tests",
)


def test_kafka_roundtrip_tumbling(spark, tmp_path):
    """events parquet → Kafka topic → read_kafka_events →
    tumbling_counts == the same aggregation over the file source."""
    from octopufs_spark import streaming
    from octopufs_spark.tables import load
    from tests.conftest import SF_DIR

    topic = f"octopufs-it-{uuid.uuid4().hex[:12]}"
    events = load(spark, SF_DIR, "events").limit(500)

    # publish via the batch kafka writer (same connector)
    from pyspark.sql import functions as F

    events.select(F.to_json(F.struct("*")).alias("value")).write.format(
        "kafka"
    ).option("kafka.bootstrap.servers", KAFKA).option("topic", topic).save()

    stream = streaming.read_kafka_events(spark, KAFKA, topic)
    q = streaming.run_to_memory_sink(
        streaming.tumbling_counts(stream), "kafka_tumbling", mode="append"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # Append mode only emits watermark-closed windows; compare against
    # the same transformation run over the bounded batch twin.
    got = {
        (r.window_start, r.event_type): (r.cnt, r.sum_value)
        for r in spark.table("kafka_tumbling").collect()
    }
    want_df = streaming.tumbling_counts(events)
    want = {
        (r.window_start, r.event_type): (r.cnt, r.sum_value)
        for r in want_df.collect()
    }
    for k, v in got.items():
        assert want.get(k) == v


def test_kafka_sink_roundtrip(spark, tmp_path):
    """write_kafka publishes JSON rows that read back losslessly."""
    from octopufs_spark import streaming
    from octopufs_spark.tables import load
    from tests.conftest import SF_DIR

    topic = f"octopufs-it-{uuid.uuid4().hex[:12]}"
    src_dir = str(tmp_path / "src")
    load(spark, SF_DIR, "events").limit(100).write.parquet(src_dir)
    stream = streaming.read_events_stream(spark, src_dir)
    q = streaming.write_kafka(
        stream, KAFKA, topic, str(tmp_path / "ckpt"), key_col="user_id"
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    back = streaming.read_kafka_events(spark, KAFKA, topic)
    q2 = streaming.run_to_memory_sink(back, "kafka_back", mode="append")
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert spark.table("kafka_back").count() == 100
