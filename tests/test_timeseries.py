"""As-of join semantics: latest right row at-or-before each left ts."""

from __future__ import annotations

import pytest

from octopufs_spark.timeseries import asof_join


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 5, "a"), (1, 10, "b"), (1, 20, "c"), (2, 7, "d"), (3, 9, "e")],
        "k long, t long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 4, 100.0), (1, 10, 200.0), (1, 15, 300.0), (2, 8, 400.0)],
        "k long, t long, v double",
    )
    out = asof_join(left, right, on="k", left_ts="t", right_ts="t", value_cols=["v"])
    got = {r.tag: r.v_asof for r in out.collect()}
    assert got == {
        "a": 100.0,  # t=5 → right t=4
        "b": 200.0,  # t=10 → right t=10 (<= includes equal)
        "c": 300.0,  # t=20 → right t=15
        "d": None,   # t=7 → right t=8 is in the future
        "e": None,   # key 3 has no right rows
    }
    # left row count preserved (left-join semantics)
    assert out.count() == 5


@pytest.mark.slow  # >15 s; excluded from the default driver-window run
def test_interval_join_matches_naive(spark):
    """Bucketed interval join ≡ naive cross join + range filter,
    including intervals spanning multiple buckets."""
    from octopufs_spark.timeseries import interval_join
    import pyspark.sql.functions as F

    points = spark.createDataFrame(
        [(i, f"2024-01-01 0{h}:{m:02d}:00") for i, (h, m) in
         enumerate([(0, 5), (0, 59), (1, 0), (2, 30), (3, 45), (5, 0)])],
        "pid long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    intervals = spark.createDataFrame(
        [(100, "2024-01-01 00:30:00", "2024-01-01 02:45:00"),   # spans 3 buckets
         (200, "2024-01-01 03:00:00", "2024-01-01 04:00:00"),
         (300, "2024-01-01 05:00:00", "2024-01-01 05:00:01")],  # 1-second interval
        "iid long, s string, e string",
    ).withColumn("s", F.col("s").cast("timestamp")).withColumn("e", F.col("e").cast("timestamp"))

    got = {
        (r.pid, r.iid)
        for r in interval_join(points, intervals, "ts", "s", "e").collect()
    }
    naive = {
        (r.pid, r.iid)
        for r in points.crossJoin(intervals)
        .where((F.col("ts") >= F.col("s")) & (F.col("ts") < F.col("e")))
        .collect()
    }
    assert got == naive
    assert (1, 100) in got and (3, 100) in got  # multi-bucket span works
    assert (5, 300) in got  # sub-bucket interval works


def test_interval_join_left_keeps_unmatched(spark):
    import pyspark.sql.functions as F
    from octopufs_spark.timeseries import interval_join

    points = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00"), (2, "2024-01-01 09:00:00")],
        "pid long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    intervals = spark.createDataFrame(
        [(100, "2024-01-01 00:00:00", "2024-01-01 01:00:00")],
        "iid long, s string, e string",
    ).withColumn("s", F.col("s").cast("timestamp")).withColumn("e", F.col("e").cast("timestamp"))
    out = interval_join(points, intervals, "ts", "s", "e", how="left").collect()
    by_pid = {r.pid: r.iid for r in out}
    assert len(out) == 2  # unmatched left row kept exactly once
    assert by_pid[1] == 100 and by_pid[2] is None
