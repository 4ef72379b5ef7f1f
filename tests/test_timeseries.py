"""As-of join semantics: latest right row at-or-before each left ts."""

from __future__ import annotations

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
