"""Direct-reference tests for the time-series queries: tiny hand-built
inputs (gap-fill) and numpy recomputation (EWMA, weighted median) —
independent of the DuckDB oracles, so a blind spot shared by both
engines can't hide."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from octopufs_spark.queries.tsq import _EWMA_WEIGHTS


def test_gapfill_fills_known_gaps(spark, tmp_path):
    """User with events at hours 0, 1, and 4: hours 2-3 exist in the
    output and carry hour-1's average forward."""
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 7, "click", 10.0, "{}"),
        (2, base + dt.timedelta(minutes=30), 7, "click", 20.0, "{}"),  # hour 0 avg 15
        (3, base + dt.timedelta(hours=1), 7, "click", 40.0, "{}"),      # hour 1 avg 40
        (4, base + dt.timedelta(hours=4), 7, "click", 8.0, "{}"),       # hour 4 avg 8
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    )
    sf = str(tmp_path / "sfg")
    import os

    os.makedirs(sf)
    df.write.parquet(f"{sf}/events.parquet")

    from octopufs_spark.registry import all_queries

    out = {
        (r.user_id, r.bucket.hour): r.value_ff
        for r in all_queries()["q_ts_gapfill"](spark, sf).collect()
    }
    assert out == {
        (7, 0): 15.0,
        (7, 1): 40.0,
        (7, 2): 40.0,  # gap: forward-filled
        (7, 3): 40.0,  # gap: forward-filled
        (7, 4): 8.0,
    }


def test_ewma_matches_numpy_reference(spark, tmp_path):
    """q_ts_ewma equals a direct numpy recomputation of the truncated
    8-tap normalized EWMA on seeded random data."""
    rng = np.random.default_rng(11)
    n = 200
    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), int(i % 3), "e",
         round(float(rng.uniform(1, 100)), 2), "{}")
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    )
    sf = str(tmp_path / "sfe")
    import os

    os.makedirs(sf)
    df.write.parquet(f"{sf}/events.parquet")

    from octopufs_spark.registry import all_queries

    got = {r.event_id: r.ewma for r in all_queries()["q_ts_ewma"](spark, sf).collect()}

    w = np.array([float(x) for x in _EWMA_WEIGHTS])
    by_user: dict[int, list[tuple[int, float]]] = {}
    for i, _, u, _, v, _ in rows:
        by_user.setdefault(u, []).append((i, v))
    for u, seq in by_user.items():
        seq.sort()
        vals = [v for _, v in seq]
        for pos, (eid, _) in enumerate(seq):
            taps = [vals[pos - j] for j in range(len(w)) if pos - j >= 0]
            ww = w[: len(taps)]
            want = float(np.dot(ww, taps) / ww.sum())
            assert got[eid] == pytest.approx(want, rel=1e-9), (u, eid)


def test_weighted_median_matches_direct(spark, tmp_path):
    """The REGISTERED weighted-median UDAF equals the direct
    definition — smallest v whose cumulative weight (peers included)
    reaches half the total — on hand-built groups with a boundary tie."""
    rows = [
        ("A", 10.0, 1.0),
        ("A", 20.0, 1.0),
        ("A", 30.0, 5.0),   # heavy tail -> median 30
        ("B", 1.0, 2.0),
        ("B", 2.0, 2.0),    # cum at 1.0 is exactly tot/2 -> lower median 1.0
        ("C", 5.0, 1.0),
    ]
    df = spark.createDataFrame(
        rows, "l_returnflag string, l_extendedprice double, l_quantity double"
    )
    sf = str(tmp_path / "sfw")
    import os

    os.makedirs(sf)
    df.write.parquet(f"{sf}/lineitem.parquet")

    from octopufs_spark.registry import all_queries

    got = {
        r.l_returnflag: r.weighted_median
        for r in all_queries()["q_udaf_weighted_median"](spark, sf).collect()
    }
    assert got == {"A": 30.0, "B": 1.0, "C": 5.0}


def test_weighted_median_udaf_surface_matches_window_plan(spark):
    """The GROUPED_AGG pandas-UDAF surface (weighted_median_udaf) and the
    registered pure-window plan compute the same statistic at sf0.001 —
    the UDAF stays pytest-covered after the r5 plan swap moved it out of
    the registered hot path."""
    from octopufs_spark.queries.llm_ext import q_udaf_weighted_median, weighted_median_udaf
    from octopufs_spark.tables import load
    from tests.conftest import SF_DIR

    li = load(spark, SF_DIR, "lineitem")
    via_udaf = {
        r.l_returnflag: r.weighted_median for r in weighted_median_udaf(li).collect()
    }
    via_window = {
        r.l_returnflag: r.weighted_median
        for r in q_udaf_weighted_median(spark, SF_DIR).collect()
    }
    assert via_udaf == via_window
