"""Scale-utility tests: salted joins/aggs match their plain
equivalents; bucketed joins skip the shuffle (plan-asserted)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from octopufs_spark import scale
from octopufs_spark.tables import load
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_salted_join_matches_plain(spark):
    orders = load(spark, SF_DIR, "orders")
    cust = load(spark, SF_DIR, "customer").select("c_custkey", "c_mktsegment")
    plain = orders.join(cust, orders.o_custkey == cust.c_custkey).groupBy(
        "c_mktsegment"
    ).agg(F.count("*").alias("n"), F.sum("o_totalprice").alias("s"))
    salted = scale.salted_join(orders, cust, "o_custkey", "c_custkey").groupBy(
        "c_mktsegment"
    ).agg(F.count("*").alias("n"), F.sum("o_totalprice").alias("s"))
    a = {r.c_mktsegment: (r.n, round(r.s, 2)) for r in plain.collect()}
    b = {r.c_mktsegment: (r.n, round(r.s, 2)) for r in salted.collect()}
    assert a == b


def test_salted_join_rejects_outer_modes(spark):
    # Unmatched small-side rows would surface once per salt replica.
    orders = load(spark, SF_DIR, "orders")
    cust = load(spark, SF_DIR, "customer")
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError):
            scale.salted_join(orders, cust, "o_custkey", "c_custkey", how=how)


def test_salted_count_matches_plain(spark):
    li = load(spark, SF_DIR, "lineitem")
    plain = {r.l_returnflag: r.cnt for r in li.groupBy("l_returnflag").agg(F.count("*").alias("cnt")).collect()}
    salted = {r.l_returnflag: r.cnt for r in scale.salted_count(li, "l_returnflag").collect()}
    assert plain == salted


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS bkt_db")
    spark.sql("USE bkt_db")
    orders = load(spark, SF_DIR, "orders")
    cust = load(spark, SF_DIR, "customer")
    scale.write_bucketed(
        orders.withColumnRenamed("o_custkey", "k"), "orders_b", "k", 8, str(tmp_path / "ob")
    )
    scale.write_bucketed(
        cust.withColumnRenamed("c_custkey", "k"), "cust_b", "k", 8, str(tmp_path / "cb")
    )
    yield "orders_b", "cust_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS cust_b")
    spark.sql("DROP DATABASE IF EXISTS bkt_db")
    spark.sql("USE default")


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair):
    ot, ct = bucketed_pair
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = spark.table(ot).join(spark.table(ct), "k")
        n = joined.count()
        assert n == load(spark, SF_DIR, "orders").count()  # FK: every order has a customer
        plan = _plan(joined)
        # co-located bucketed scan: sort-merge join with zero exchanges
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_zorder_bounds_both_dimensions(spark, tmp_path):
    """Z-ordered files cover small rectangles of the 2-D value space,
    so a selective predicate on EITHER dimension prunes most files; a
    plain 1-D sort gives tight col1 stripes but every file spans the
    full col2 domain (a y-only predicate scans everything). Verified
    against REAL parquet footer min/max — the stats data skipping
    actually reads."""
    from pathlib import Path

    import pyarrow.parquet as pq

    from octopufs_spark.scale import write_zordered

    df = (
        spark.range(100_000)
        .selectExpr("id % 317 AS x", "CAST(id / 317 AS LONG) AS y")
        .withColumn("payload", F.col("x") * F.col("y"))
    )
    z_path, lin_path = str(tmp_path / "zord"), str(tmp_path / "linear")
    write_zordered(df, z_path, "x", "y", n_files=16)
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(lin_path)

    def file_boxes(path):
        boxes = []
        for f in Path(path).glob("*.parquet"):
            md = pq.ParquetFile(str(f)).metadata
            mins = {"x": None, "y": None}
            maxs = {"x": None, "y": None}
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    name = col.path_in_schema
                    if name in mins and col.statistics is not None:
                        s = col.statistics
                        mins[name] = s.min if mins[name] is None else min(mins[name], s.min)
                        maxs[name] = s.max if maxs[name] is None else max(maxs[name], s.max)
            boxes.append((mins["x"], maxs["x"], mins["y"], maxs["y"]))
        return boxes

    def files_hit(boxes, dim, lo, hi):
        i = 0 if dim == "x" else 2
        return sum(1 for b in boxes if not (b[i + 1] < lo or b[i] > hi))

    zb, lb = file_boxes(z_path), file_boxes(lin_path)
    assert len(zb) == len(lb) == 16
    # a 1/8-height y band: the linear layout cannot prune it at all
    y_band = files_hit(lb, "y", 100, 139), files_hit(zb, "y", 100, 139)
    assert y_band[0] == 16  # linear: every file spans all of y
    assert y_band[1] <= 8, y_band  # z-order: at most half the files
    # the x band stays prunable in BOTH layouts (z-order trades a
    # little x selectivity for massive y selectivity)
    x_band = files_hit(lb, "x", 100, 139), files_hit(zb, "x", 100, 139)
    assert x_band[0] <= 4
    assert x_band[1] <= 10, x_band


def test_zorder_degenerate_dimension(spark, tmp_path):
    """A constant column (span 0) must not divide by zero or crash —
    the curve degrades to a 1-D sort on the varying column."""
    from octopufs_spark.scale import write_zordered

    df = spark.range(10_000).selectExpr("id AS x", "CAST(7 AS LONG) AS y")
    path = str(tmp_path / "degen")
    write_zordered(df, path, "x", "y", n_files=4)
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.selectExpr("min(x)", "max(x)", "min(y)", "max(y)").collect()[0] == (
        0, 9_999, 7, 7,
    )


def test_global_cumsum_matches_single_window(spark):
    """Distributed prefix sum == the single-partition window, exactly
    (decimal values), across repeated actions (partitioning must be
    pinned so offsets stay consistent — regression for the
    repartitionByRange re-sampling hazard)."""
    from pyspark.sql.window import Window

    li = load(spark, SF_DIR, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("r")
    )
    order = [F.col("r").desc(), F.col("l_partkey")]
    dist = scale.global_cumsum(rev, order, "r", out_col="cum", n_parts=8)
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ref = rev.withColumn("cum", F.sum("r").over(w))
    a = {r.l_partkey: r.cum for r in dist.collect()}
    # Second action over the same frame: results must not shift.
    a2 = {r.l_partkey: r.cum for r in dist.collect()}
    b = {r.l_partkey: r.cum for r in ref.collect()}
    assert a == b
    assert a2 == b


def test_global_cumsum_parallel_plan(spark):
    """The distributed prefix sum never moves all rows to one task:
    its window is partitioned by _pid (no empty PARTITION BY)."""
    li = load(spark, SF_DIR, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("r")
    )
    out = scale.global_cumsum(rev, [F.col("r").desc(), F.col("l_partkey")], "r")
    plan = _plan(out)
    assert "_pid" in plan  # window keyed on partition id, not global


def test_global_row_number_matches_single_window(spark):
    """Distributed global ROW_NUMBER == the single-partition window,
    exactly, across repeated actions (partitioning pinned by
    localCheckpoint)."""
    from pyspark.sql.window import Window

    supp = load(spark, SF_DIR, "supplier").select("s_suppkey", "s_acctbal")
    order = [F.col("s_acctbal").desc(), F.col("s_suppkey")]
    dist, n = scale.global_row_number(supp, order, out_col="rn", n_parts=8)
    ref = supp.withColumn("rn", F.row_number().over(Window.orderBy(*order)))
    a = {r.s_suppkey: r.rn for r in dist.collect()}
    a2 = {r.s_suppkey: r.rn for r in dist.collect()}
    b = {r.s_suppkey: r.rn for r in ref.collect()}
    assert a == b == a2
    assert n == supp.count()
    assert sorted(a.values()) == list(range(1, n + 1))


def test_global_rank_queries_avoid_single_partition_window(spark):
    """Verdict r4 #2: the two global-rank registry queries must not
    plan an unpartitioned WindowExec (Exchange SinglePartition) over a
    base table — at 100x that serializes the relation through one
    core. Their visible plans carry the broadcast-offset join instead."""
    from octopufs_spark.registry import all_queries

    qs = all_queries()
    for name in ("q_window_percent_cume", "q_window_dense_ntile"):
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan, name
        # global rank arithmetic rides on the checkpointed two-pass
        # helper: no WindowExec over the full relation survives here
        assert "Window [" not in plan or "_pid" in plan, name


def test_global_row_number_edge_cases(spark):
    """Empty and single-row inputs produce sane results (no pid gaps,
    correct totals)."""
    empty = spark.range(0).withColumn("k", F.col("id"))
    out, n = scale.global_row_number(empty, ["k"], out_col="rn")
    assert n == 0 and out.count() == 0
    one = spark.range(1).withColumn("k", F.col("id"))
    out, n = scale.global_row_number(one, ["k"], out_col="rn")
    rows = out.collect()
    assert n == 1 and [r.rn for r in rows] == [1]
    # heavy duplication on the order key (ties within/across partitions)
    dup = spark.range(0, 1000).select((F.col("id") % 3).alias("k"), "id")
    out, n = scale.global_row_number(dup, ["k", "id"], out_col="rn", n_parts=8)
    got = sorted(r.rn for r in out.collect())
    assert n == 1000 and got == list(range(1, 1001))


def test_version_resolution_bounded_on_long_logs(tmp_path, monkeypatch):
    """r8 verdict #3 pinned bound: on an N-commit log, latest_version
    resolves via the CAS hint in O(1) metadata calls (never a full
    _manifest listing), and version_as_of binary-searches in
    <= ceil(log2 N) + 2 commit-timestamp reads. These are the two
    resolutions every read and every commit-retry pays, so they must
    not scale with table age (tools/commitlog_probe.py measures the
    wall-clock side at 5000 commits)."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from octopufs_spark.manifest import ManifestTable

    root = str(tmp_path / "t")
    import os

    os.makedirs(root, exist_ok=True)
    t = ManifestTable(root)
    tbl = pa.table({"id": pa.array([1], pa.int64())})
    N = 200
    for i in range(N):
        d = f"{root}/data-{i:04d}"
        os.makedirs(d, exist_ok=True)
        pq.write_table(tbl, f"{d}/part-0.parquet")
        rel = [f"data-{i:04d}/part-0.parquet"]
        t._commit_with_retry(
            lambda parent, rel=rel: sorted((parent.files if parent else []) + rel),
            "append",
            None,
        )

    # latest_version: hint-guided — counts fs metadata calls through a
    # delegating proxy, and asserts the O(N) listing fallback never runs
    class CountingFS:
        def __init__(self, inner):
            self._inner = inner
            self.get_file_info_calls = 0

        def get_file_info(self, *a, **kw):
            self.get_file_info_calls += 1
            return self._inner.get_file_info(*a, **kw)

        def __getattr__(self, name):
            return getattr(self._inner, name)

    counting = CountingFS(t.fs)
    monkeypatch.setattr(t, "fs", counting)
    monkeypatch.setattr(
        ManifestTable,
        "versions",
        lambda self: pytest.fail("latest_version fell back to a full listing"),
    )
    assert t.latest_version() == N
    # hint-dir listing (1) + hint verify (1) + forward probe to head+1
    assert counting.get_file_info_calls <= 5
    monkeypatch.undo()

    # version_as_of: O(log N) commit-timestamp reads
    mid_ts = t.commit_timestamp(N // 2)
    calls = []
    orig_ct = ManifestTable.commit_timestamp
    monkeypatch.setattr(
        ManifestTable,
        "commit_timestamp",
        lambda self, v: (calls.append(v), orig_ct(self, v))[1],
    )
    assert t.version_as_of(mid_ts) == N // 2
    assert len(calls) <= math.ceil(math.log2(N)) + 2
