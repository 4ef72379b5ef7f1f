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
