"""Warehouse-analytics operator pack: cohorts, Pareto/ABC, basket
lift, anomaly detection, histograms, skyline, windowed top-k.

These round out the §2C relational surface with the composite
analytics a reference user runs on top of the engine floor (the
reference exercises the primitives — groupBy/window/join,
src/test/scala/Test.scala:60-118 — these are the canonical shapes
built from them). Every query here is oracle-backed; all float
outputs are derived from exact integer/decimal intermediates with
identical expression trees on both engines, so results are
bit-identical (see queries/common.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from octopufs_spark.queries.common import SQL_REVENUE, dsum, revenue_col
from octopufs_spark.registry import register
from octopufs_spark.scale import global_cumsum
from octopufs_spark.tables import load


@register(
    "q_ext_cohort_retention",
    oracle="""
WITH om AS (
  SELECT o_custkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month
  FROM orders
), first_m AS (
  SELECT o_custkey, MIN(order_month) AS cohort_month FROM om GROUP BY o_custkey
)
SELECT f.cohort_month,
       CAST(date_diff('month', f.cohort_month, om.order_month) AS BIGINT) AS month_offset,
       CAST(COUNT(DISTINCT om.o_custkey) AS BIGINT) AS n_customers
FROM om JOIN first_m f USING (o_custkey)
GROUP BY 1, 2
""",
)
def q_ext_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: customers grouped by the month of their
    first order (the cohort), counted again in each subsequent month
    they reorder. Plan: one groupBy(custkey) for first-order month, a
    key-partitioned join back (sort-merge at scale; both sides shuffle
    once on custkey), then a bounded groupBy(cohort, offset) — output
    cardinality is months², independent of row count."""
    om = load(spark, sf_dir, "orders").select(
        "o_custkey", F.date_trunc("month", "o_orderdate").cast("date").alias("order_month")
    )
    first_m = om.groupBy("o_custkey").agg(F.min("order_month").alias("cohort_month"))
    return (
        om.join(first_m, "o_custkey")
        .groupBy(
            "cohort_month",
            F.months_between(F.col("order_month"), F.col("cohort_month"))
            .cast("bigint")
            .alias("month_offset"),
        )
        .agg(F.countDistinct("o_custkey").alias("n_customers"))
    )


@register(
    "q_ext_pareto_abc",
    oracle=f"""
WITH rev AS (
  SELECT l_partkey, SUM({SQL_REVENUE}) AS r FROM lineitem GROUP BY l_partkey
), ranked AS (
  SELECT r,
         SUM(r) OVER (ORDER BY r DESC, l_partkey) AS cum,
         SUM(r) OVER () AS total
  FROM rev
)
SELECT CASE WHEN CAST(cum AS DECIMAL(32,4)) * CAST(2 AS DECIMAL(2,0))
                 <= CAST(total AS DECIMAL(32,4)) THEN 'A'
            WHEN CAST(cum AS DECIMAL(32,4)) * CAST(5 AS DECIMAL(2,0))
                 <= CAST(total AS DECIMAL(32,4)) * CAST(4 AS DECIMAL(2,0)) THEN 'B'
            ELSE 'C' END AS abc_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(r) AS DOUBLE) AS class_revenue
FROM ranked GROUP BY 1
""",
)
def q_ext_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification: parts ranked by revenue; class A
    covers the first 50 % of cumulative revenue, B to 80 %, C the tail.

    The naive plan is ``SUM() OVER (ORDER BY rev DESC)`` — a GLOBAL
    window that Spark executes in a single task, which at 100 TB means
    one executor sorts every part. Instead the cumulative sum runs
    through :func:`octopufs_spark.scale.global_cumsum`: range-partition
    on the sort key, parallel per-partition prefix sums, broadcast
    offsets. Sums stay DECIMAL end-to-end so the distributed result is
    bit-identical to the oracle's single-window one; class boundaries
    are integer-scaled decimal compares (cum*2 <= total), never float.
    """
    li = load(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(F.sum(revenue_col()).alias("r"))
    total = rev.agg(F.sum("r").alias("total"))
    cum = global_cumsum(
        rev, [F.col("r").desc(), F.col("l_partkey")], "r", out_col="cum"
    ).crossJoin(F.broadcast(total))
    # Class boundaries in DECIMAL(32,4) with DECIMAL(2,0) literals:
    # 32+2+1 = 35 <= 38, so the products are exact on both engines.
    # (decimal(38,4) * int would exceed Spark's 38-digit cap and round
    # the reduced-scale product — observed as a 4-part misclassification
    # at sf0.1 before this cast.)
    c = F.col("cum").cast("decimal(32,4)")
    t = F.col("total").cast("decimal(32,4)")
    d2 = F.lit(2).cast("decimal(2,0)")
    d4 = F.lit(4).cast("decimal(2,0)")
    d5 = F.lit(5).cast("decimal(2,0)")
    classed = cum.withColumn(
        "abc_class",
        F.when(c * d2 <= t, "A").when(c * d5 <= t * d4, "B").otherwise("C"),
    )
    return classed.groupBy("abc_class").agg(
        F.count("*").alias("n_parts"),
        F.sum("r").cast("double").alias("class_revenue"),
    )


@register(
    "q_ext_basket_lift",
    oracle="""
WITH ob AS (
  SELECT DISTINCT l.l_orderkey, p.p_brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
), brand_cnt AS (
  SELECT p_brand, COUNT(*) AS cnt FROM ob GROUP BY p_brand
), total AS (
  SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM ob
), pairs AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, COUNT(*) AS pair_cnt
  FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY 1, 2
)
SELECT brand_a, brand_b, CAST(pair_cnt AS BIGINT) AS pair_cnt,
       CAST(ca.cnt AS BIGINT) AS cnt_a, CAST(cb.cnt AS BIGINT) AS cnt_b,
       (CAST(pair_cnt AS DOUBLE) * CAST(n_orders AS DOUBLE))
         / (CAST(ca.cnt AS DOUBLE) * CAST(cb.cnt AS DOUBLE)) AS lift
FROM pairs
JOIN brand_cnt ca ON pairs.brand_a = ca.p_brand
JOIN brand_cnt cb ON pairs.brand_b = cb.p_brand
CROSS JOIN total
WHERE pair_cnt >= 2
""",
)
def q_ext_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket lift for brand pairs co-purchased in one order:
    lift = P(a,b) / (P(a)·P(b)). Pair generation is a self-join on
    orderkey over the DISTINCT (order, brand) set — bounded at C(25,2)
    pairs per order since the brand domain is fixed, so the blow-up is
    a constant factor, not quadratic in corpus size. Brand marginals
    and the order total are broadcast (25 rows / 1 row). Lift is one
    double expression over exact int64 counts — identical IEEE ops on
    both engines."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    brand_cnt = ob.groupBy("p_brand").agg(F.count("*").alias("cnt"))
    total = ob.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    a = ob.alias("a")
    b = ob.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("brand_a"), F.col("b.p_brand").alias("brand_b")
        )
        .agg(F.count("*").alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= 2)
    )
    ca = F.broadcast(brand_cnt.withColumnRenamed("cnt", "cnt_a"))
    cb = F.broadcast(brand_cnt.withColumnRenamed("cnt", "cnt_b"))
    return (
        pairs.join(ca, pairs.brand_a == ca.p_brand)
        .drop("p_brand")
        .join(cb, pairs.brand_b == cb.p_brand)
        .drop("p_brand")
        .crossJoin(F.broadcast(total))
        .select(
            "brand_a",
            "brand_b",
            "pair_cnt",
            "cnt_a",
            "cnt_b",
            (
                (F.col("pair_cnt").cast("double") * F.col("n_orders").cast("double"))
                / (F.col("cnt_a").cast("double") * F.col("cnt_b").cast("double"))
            ).alias("lift"),
        )
    )


@register(
    "q_ext_anomaly_zscore",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
), win AS (
  SELECT day, cnt,
         CAST(SUM(cnt)       OVER w AS DOUBLE) AS s,
         CAST(SUM(cnt * cnt) OVER w AS DOUBLE) AS sq,
         CAST(COUNT(cnt)     OVER w AS DOUBLE) AS n
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT day, cnt,
       CASE WHEN n >= 3 AND (sq - s * s / n) / (n - 1) > 0
            THEN (CAST(cnt AS DOUBLE) - s / n) / sqrt((sq - s * s / n) / (n - 1))
       END AS z,
       COALESCE(abs(CASE WHEN n >= 3 AND (sq - s * s / n) / (n - 1) > 0
            THEN (CAST(cnt AS DOUBLE) - s / n) / sqrt((sq - s * s / n) / (n - 1))
       END) > 2.0, FALSE) AS is_anomaly
FROM win
""",
)
def q_ext_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window z-score anomaly detection on daily event volume:
    each day scored against the mean/stddev of the preceding 7 days.

    stddev is NOT computed with the engines' stddev_samp (Welford vs
    two-pass accumulation differs in the last bits); instead sum,
    sum-of-squares and count come out of the window as exact integers
    and the variance is one shared double expression — bit-identical
    across engines. The window is global-ordered but runs over the
    per-DAY aggregate (bounded: one row per day regardless of corpus
    size), so the single-task window is a non-issue at 100 TB."""
    events = load(spark, sf_dir, "events")
    daily = events.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count("*").alias("cnt"))
    w = Window.orderBy("day").rowsBetween(-7, -1)
    win = daily.select(
        "day",
        "cnt",
        F.sum("cnt").over(w).cast("double").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).over(w).cast("double").alias("sq"),
        F.count("cnt").over(w).cast("double").alias("n"),
    )
    var = (F.col("sq") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1)
    z = F.when(
        (F.col("n") >= 3) & (var > 0),
        (F.col("cnt").cast("double") - F.col("s") / F.col("n")) / F.sqrt(var),
    )
    return win.select(
        "day",
        "cnt",
        z.alias("z"),
        F.coalesce(F.abs(z) > 2.0, F.lit(False)).alias("is_anomaly"),
    )


@register(
    "q_agg_histogram",
    oracle="""
SELECT bucket, CAST(bucket AS DOUBLE) * 20000 AS bucket_lo, cnt, sum_price
FROM (
  SELECT CAST(floor(o_totalprice / 20000) AS BIGINT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
  FROM orders GROUP BY 1
)
""",
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals (bucket width 20 000). The
    bucket id is floor(x / width) — one deterministic double division,
    identical on both engines — so the whole query is a single
    map-side-combinable groupBy: the canonical 'profile a 100 TB
    column in one pass' shape."""
    orders = load(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 20000)
    return orders.groupBy(bucket.alias("bucket")).agg(
        F.first(bucket.cast("double") * 20000).alias("bucket_lo"),
        F.count("*").alias("cnt"),
        dsum("o_totalprice", "sum_price"),
    )


@register(
    "q_ext_skyline",
    oracle="""
SELECT p.p_partkey, p.p_retailprice, p.p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size <= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size)
)
""",
)
def q_ext_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): parts not dominated on
    (retailprice low, size low). The oracle is the O(n²) NOT EXISTS
    definition; the Spark plan is the O(n log n) sweep — sort by price
    and take running minima, no pair join anywhere:

    - dominated by a strictly cheaper part: min(size) over a RANGE
      window ending 1 cent below (prices scaled to integer cents so
      the strict range bound is expressible) is <= this size;
    - dominated at equal price: min(size) over the same-price
      partition is < this size.

    Both windows order by a single key; at cluster scale the same
    sweep distributes with range partitioning + broadcast partition
    minima (the global_cumsum pattern with MIN)."""
    part = load(spark, sf_dir, "part").select("p_partkey", "p_retailprice", "p_size")
    cents = F.round(F.col("p_retailprice") * 100, 0).cast("long")
    w_cheaper = (
        Window.orderBy("price_cents").rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same = Window.partitionBy("price_cents")
    scored = (
        part.withColumn("price_cents", cents)
        .withColumn("min_size_cheaper", F.min("p_size").over(w_cheaper))
        .withColumn("min_size_same", F.min("p_size").over(w_same))
    )
    return scored.filter(
        (F.col("min_size_cheaper").isNull() | (F.col("min_size_cheaper") > F.col("p_size")))
        & (F.col("p_size") <= F.col("min_size_same"))
    ).select("p_partkey", "p_retailprice", "p_size")


@register(
    "q_stream_topk",
    oracle="""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS window_start, event_type,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
), ranked AS (
  SELECT window_start, event_type, cnt,
         row_number() OVER (PARTITION BY window_start
                            ORDER BY cnt DESC, event_type) AS rnk
  FROM hourly
)
SELECT window_start, event_type, cnt, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= 3
""",
)
def q_stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending-items batch twin: top-3 event types per tumbling
    1-hour window. Uses the streaming-compatible ``F.window`` bucketing
    (epoch-aligned, so it equals date_trunc('hour')) + a rank window
    PARTITIONED by the hour — every window's ranking runs in parallel,
    no global ordering anywhere. The deterministic tiebreak
    (cnt DESC, event_type) makes top-k reproducible across engines."""
    events = load(spark, sf_dir, "events")
    hourly = events.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type"
    ).agg(F.count("*").alias("cnt"))
    ranked = hourly.select(
        F.col("w.start").alias("window_start"), "event_type", "cnt"
    ).withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("window_start").orderBy(
                F.col("cnt").desc(), "event_type"
            )
        ),
    )
    return ranked.filter(F.col("rnk") <= 3)
