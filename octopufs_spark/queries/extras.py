"""Additional operator coverage: CSV source, window variants, regexp,
pivot, median, full-outer join, grouping sets.

Rounds out SURVEY.md §2B/§2C: the reference ingests CSV with
header+inferSchema (reference: src/test/scala/Test.scala:81-86); the
rest are engine-floor operators a complete analytics surface needs.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from octopufs_spark.queries.common import DEC, SQL_DSUM, dsum
from octopufs_spark.registry import register
from octopufs_spark.tables import load


@register(
    "q_scan_csv",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS cnt,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
FROM customer GROUP BY c_mktsegment
""",
)
def q_scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV ingestion round-trip (reference: CSV read with header +
    inferSchema, src/test/scala/Test.scala:81-86): dump customer to
    CSV, re-read with header+inferSchema, aggregate. The aggregate goes
    through the decimal-exact path, so the result matches the oracle
    computed straight from parquet — proving the CSV codec is lossless
    for this data."""
    out = tempfile.mkdtemp(prefix="octopufs_csv_")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")
    cust.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.csv(out, header=True, inferSchema=True)
    return back.groupBy("c_mktsegment").agg(
        F.count("*").alias("cnt"), dsum("c_acctbal", "sum_bal")
    )


@register(
    "q_scan_text",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(len(text)) AS BIGINT) AS total_chars,
       CAST(MIN(len(text)) AS BIGINT) AS min_len,
       CAST(MAX(len(text)) AS BIGINT) AS max_len
FROM documents
""",
)
def q_scan_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain-text (line-per-record) ingestion round-trip: dump the
    documents' text column to .txt files, re-read with
    ``spark.read.text``, aggregate line stats. The fixture texts
    contain no newlines, so one doc = one line and the re-read stats
    must equal the oracle computed straight from parquet — proving the
    text source/sink is lossless. The raw-lines source is the entry
    point for every non-structured corpus (crawl dumps, logs)."""
    out = tempfile.mkdtemp(prefix="octopufs_text_")
    docs = load(spark, sf_dir, "documents").select("text")
    docs.write.mode("overwrite").text(out)
    back = spark.read.text(out)
    return back.agg(
        F.count("*").alias("n_lines"),
        F.sum(F.length("value")).alias("total_chars"),
        F.min(F.length("value")).cast("long").alias("min_len"),
        F.max(F.length("value")).cast("long").alias("max_len"),
    )


@register(
    "q_scan_json",
    oracle=f"""
SELECT o_orderstatus, COUNT(*) AS cnt,
       {SQL_DSUM.format(col="o_totalprice", alias="sum_price")},
       MIN(EXTRACT(year FROM o_orderdate)) AS min_year
FROM orders GROUP BY o_orderstatus
""",
)
def q_scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines ingestion round-trip: dump orders to JSON, re-read
    with the source schema, aggregate — proves the JSON codec (incl.
    timestamp round-trip under the pinned UTC session) is lossless."""
    out = tempfile.mkdtemp(prefix="octopufs_json_")
    orders = load(spark, sf_dir, "orders")
    orders.write.mode("overwrite").json(out)
    back = spark.read.schema(orders.schema).json(out)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("cnt"),
        dsum("o_totalprice", "sum_price"),
        F.min(F.year("o_orderdate")).cast("long").alias("min_year"),
    )


@register(
    "q_window_dense_ntile",
    oracle="""
SELECT s_suppkey, s_nationkey, s_acctbal,
       DENSE_RANK() OVER (ORDER BY s_nationkey) AS nation_rank,
       NTILE(4) OVER (ORDER BY s_acctbal DESC, s_suppkey) AS bal_quartile
FROM supplier
""",
)
def q_window_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DENSE_RANK + NTILE quartiles (deterministic tiebreak) without
    the single-partition WindowExec of a bare ``Window.orderBy``:

    - DENSE_RANK over a value = row_number over the DISTINCT values
      (an aggregate-sized relation) joined back on the value — the
      distinct's global row number itself runs distributed
      (scale.global_row_number), and the join broadcasts when the
      value domain is small (25 nations here).
    - NTILE(k) is pure arithmetic on the distributed global row number
      and the total count, using SQL NTILE's exact size rule: the
      first ``n % k`` tiles get ``n//k + 1`` rows, the rest ``n//k``.
    """
    from octopufs_spark.scale import global_row_number

    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey", "s_acctbal")
    nations = supp.select("s_nationkey").distinct()
    nation_ranked, _ = global_row_number(nations, ["s_nationkey"], out_col="nation_rank")
    ranked, n = global_row_number(supp, [F.desc("s_acctbal"), F.asc("s_suppkey")])
    q, r = divmod(n, 4)
    big = r * (q + 1)  # rows covered by the (q+1)-sized leading tiles
    tile = F.when(
        F.col("_rn") <= F.lit(big),
        F.ceil(F.col("_rn") / F.lit(max(q + 1, 1))),
    ).otherwise(F.lit(r) + F.ceil((F.col("_rn") - F.lit(big)) / F.lit(max(q, 1))))
    return ranked.join(F.broadcast(nation_ranked), "s_nationkey").select(
        "s_suppkey",
        "s_nationkey",
        "s_acctbal",
        F.col("nation_rank").cast("long").alias("nation_rank"),
        tile.cast("long").alias("bal_quartile"),
    )


@register(
    "q_window_first_last",
    oracle="""
SELECT DISTINCT o_custkey,
       FIRST_VALUE(o_orderkey) OVER w AS first_order,
       LAST_VALUE(o_orderkey) OVER w AS last_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE/LAST_VALUE over an unbounded frame per customer."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.first("o_orderkey").over(w).alias("first_order"),
            F.last("o_orderkey").over(w).alias("last_order"),
        )
        .distinct()
    )


@register(
    "q_scalar_regexp",
    oracle="""
SELECT p_partkey, p_name,
       regexp_extract(p_name, '([a-z]+)$', 1) AS noun,
       CASE WHEN regexp_matches(p_name, '^(red|blue|green)') THEN 1 ELSE 0 END AS is_color
FROM part
""",
)
def q_scalar_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract + regexp predicate."""
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        "p_name",
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("noun"),
        F.when(F.col("p_name").rlike(r"^(red|blue|green)"), 1).otherwise(0).alias("is_color"),
    )


@register(
    "q_agg_pivot",
    oracle=f"""
SELECT l_returnflag,
       {SQL_DSUM.format(col="CASE WHEN l_linestatus = 'O' THEN l_quantity END", alias="qty_O")},
       {SQL_DSUM.format(col="CASE WHEN l_linestatus = 'F' THEN l_quantity END", alias="qty_F")}
FROM lineitem GROUP BY l_returnflag
""",
)
def q_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT on l_linestatus (oracle: equivalent conditional aggregation)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double"))
        .withColumnRenamed("O", "qty_O")
        .withColumnRenamed("F", "qty_F")
    )


@register(
    "q_agg_median",
    oracle="""
SELECT o_orderpriority,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS median_price
FROM (
  SELECT o_orderpriority, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
)
WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
GROUP BY o_orderpriority
""",
)
def q_agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped median via middle-row selection.

    Engine median built-ins disagree (Spark percentile interpolates,
    DuckDB MEDIAN is discrete on DECIMAL), so the median is computed
    from first principles identically on both sides: pick the one or
    two middle rows per group, average them decimal-exactly. The
    compaction heuristic uses the same median idea on file sizes
    (reference: Coalesce.scala:19-31).
    """
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wc = Window.partitionBy("o_orderpriority")
    mid = orders.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("n"),
    ).where(
        (F.col("rn") == F.expr("(n + 1) div 2")) | (F.col("rn") == F.expr("(n + 2) div 2"))
    )
    return mid.groupBy("o_orderpriority").agg(
        (F.sum(F.col("o_totalprice").cast(DEC)).cast("double") / F.count("*")).alias(
            "median_price"
        )
    )


@register(
    "q_agg_percentile_disc",
    oracle="""
SELECT l_returnflag,
       CAST(quantile_disc(CAST(l_quantity AS DECIMAL(18,2)), 0.25) AS DOUBLE) AS p25,
       CAST(quantile_disc(CAST(l_quantity AS DECIMAL(18,2)), 0.50) AS DOUBLE) AS p50,
       CAST(quantile_disc(CAST(l_quantity AS DECIMAL(18,2)), 0.95) AS DOUBLE) AS p95
FROM lineitem GROUP BY l_returnflag
""",
)
def q_agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentiles (SQL-standard WITHIN GROUP syntax): exact,
    value-from-the-data — identical semantics to DuckDB quantile_disc."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("_li_pd")
    return spark.sql(
        f"""
        SELECT l_returnflag,
               CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY CAST(l_quantity AS {DEC})) AS DOUBLE) AS p25,
               CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY CAST(l_quantity AS {DEC})) AS DOUBLE) AS p50,
               CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY CAST(l_quantity AS {DEC})) AS DOUBLE) AS p95
        FROM _li_pd GROUP BY l_returnflag
        """
    )


@register(
    "q_agg_percentile_approx",
    oracle="""
SELECT l_returnflag,
       CAST(quantile_disc(CAST(l_quantity AS DECIMAL(18,2)), 0.50) AS DOUBLE) AS exact_p50,
       CAST(ABS(CAST(approx_quantile(l_quantity, 0.50) AS DOUBLE)
                / CAST(quantile_disc(CAST(l_quantity AS DECIMAL(18,2)), 0.50) AS DOUBLE)
                - 1.0) <= 0.05 AS BOOLEAN) AS within_tolerance
FROM lineitem GROUP BY l_returnflag
""",
)
def q_agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate median — the sketch-based scale path for quantiles
    (mergeable, no per-group sort). Sketch outputs are engine-specific
    (Spark Greenwald-Khanna vs DuckDB t-digest), so the checkable
    contract mirrors q_agg_approx_distinct: each engine asserts its own
    estimate within 5% of its own exact median and emits
    (exact_p50, within_tolerance), which hashes deterministically."""
    li = load(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.expr(
            f"CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY CAST(l_quantity AS {DEC})) AS DOUBLE)"
        ).alias("exact_p50"),
        F.percentile_approx("l_quantity", 0.5).cast("double").alias("approx_p50"),
    )
    return agg.select(
        "l_returnflag",
        "exact_p50",
        (F.abs(F.col("approx_p50") / F.col("exact_p50") - 1.0) <= 0.05).alias(
            "within_tolerance"
        ),
    )


@register(
    "q_window_nth_value",
    oracle="""
SELECT o_custkey,
       o_orderkey,
       NTH_VALUE(o_totalprice, 2) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS second_order_price
FROM orders WHERE o_custkey < 100
""",
)
def q_window_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over an unbounded frame: each customer's 2nd-ever
    order price attached to every row (NULL for single-order
    customers). Deterministic via the (date, key) total order."""
    o = load(spark, sf_dir, "orders").where(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.nth_value("o_totalprice", 2).over(w).alias("second_order_price"),
    )


@register(
    "q_scalar_bitwise",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderkey & 255 AS BIGINT) AS low_byte,
       CAST(o_orderkey | 4096 AS BIGINT) AS with_flag,
       CAST(xor(o_orderkey, 21845) AS BIGINT) AS xored,
       CAST(o_orderkey << 2 AS BIGINT) AS shifted_l,
       CAST(o_orderkey >> 3 AS BIGINT) AS shifted_r,
       CAST(bit_count(o_orderkey) AS BIGINT) AS popcount
FROM orders WHERE o_orderkey < 4096
""",
)
def q_scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator surface: and/or/xor/shifts/popcount — the
    primitives behind bitmap indexes, bloom hashing and flag columns."""
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") < 4096)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).cast("long").alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).cast("long").alias("with_flag"),
        k.bitwiseXOR(F.lit(21845)).cast("long").alias("xored"),
        F.shiftleft(k, 2).cast("long").alias("shifted_l"),
        F.shiftright(k, 3).cast("long").alias("shifted_r"),
        F.bit_count(k).cast("long").alias("popcount"),
    )


@register(
    "q_agg_bool",
    oracle="""
SELECT o_orderpriority,
       bool_and(o_totalprice > 1000) AS all_over_1k,
       bool_or(o_orderstatus = 'F') AS any_finished,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders GROUP BY o_orderpriority
""",
)
def q_agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (every/any): assertion-style data-quality
    checks as single map-side-combinable aggregates."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.every(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.some(F.col("o_orderstatus") == "F").alias("any_finished"),
        F.count("*").alias("n"),
    )


@register(
    "q_agg_string_agg",
    oracle="""
SELECT c_nationkey,
       string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
       CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS n_segments
FROM customer GROUP BY c_nationkey
""",
)
def q_agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG/string_agg: sorted, distinct, comma-joined segment list
    per nation — deterministic because the list is sorted before
    joining (bare collect_list order is partition-dependent; sorting
    restores a stable value, which is the only way string aggregation
    is comparable across engines or across runs of the same engine)."""
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.concat_ws(
            ",", F.array_sort(F.collect_set("c_mktsegment"))
        ).alias("segments"),
        F.countDistinct("c_mktsegment").alias("n_segments"),
    )


@register(
    "q_agg_mode",
    oracle="""
WITH c AS (
  SELECT l_returnflag, CAST(month(l_shipdate) AS BIGINT) AS ship_month, COUNT(*) AS cnt
  FROM lineitem GROUP BY 1, 2
), r AS (
  SELECT l_returnflag, ship_month, cnt,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY cnt DESC, ship_month) AS rn
  FROM c
)
SELECT l_returnflag, ship_month AS mode_month, cnt AS mode_cnt
FROM r WHERE rn = 1
""",
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic grouped mode (most frequent ship month per
    returnflag). Built-in mode() breaks ties engine-specifically, so
    the portable formulation is count + row_number with a value
    tie-break — two stages that shuffle once on the (group, value)
    pair and once on the group. At scale this is the exact heavy-
    hitter-per-group pattern; approximate alternatives (count-min)
    drop in when value cardinality explodes."""
    li = load(spark, sf_dir, "lineitem")
    c = li.groupBy(
        "l_returnflag", F.month("l_shipdate").cast("long").alias("ship_month")
    ).agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("l_returnflag").orderBy(F.desc("cnt"), F.asc("ship_month"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("ship_month").alias("mode_month"),
            F.col("cnt").alias("mode_cnt"),
        )
    )


@register(
    "q_join_full_outer",
    oracle="""
SELECT n_nationkey, n_name, cust_cnt, supp_cnt
FROM (SELECT c_nationkey AS ck, COUNT(*) AS cust_cnt FROM customer GROUP BY c_nationkey) c
FULL OUTER JOIN (SELECT s_nationkey AS sk, COUNT(*) AS supp_cnt FROM supplier GROUP BY s_nationkey) s
  ON c.ck = s.sk
JOIN nation ON n_nationkey = COALESCE(c.ck, s.sk)
""",
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of per-nation customer/supplier counts."""
    cust = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("ck"))
        .agg(F.count("*").alias("cust_cnt"))
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("sk"))
        .agg(F.count("*").alias("supp_cnt"))
    )
    nation = load(spark, sf_dir, "nation")
    return (
        cust.join(supp, cust.ck == supp.sk, "full_outer")
        .join(F.broadcast(nation), nation.n_nationkey == F.coalesce(cust.ck, supp.sk))
        .select("n_nationkey", "n_name", "cust_cnt", "supp_cnt")
    )


@register(
    "q_join_asof",
    oracle="""
SELECT e.event_id, e.user_id, e.ts, p.ts AS purchase_ts, p.value AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') e
ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
  ON e.user_id = p.user_id AND p.ts <= e.ts
""",
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click matched to the user's most recent prior
    (or simultaneous) purchase. Spark has no native ASOF JOIN — this is
    the union-and-carry-forward composition (one shuffle, see
    octopufs_spark/timeseries.py); the oracle is DuckDB's native ASOF
    LEFT JOIN. Timestamps are unique per user in the fixture, so the
    match is deterministic."""
    from octopufs_spark.timeseries import asof_join

    events = load(spark, sf_dir, "events")
    clicks = events.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = asof_join(
        clicks, purchases, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=["ts", "value"], suffix="_p",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts_p").alias("purchase_ts"),
        F.col("value_p").alias("purchase_value"),
    )


@register(
    "q_join_interval",
    oracle="""
SELECT c.event_id AS click_id, s.event_id AS signup_id, c.ts AS click_ts
FROM (SELECT event_id, ts FROM events WHERE event_type = 'click') c
JOIN (SELECT event_id, ts AS s_start, ts + INTERVAL 1 HOUR AS s_end
      FROM events WHERE event_type = 'signup') s
  ON c.ts >= s.s_start AND c.ts < s.s_end
""",
)
def q_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join (no equi key): clicks falling inside the hour
    after any signup. Executed as a time-bucketed EQUI join + residual
    filter (octopufs_spark/timeseries.py interval_join) — cost scales
    with bucket co-occupancy, not the cross product. Oracle: DuckDB's
    native range join (IEJoin)."""
    from octopufs_spark.timeseries import interval_join

    events = load(spark, sf_dir, "events")
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    signups = events.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("ts").alias("s_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("s_end"),
    )
    out = interval_join(
        clicks, signups, point_ts="click_ts", start_col="s_start", end_col="s_end"
    )
    return out.select("click_id", "signup_id", "click_ts")


@register(
    "q_scalar_struct",
    oracle="""
SELECT event_type,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type
""",
)
def q_scalar_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json → typed struct → field access + aggregation: JSON
    parsed ONCE per row into a Catalyst struct (vs per-field
    get_json_object re-parsing), then aggregated as a native column."""
    from pyspark.sql.types import LongType, StructField, StructType

    e = load(spark, sf_dir, "events")
    parsed = e.withColumn(
        "p", F.from_json("props", StructType([StructField("k", LongType())]))
    )
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("p.k")).alias("sum_k"),
        F.max(F.col("p.k")).alias("max_k"),
    )


@register(
    "q_scalar_map",
    oracle="""
SELECT event_id, 'k' AS first_key,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_from_map
FROM events WHERE event_id < 1000
""",
)
def q_scalar_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON → map<string,long> → map_keys / element access."""
    e = load(spark, sf_dir, "events").where(F.col("event_id") < 1000)
    m = F.from_json("props", "map<string,bigint>")
    return e.select(
        "event_id",
        F.map_keys(m).getItem(0).alias("first_key"),
        m.getItem("k").alias("k_from_map"),
    )


@register(
    "q_agg_grouping_sets",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority,
       {SQL_DSUM.format(col="o_totalprice", alias="sum_price")}
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
""",
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither rollup nor cube)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("_orders_gs")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               {SQL_DSUM.format(col="o_totalprice", alias="sum_price")}
        FROM _orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@register(
    "q_scan_orc",
    oracle=f"""
SELECT o_orderstatus, COUNT(*) AS cnt,
       {SQL_DSUM.format(col="o_totalprice", alias="sum_price")}
FROM orders GROUP BY o_orderstatus
""",
)
def q_scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC ingestion round-trip: dump orders to ORC, re-read,
    aggregate — third columnar/source format alongside parquet and
    CSV/JSON (the oracle reads the same rows from parquet)."""
    out = tempfile.mkdtemp(prefix="octopufs_orc_")
    orders = load(spark, sf_dir, "orders")
    orders.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("cnt"), dsum("o_totalprice", "sum_price")
    )


@register(
    "q_agg_unpivot",
    oracle="""
WITH s AS (
  SELECT o_orderpriority,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
         CAST(COUNT(*) AS DOUBLE) AS n_orders,
         CAST(COUNT(DISTINCT o_custkey) AS DOUBLE) AS n_customers
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, metric, value
FROM s UNPIVOT (value FOR metric IN (total_price, n_orders, n_customers))
""",
)
def q_agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide per-priority metrics to long
    (priority, metric, value) — the inverse of q_agg_pivot. Spark's
    unpivot is a zero-shuffle Expand over the aggregate."""
    o = load(spark, sf_dir, "orders")
    s = o.groupBy("o_orderpriority").agg(
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total_price"),
        F.count("*").cast("double").alias("n_orders"),
        F.countDistinct("o_custkey").cast("double").alias("n_customers"),
    )
    return s.unpivot(
        ids=["o_orderpriority"],
        values=["total_price", "n_orders", "n_customers"],
        variableColumnName="metric",
        valueColumnName="value",
    )
