"""Time-series operators over the events table: gap-filled resampling
with forward fill, exact trailing EWMA, and the stream-stream interval
join's batch twin.

The hypertable-style surface (resample/gap-fill/smoothing) expressed
as DataFrame plans: sequence+explode builds the dense time spine,
window last(ignorenulls) forward-fills, and fixed-tap EWMA is a stack
of lag() terms with decimal-literal weights so both engines produce
bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from octopufs_spark.registry import register
from octopufs_spark.tables import load

# Trailing-8-tap EWMA, alpha=0.3: weights alpha*(1-alpha)^j are exact
# decimals (0.3 * 0.7^j), inlined as literals on BOTH engines so no
# floating-point pow() enters the comparison.
_EWMA_WEIGHTS = [
    "0.3",
    "0.21",
    "0.147",
    "0.1029",
    "0.07203",
    "0.050421",
    "0.0352947",
    "0.02470629",
]


@register(
    "q_ts_gapfill",
    oracle="""
WITH a AS (
  SELECT user_id, time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS bucket,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
  FROM events GROUP BY 1, 2
), bd AS (
  SELECT user_id, MIN(bucket) AS b0, MAX(bucket) AS b1 FROM a GROUP BY user_id
), sp AS (
  SELECT user_id, unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket FROM bd
)
SELECT sp.user_id, sp.bucket, a.avg_value AS value_ff
FROM sp ASOF JOIN a ON sp.user_id = a.user_id AND sp.bucket >= a.bucket
""",
)
def q_ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample to a dense hourly grid per user and forward-fill gaps
    with the last observed hourly average.

    The canonical hypertable gap-fill: aggregate to buckets (one
    shuffle, map-side combinable), derive each key's [min,max] span,
    explode a sequence() spine — generated, never materialized as
    input — left-join observations back and last(ignorenulls) over the
    per-user window. Everything shuffles on user_id once and stays
    there (AQE coalesces the spine join into the same exchange). The
    DuckDB twin forward-fills via ASOF JOIN — same semantics, so the
    fill logic itself is cross-checked, not just the buckets."""
    e = load(spark, sf_dir, "events")
    agg = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(
        (F.sum(F.col("value").cast("decimal(18,2)")).cast("double") / F.count("*")).alias(
            "avg_value"
        )
    )
    bounds = agg.groupBy("user_id").agg(
        F.min("bucket").alias("b0"), F.max("bucket").alias("b1")
    )
    spine = bounds.select(
        "user_id",
        F.explode(F.sequence("b0", "b1", F.expr("interval 1 hour"))).alias("bucket"),
    )
    joined = spine.join(agg, ["user_id", "bucket"], "left")
    w = Window.partitionBy("user_id").orderBy("bucket")
    return joined.select(
        "user_id",
        "bucket",
        F.last("avg_value", ignorenulls=True).over(w).alias("value_ff"),
    )


def _ewma_sql() -> str:
    # Each product v*w_j is an exact decimal of scale <= 12 and
    # magnitude well under 2^53, so CAST(... AS DOUBLE) is exact; the
    # doubles are then summed LEFT-TO-RIGHT in the same order as the
    # Spark expression, making the float accumulation bit-identical.
    # (A single wide decimal sum is NOT portable: mixed-scale decimal
    # addition overflows precision 38 and each engine rounds its own
    # way.)
    num = " + ".join(
        f"COALESCE(CAST(LAG(v, {j}) OVER w * {wj} AS DOUBLE), 0)"
        for j, wj in enumerate(_EWMA_WEIGHTS)
    )
    den = " + ".join(
        f"CASE WHEN LAG(v, {j}) OVER w IS NOT NULL THEN CAST({wj} AS DOUBLE) ELSE 0 END"
        for j, wj in enumerate(_EWMA_WEIGHTS)
    )
    return f"""
WITH o AS (
  SELECT event_id, user_id, CAST(value AS DECIMAL(18,2)) AS v FROM events
)
SELECT event_id, user_id,
       ({num}) / ({den}) AS ewma
FROM o
WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
"""


@register("q_ts_ewma", oracle=_ewma_sql())
def q_ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing exponentially-weighted moving average per user
    (alpha=0.3, 8 taps — weights below 0.025 truncated, standard for
    fixed-lag smoothing at scale).

    True recursive EWMA is not expressible as a window aggregate; the
    fixed-tap form is, and it's exact: eight lag() terms against one
    per-user window (ONE shuffle, one sort — Spark evaluates all lags
    in a single Window operator), decimal-literal weights, decimal
    accumulation, one double division at the end. Early rows normalize
    by the weight mass actually present. Compare a per-key
    applyInPandas recursion at 100 TB: same shuffle but every byte
    crosses the Arrow boundary — the all-JVM lag stack is the right
    plan."""
    e = load(spark, sf_dir, "events")
    o = e.select("event_id", "user_id", F.col("value").cast("decimal(18,2)").alias("v"))
    w = Window.partitionBy("user_id").orderBy("event_id")
    # Exact decimal product per tap, cast to (exactly representable)
    # double, then left-to-right double sums — see _ewma_sql for why
    # this, and not one wide decimal sum, is the cross-engine-exact
    # formulation.
    num = None
    den = None
    for j, wj in enumerate(_EWMA_WEIGHTS):
        lagged = F.lag("v", j).over(w)
        term = F.coalesce(
            (lagged * F.lit(wj).cast("decimal(18,10)")).cast("double"), F.lit(0.0)
        )
        mass = F.when(
            lagged.isNotNull(), F.lit(wj).cast("decimal(18,10)").cast("double")
        ).otherwise(F.lit(0.0))
        num = term if num is None else num + term
        den = mass if den is None else den + mass
    return o.select("event_id", "user_id", (num / den).alias("ewma"))


@register(
    "q_stream_join",
    oracle="""
SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
       CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS lag_seconds
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
""",
)
def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase attribution: purchases within 30 minutes after a
    click by the same user — the batch twin of a stream-stream interval
    join (tests/test_streaming.py runs the same plan as two
    watermarked streams).

    Equi-key on user_id carries the join (hash, not range): the time
    bound is a post-join filter inside the same codegen stage. At
    100 TB both sides shuffle on user_id once; in the streaming form
    the 30-minute bound plus watermarks is exactly what lets Spark
    expire join state instead of buffering forever."""
    e = load(spark, sf_dir, "events")
    c = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("c_ts"),
    )
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    joined = c.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("interval 30 minutes")),
    )
    return joined.select(
        "click_id",
        "purchase_id",
        "user_id",
        (F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts")).alias("lag_seconds"),
    )


@register(
    "q_ts_ohlc",
    oracle="""
WITH e AS (
  SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
         value, ts, event_id
  FROM events
), r AS (
  SELECT user_id, hour, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, hour ORDER BY ts, event_id) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY user_id, hour ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM e
)
SELECT user_id, hour,
       MIN(CASE WHEN rn_a = 1 THEN value END) AS open_v,
       MAX(CASE WHEN rn_d = 1 THEN value END) AS close_v,
       MIN(value) AS low_v,
       MAX(value) AS high_v,
       COUNT(*) AS n_events
FROM r GROUP BY user_id, hour
""",
)
def q_ts_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling (open/high/low/close per user per hour) — the
    classic hypertable resample for tick-style data. First/last are
    made deterministic by a total (ts, event_id) order via two
    row_number windows that share one (user_id, hour)-rooted exchange;
    min/max/count ride the same hash aggregate. No value arithmetic,
    so doubles compare exactly across engines."""
    e = load(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("hour", "ts").alias("hour"), "value", "ts", "event_id"
    )
    w = Window.partitionBy("user_id", "hour")
    r = e.select(
        "user_id",
        "hour",
        "value",
        F.row_number().over(w.orderBy(F.asc("ts"), F.asc("event_id"))).alias("rn_a"),
        F.row_number().over(w.orderBy(F.desc("ts"), F.desc("event_id"))).alias("rn_d"),
    )
    return r.groupBy("user_id", "hour").agg(
        F.min(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open_v"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close_v"),
        F.min("value").alias("low_v"),
        F.max("value").alias("high_v"),
        F.count("*").alias("n_events"),
    )


@register(
    "q_ext_retention",
    oracle="""
WITH f AS (
  SELECT user_id, MIN(time_bucket(INTERVAL 7 DAYS, CAST(ts AS TIMESTAMP),
                                  TIMESTAMP '2024-01-01')) AS cohort
  FROM events GROUP BY user_id
), a AS (
  SELECT DISTINCT user_id,
         time_bucket(INTERVAL 7 DAYS, CAST(ts AS TIMESTAMP),
                     TIMESTAMP '2024-01-01') AS week
  FROM events
)
SELECT f.cohort,
       CAST(date_diff('day', f.cohort, a.week) / 7 AS BIGINT) AS week_n,
       COUNT(*) AS active_users
FROM a JOIN f USING (user_id)
GROUP BY 1, 2
""",
)
def q_ext_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-active week
    (origin-anchored 7-day buckets), counted in each subsequent week —
    the canonical product-analytics rollup.

    Two aggregations on user_id (first-week + distinct active weeks,
    both map-side combinable) and one join that stays in the user_id
    exchange; the final groupBy is cohort×week (tiny). At 100 TB the
    first-activity table is the only state carried across the join and
    it is one row per user."""
    e = load(spark, sf_dir, "events")
    week = F.timestamp_seconds(
        F.unix_timestamp(F.lit("2024-01-01 00:00:00"))
        + (
            (F.unix_timestamp(F.col("ts").cast("timestamp"))
             - F.unix_timestamp(F.lit("2024-01-01 00:00:00")))
            / (7 * 86400)
        ).cast("long") * (7 * 86400)
    ).cast("timestamp_ntz")
    active = e.select("user_id", week.alias("week")).distinct()
    first = active.groupBy("user_id").agg(F.min("week").alias("cohort"))
    return (
        active.join(first, "user_id")
        .groupBy(
            "cohort",
            (F.datediff(F.col("week"), F.col("cohort")) / 7).cast("long").alias("week_n"),
        )
        .agg(F.count("*").alias("active_users"))
    )
