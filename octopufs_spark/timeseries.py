"""Time-series operators Spark lacks natively: as-of join.

The as-of join matches each left row to the most recent right row at
or before its timestamp, per key. Spark has no built-in, so it is
composed from existing operators — the union-and-carry-forward trick:

1. tag both sides and union them (schema-aligned),
2. one window per key ordered by (ts, right-rows-first),
   ``last(right_value, ignorenulls=True)`` over the preceding frame
   carries the latest right value forward,
3. keep only left rows.

Cost: ONE shuffle on the key + a per-partition sort — the same price
as a sort-merge join, with no range-explosion. This is the shape that
survives 100 TB: no point-in-interval cross join, no per-key loops; a
skewed key can additionally be range-bucketed by time before the
window. (An alternative formulation via join + groupBy-max costs two
shuffles; this costs one.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For every left row: the latest right row with
    ``right.right_ts <= left.left_ts`` and equal ``on`` key.

    Returns the left columns plus ``<value_col><suffix>`` for each
    requested right value column (null when no right row precedes).
    Right-side ties on (key, ts) are resolved by last-in-sort-order;
    pass pre-deduplicated rights (or include a tiebreak value) when
    tie determinism matters.
    """
    lcols = left.columns
    tagged_left = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in value_cols],
    )
    tagged_right = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_rv_{c}") for c in value_cols],
    )
    # right rows sort before left rows at equal ts (_is_left ascending),
    # so a right row AT the left row's timestamp is visible to it (<=).
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_left.unionByName(tagged_right).select(
        "_is_left",
        *lcols,
        *[
            F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return carried.where(F.col("_is_left") == 1).drop("_is_left")


def range_bucket(ts: Column, interval: str = "1 hour") -> Column:
    """Time-bucket helper for pre-bucketing skewed as-of keys:
    window(ts, interval).start as a secondary partition key."""
    return F.window(ts, interval)["start"]


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Range join: each point row matched to every interval row with
    ``start <= point_ts < end`` — WITHOUT an equi key.

    A naive formulation is a cross join with a range filter (O(n·m),
    or a broadcast nested loop). The scale path buckets time: points
    get their containing bucket; each interval is exploded to every
    bucket it overlaps (short intervals → few copies); the join becomes
    an EQUI join on bucket plus a residual range filter. Cost scales
    with bucket co-occupancy, not the cross product — the same banding
    idea the LSH dedup path uses, applied to time. Pick bucket_seconds
    near the typical interval length: longer buckets → fewer interval
    copies but denser buckets.

    Each matching (point, interval) pair appears exactly once (a point
    lives in exactly one bucket).
    """
    us = 1_000_000 * bucket_seconds
    p = points.withColumn("_b", (F.unix_micros(F.col(point_ts).cast("timestamp")) / us).cast("long"))
    i = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                (F.unix_micros(F.col(start_col).cast("timestamp")) / us).cast("long"),
                # end is exclusive: last overlapped bucket holds end - 1µs
                ((F.unix_micros(F.col(end_col).cast("timestamp")) - 1) / us).cast("long"),
            )
        ),
    )
    out = p.join(
        i,
        (p["_b"] == i["_b"])
        & (p[point_ts] >= i[start_col])
        & (p[point_ts] < i[end_col]),
        how,
    )
    return out.drop("_b")
