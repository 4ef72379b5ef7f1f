"""Scale utilities: skew-salted joins and bucketed co-located joins.

These are the knobs a 100 TB deployment turns when AQE's automatic
handling isn't enough:

- **Salting** splits a hot key across ``n`` synthetic sub-keys so one
  executor doesn't receive the whole key's rows. The small side is
  replicated n× (an explode, not a shuffle), the big side gets a
  random salt, and the join key becomes (key, salt). Equivalent rows,
  n-way parallel hot keys.
- **Bucketing** pre-shuffles both tables once at write time
  (``bucketBy`` on the join key). Later joins between tables bucketed
  the same way read co-located buckets and skip the exchange entirely
  — the shuffle is amortized across every downstream join.

AQE (enabled by the session defaults) already splits skewed partitions
for sort-merge joins; explicit salting remains for aggregations and
for engines/joins AQE can't rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed big side to a small side with key salting.

    The big side gets a uniform random salt in [0, n_salts); the small
    side is exploded n_salts× so every (key, salt) combination exists.
    The join then distributes each hot key over n_salts reducers.
    Result is row-identical to ``big.join(small, big_key == small_key)``
    for inner/left joins only: under right/full outer an unmatched
    small-side row would surface once per salt replica, so those modes
    are rejected rather than silently multiplied.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r}: the exploded "
            "small side would emit unmatched rows once per salt under "
            "right/full outer semantics"
        )
    salted_big = big.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_big.join(
        salted_small,
        (salted_big[big_key] == salted_small[small_key])
        & (salted_big["_salt"] == salted_small["_salt"]),
        how,
    )
    return out.drop("_salt")


def salted_count(df: DataFrame, key: str, n_salts: int = 8) -> DataFrame:
    """Two-phase skew-safe count per key: partial count on (key, salt),
    then final sum on key. The first shuffle spreads a hot key over
    n_salts partitions; the second handles only n_salts rows per key.
    """
    return (
        df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
        .groupBy(key, "_salt")
        .agg(F.count("*").alias("_partial"))
        .groupBy(key)
        .agg(F.sum("_partial").alias("cnt"))
    )


def global_cumsum(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    out_col: str = "cum",
    n_parts: int = 32,
) -> DataFrame:
    """Distributed global running sum — the scale-safe replacement for
    ``SUM() OVER (ORDER BY ...)`` with no PARTITION BY, whose Spark plan
    funnels every row through ONE task.

    Three bounded steps instead:

    1. ``repartitionByRange`` on the sort keys — each of ``n_parts``
       tasks holds a contiguous key range (one shuffle, same cost as
       the sort the window needs anyway).
    2. A per-partition running sum via a window PARTITIONED by
       ``spark_partition_id()`` — fully parallel.
    3. Per-partition totals (``n_parts`` rows) are collected, turned
       into exclusive prefix offsets on the driver, and joined back
       broadcast. ``cum = local_cum + offset``.

    Exactness: sums are computed in the value column's own type, so
    pass a DECIMAL column when cross-engine bit-equality matters —
    the result is then independent of partitioning and matches a
    single-partition window or any other engine exactly.

    ``order_cols`` are Column objects (e.g. ``F.col("r").desc()``) or
    names; they must be a total order (include a tiebreak key) for the
    running sum to be well-defined.
    """
    from pyspark.sql.window import Window

    ranged = df.repartitionByRange(n_parts, *order_cols)
    with_pid = ranged.withColumn("_pid", F.spark_partition_id())
    local_w = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Pin the partitioning: repartitionByRange picks boundaries by
    # SAMPLING, which may differ between executions — the totals
    # collect below and the caller's final action must see the SAME
    # partition assignment or the offsets are wrong. localCheckpoint
    # materializes one assignment (and truncates lineage, so the sort
    # isn't recomputed either).
    local = with_pid.withColumn(
        "_local_cum", F.sum(F.col(value_col)).over(local_w)
    ).localCheckpoint()
    totals = (
        local.groupBy("_pid").agg(F.sum(F.col(value_col)).alias("_total")).collect()
    )
    # Exclusive prefix offsets over partition ids (range partitions are
    # already in key order: pid k holds keys sorted before pid k+1).
    totals.sort(key=lambda r: r["_pid"])
    offsets, acc = [], None
    for row in totals:
        offsets.append((row["_pid"], acc))
        acc = row["_total"] if acc is None else acc + row["_total"]
    value_type = dict(local.dtypes)["_local_cum"]
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, f"_pid int, _offset {value_type}")
    out = (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn(
            out_col,
            F.when(F.col("_offset").isNull(), F.col("_local_cum")).otherwise(
                F.col("_local_cum") + F.col("_offset")
            ),
        )
        .drop("_pid", "_local_cum", "_offset")
    )
    return out


def global_row_number(
    df: DataFrame,
    order_cols: list,
    out_col: str = "_rn",
    n_parts: int = 32,
) -> tuple[DataFrame, int]:
    """Distributed global ROW_NUMBER() OVER (ORDER BY ...) — the
    scale-safe replacement for an unpartitioned ranking window, whose
    Spark plan (WindowExec, "No Partition Defined") moves the ENTIRE
    relation into one task. Same three-step shape as
    :func:`global_cumsum`:

    1. ``repartitionByRange`` on the sort keys: contiguous key ranges,
       one shuffle (the sort any global rank needs anyway).
    2. Per-partition local row numbers via a window PARTITIONED by
       ``spark_partition_id()`` — fully parallel.
    3. Per-partition counts (``n_parts`` rows) collected, turned into
       exclusive prefix offsets, broadcast-joined back:
       ``rn = local_rn + offset``.

    ``order_cols`` must be a TOTAL order (include a tiebreak key) —
    then the result is exactly the single-partition window's, and
    every global rank family derives from it arithmetically:
    PERCENT_RANK = (rn-1)/(n-1), CUME_DIST = rn/n (total order ⇒
    every row is its own peer group), NTILE(k) by the size formula,
    DENSE_RANK over values = row_number over DISTINCT values joined
    back. Returns ``(df_with_rn, total_rows)`` — the count is free
    (sum of the collected per-partition counts)."""
    from pyspark.sql.window import Window

    ranged = df.repartitionByRange(n_parts, *order_cols)
    with_pid = ranged.withColumn("_pid", F.spark_partition_id())
    local_w = Window.partitionBy("_pid").orderBy(*order_cols)
    # localCheckpoint pins the sampled range boundaries: the counts
    # collect and the caller's final action must agree on partition
    # assignment (see global_cumsum).
    local = with_pid.withColumn("_local_rn", F.row_number().over(local_w)).localCheckpoint()
    counts = local.groupBy("_pid").agg(F.count("*").alias("_cnt")).collect()
    counts.sort(key=lambda r: r["_pid"])
    offsets, acc = [], 0
    for row in counts:
        offsets.append((row["_pid"], acc))
        acc += row["_cnt"]
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, "_pid int, _offset long")
    out = (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn(out_col, (F.col("_local_rn") + F.col("_offset")).cast("long"))
        .drop("_pid", "_local_rn", "_offset")
    )
    return out, acc


def write_bucketed(
    df: DataFrame, table: str, bucket_key: str, n_buckets: int = 8, path: str | None = None
) -> None:
    """Persist as a bucketed (+sorted) table: one shuffle now, zero
    shuffles in every future equi-join/aggregation on the bucket key
    between same-bucketed tables."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_key).sortBy(bucket_key)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def zorder_key(
    c1, c2, min1, max1, min2, max2, bits: int = 12
):
    """Morton (Z-order) curve key of two columns — pure JVM
    expression, no UDF: each column is normalized to [0, 2^bits) by
    the caller-supplied min/max (one tiny agg at call time), then the
    bit planes are interleaved with shiftleft/shiftright folds inside
    whole-stage codegen.

    The curve linearizes 2-D proximity, so range-partitioning + sorting
    by it clusters rows that are close in BOTH dimensions into the same
    files — the layout behind Delta/Iceberg OPTIMIZE ZORDER. 12 bits
    per dimension (24-bit key) is plenty: file counts are < 2^24.
    """
    def norm(c, lo, hi):
        span = F.lit(float(hi - lo)) if hi > lo else F.lit(1.0)
        scaled = ((c.cast("double") - F.lit(float(lo))) / span) * ((1 << bits) - 1)
        return F.least(
            F.greatest(F.round(scaled, 0).cast("long"), F.lit(0)),
            F.lit((1 << bits) - 1),
        )

    n1, n2 = norm(c1, min1, max1), norm(c2, min2, max2)
    key = F.lit(0).cast("long")
    for i in range(bits):
        bit1 = F.shiftright(n1, i).bitwiseAND(F.lit(1))
        bit2 = F.shiftright(n2, i).bitwiseAND(F.lit(1))
        key = key + F.shiftleft(bit1, 2 * i) + F.shiftleft(bit2, 2 * i + 1)
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    col1: str,
    col2: str,
    n_files: int = 16,
    bits: int = 12,
) -> None:
    """Write ``df`` Z-ordered on (col1, col2): range-partition on the
    Morton key and sort within partitions, so every output file covers
    a small rectangle of the 2-D key space instead of a full-width
    stripe. Parquet min/max footer stats on BOTH columns then prune
    files for 2-D predicates — a plain sort prunes only its leading
    column. One extra shuffle at write time, amortized over every
    downstream selective read; at 100 TB this is the difference
    between scanning a row-group stripe and scanning the whole table
    for point-in-rectangle queries."""
    stats = df.agg(
        F.min(col1), F.max(col1), F.min(col2), F.max(col2)
    ).collect()[0]
    key = zorder_key(
        F.col(col1), F.col(col2), stats[0], stats[1], stats[2], stats[3], bits=bits
    )
    (
        df.withColumn("_z", key)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
