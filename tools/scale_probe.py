"""Scale probes: run headline operators on synthetic data 10-100x the
bench fixture and under deliberate skew, so SCALE.md's claims carry
measurements instead of assertions.

    python tools/scale_probe.py [n_events_millions]

Generates data with spark.range (no fixture writes), times each probe
with one warm-up, and prints a markdown table row per probe. Used to
refresh the "Measured" notes in SCALE.md per round.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from octopufs_spark.session import get_spark  # noqa: E402


def timed(label, build, execute=None):
    """One warm-up + one timed run of `build()` (a DataFrame factory)."""
    run = execute or (lambda df: df.write.format("noop").mode("overwrite").save())
    run(build())
    t0 = time.perf_counter()
    run(build())
    secs = time.perf_counter() - t0
    print(f"| {label} | {secs:.1f} s |", flush=True)
    return secs


def main() -> None:
    mm = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    n = int(mm * 1_000_000)
    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    # synthetic events: n rows, 50k users, timestamps over ~4 months
    events = (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            (F.col("id") % 50_000).alias("user_id"),
            F.timestamp_seconds(F.lit(1_700_000_000) + (F.col("id") * 7) % 10_000_000).alias("ts"),
            (F.col("id") % 997).cast("double").alias("value"),
            F.concat(F.lit("w"), (F.col("id") % 30_000).cast("string")).alias("word"),
        )
        .localCheckpoint()
    )
    print(f"probe corpus: {n:,} events, 50k users\n")
    print("| probe | time |\n|---|---|")

    timed(
        f"hash agg: sum/count per user ({mm:g}M rows)",
        lambda: events.groupBy("user_id").agg(
            F.count("*").alias("c"), F.sum("value").alias("s")
        ),
    )

    timed(
        f"sessionize (lag-gap + running sum, {mm:g}M rows)",
        lambda: _sessionize(events),
    )

    timed(
        f"exact dedup groupBy(md5) ({mm:g}M rows, ~30k distinct)",
        lambda: events.groupBy(F.md5("word").alias("h")).agg(
            F.min("event_id").alias("survivor"), F.count("*").alias("dups")
        ),
    )

    timed(
        f"windowed top-3 per user ({mm:g}M rows)",
        lambda: _topk(events),
    )

    # skew: one user owns ~25% of all events
    skewed = events.withColumn(
        "user_id", F.when(F.col("event_id") % 4 == 0, 7).otherwise(F.col("user_id"))
    ).localCheckpoint()
    timed(
        f"skewed agg, AQE skew handling (user 7 = 25% of {mm:g}M rows)",
        lambda: skewed.groupBy("user_id").agg(F.sum("value").alias("s")),
    )

    from octopufs_spark.scale import salted_count

    timed(
        f"skewed distinct-ish count, salted (16 salts)",
        lambda: salted_count(skewed, "user_id", n_salts=16),
    )

    # connected components on a 1M-edge graph: 200k chains of length 10
    # (diameter 10 → pointer doubling needs ~4 rounds, not 10)
    from octopufs_spark.llm.dedup import connected_components

    edges = (
        spark.range(2_000_000)
        .where((F.col("id") % 10) != 9)  # break into chains of 10
        .select(F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
        .localCheckpoint()
    )

    def cc_run(df):
        out = connected_components(edges, partitions=32)
        n = out.select("cluster_id").distinct().count()
        assert n == 200_000, n

    timed("connected components, 1.8M edges / 200k chains (diam 10)", lambda: edges, cc_run)

    # fs toolkit: list + du over a 2,000-file tree (object-store-ish
    # file counts; driver-threaded BFS)
    import shutil
    import tempfile
    from pathlib import Path

    from octopufs_spark.fs.core import get_size, list_tree

    root = Path(tempfile.mkdtemp(prefix="probe_fs_"))
    try:
        for d in range(40):
            (root / f"d{d}").mkdir()
            for f_i in range(50):
                (root / f"d{d}" / f"f{f_i}.bin").write_bytes(b"x" * 1024)
        t0 = time.perf_counter()
        els = list_tree(str(root))
        sz = get_size(str(root), skip_file_details=False).get_size_of_path(str(root))
        assert sz == 40 * 50 * 1024 and sum(1 for e in els if not e.is_dir) == 2000
        print(f"| threaded list+du, 2,000 files / 40 dirs | {time.perf_counter()-t0:.1f} s |")
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _sessionize(events):
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis(F.col("ts"))
    flag = F.when(ms - F.lag(ms).over(w) > 1_800_000, 1).otherwise(0)
    sess = events.select(
        "user_id",
        "ts",
        F.sum(flag).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).alias("sn"),
    )
    return sess.groupBy("user_id", "sn").agg(F.count("*").alias("c"))


def _topk(events):
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return events.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 3)


if __name__ == "__main__":
    main()
