"""Incremental materialized-view maintenance demo — the r8 surface:

1. seed an orders-like manifest table (zone-map stats on) and declare
   a count/sum/avg/min/max rollup view over it,
2. append a batch — the view folds ONLY that commit's files,
3. MOR-delete a sliver positionally — the view folds the NEGATED
   partials of exactly the vector's files (mode stays incremental;
   min/max verified untouched via the extremum check),
4. equality-delete a narrow key range — the subtract scan prunes the
   parent file set by the vector's key range through prune_plan,
5. delete a group's minimum — the extremum check flags it and the
   refresh falls back to ONE full recompute, then resumes,
6. run maintain_stream(availableNow) — the source's commit stream
   schedules the remaining refreshes; a replayed run is a no-op,
7. every step cross-checked against a recompute of the live snapshot.

Run: python examples/mv_maintenance_demo.py
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from octopufs_spark.manifest import ManifestTable, write_and_commit  # noqa: E402
from octopufs_spark.merge import (  # noqa: E402
    delete_where_mor,
    delete_where_mor_positional,
)
from octopufs_spark.mv import MaterializedView  # noqa: E402
from octopufs_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("mv_maintenance_demo")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="mv_demo_")
    src = ManifestTable(f"{work}/orders")

    def orders(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("o_id"),
            (F.col("id") % 5).alias("region"),
            (F.col("id") * 7 % 997).alias("amount"),
        )

    def recompute():
        return {
            tuple(r)
            for r in src.read(spark)
            .groupBy("region")
            .agg(
                F.count("*").alias("n"),
                F.sum("amount").alias("total"),
                F.avg("amount").alias("mean"),
                F.min("amount").alias("lo"),
                F.max("amount").alias("hi"),
            )
            .collect()
        }

    def view_rows(mv):
        return {tuple(r) for r in mv.read(spark).collect()}

    write_and_commit(orders(0, 10_000).repartition(4), src, stats=True)
    mv = MaterializedView(
        src,
        f"{work}/rollup",
        ["region"],
        {
            "n": ("count", "*"),
            "total": ("sum", "amount"),
            "mean": ("avg", "amount"),
            "lo": ("min", "amount"),
            "hi": ("max", "amount"),
        },
    )
    mv.refresh(spark)
    assert view_rows(mv) == recompute()
    print(f"built: {mv.view.read_manifest().meta['mv']['mode']}")

    write_and_commit(orders(10_000, 12_000), src, mode="append", stats=True)
    mv.refresh(spark)
    assert mv.view.read_manifest().meta["mv"]["mode"] == "incremental"
    assert view_rows(mv) == recompute()
    print("append: folded incrementally")

    # positional MOR delete of interior rows: folds, min/max untouched
    delete_where_mor_positional(spark, src, "o_id >= 10500 and o_id < 10600")
    mv.refresh(spark)
    assert mv.view.read_manifest().meta["mv"]["mode"] == "incremental"
    assert view_rows(mv) == recompute()
    print("positional delete: folded (vector-scoped scan)")

    # equality delete of a narrow key range: parent files pruned by range
    delete_where_mor(spark, src, spark.range(3_000, 3_050).select(F.col("id").alias("o_id")), ["o_id"])
    mv.refresh(spark)
    assert mv.view.read_manifest().meta["mv"]["mode"] == "incremental"
    assert view_rows(mv) == recompute()
    print("equality delete: folded (key-range-pruned scan)")

    # delete rows holding a group MINIMUM: the extremum check flags
    # exactly that group and rescans it from the head (key-pruned),
    # while every other group still folds — no full recompute
    m0 = src.read(spark).where("region = 0").agg(F.min("amount")).collect()[0][0]
    delete_where_mor_positional(spark, src, f"region = 0 and amount = {m0}")
    mv.refresh(spark)
    meta = mv.view.read_manifest().meta["mv"]
    assert meta["mode"] == "incremental"
    assert meta["minmax_rescan_groups"] == 1
    assert view_rows(mv) == recompute()
    print("extremum delete: folded with a 1-group rescan")

    # stream-scheduled maintenance: commits land, ticks refresh
    write_and_commit(orders(20_000, 21_000), src, mode="append", stats=True)
    write_and_commit(orders(21_000, 22_000), src, mode="append", stats=True)
    q = mv.maintain_stream(spark, f"{work}/ckpt", availableNow=True)
    q.awaitTermination(120)
    assert mv.last_refreshed_source_version() == src.current_version()
    assert view_rows(mv) == recompute()
    q2 = mv.maintain_stream(spark, f"{work}/ckpt", availableNow=True)  # replay: no-op
    q2.awaitTermination(120)
    assert view_rows(mv) == recompute()
    print("maintain_stream: caught up; replay was a no-op")
    print("OK")


if __name__ == "__main__":
    main()
