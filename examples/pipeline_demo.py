"""End-to-end demo: the storage-management + data-pipeline surface in
one run. Mirrors a real promotion/maintenance/dedup workflow:

1. build a partitioned table from the fixtures,
2. promote a partition into a second table (file-level exchange),
3. compact small files,
4. diff + synchronize two folder trees,
5. dedup + quality-score the documents corpus,
6. sessionize the event stream (batch twin).

Run: python examples/pipeline_demo.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from octopufs_spark import compact, promotor  # noqa: E402
from octopufs_spark.fs import delta  # noqa: E402
from octopufs_spark.llm import dedup, text  # noqa: E402
from octopufs_spark.registry import all_queries  # noqa: E402
from octopufs_spark.session import get_spark  # noqa: E402
from octopufs_spark.tables import load  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("pipeline_demo")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="octopufs_demo_")

    # 1. partitioned table
    spark.sql("CREATE DATABASE IF NOT EXISTS demo")
    spark.sql("USE demo")
    orders = load(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("int")
    )
    for name, df in (("fct", orders), ("sfct", orders.where("o_year = 1995"))):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        df.write.mode("overwrite").option("path", f"{work}/{name}").partitionBy(
            "o_year"
        ).saveAsTable(name)
    print("tables:", spark.table("fct").count(), spark.table("sfct").count())

    # 2. partition exchange (file-level; SQL analog also available)
    promotor.copy_overwrite_partitions(spark, "fct", "sfct", ["o_year=1996"])
    print("after exchange:", spark.table("sfct").where("o_year=1996").count())

    # 3. compaction
    rewritten = compact.do_it_all(spark, [f"{work}/sfct"], requested_file_size_mb=100)
    print("compacted leaf folders:", rewritten)

    # 4. tree diff + sync
    missing, extra = delta.get_delta(spark, f"{work}/fct", f"{work}/sfct")
    print("delta before sync:", len(missing), "missing,", len(extra), "extra")
    delta.synchronize(spark, f"{work}/fct", f"{work}/sfct")
    print("delta after sync:", delta.get_delta(spark, f"{work}/fct", f"{work}/sfct"))

    # 5. document pipeline: quality gates + near-dup clustering
    docs = load(spark, sf_dir, "documents")
    scored = text.quality_score(docs)
    keep = scored.where(F.col("quality") > 0.5)
    pairs = dedup.ngram_jaccard_pairs(keep.limit(200), n=3, threshold=0.2)
    clusters = dedup.connected_components(pairs, partitions=4)
    print(
        "docs:", docs.count(), "kept:", keep.count(),
        "near-dup clusters:", clusters.select("cluster_id").distinct().count(),
    )

    # 6. sessionization (oracle-checked batch twin of the streaming op)
    sessions = all_queries()["q_stream_sessionize_exact"](spark, sf_dir)
    print("sessions:", sessions.count())

    # 7. manifest table lifecycle: atomic commit → catalog registration
    #    → CDC merge → time travel
    from octopufs_spark.manifest import ManifestTable, write_and_commit
    from octopufs_spark.merge import merge_upsert_manifest

    mt = ManifestTable(f"{work}/events_mt")
    v1 = write_and_commit(
        load(spark, sf_dir, "events").limit(1000).select("event_id", "user_id", "value"), mt
    )
    mt.register_view(spark, "events_mt")
    print("manifest v1 rows via spark.table:", spark.table("events_mt").count())
    changes = spark.table("events_mt").limit(100).withColumn("value", F.col("value") * 0)
    v2 = merge_upsert_manifest(spark, mt, changes, keys=["event_id"])
    mt.register_view(spark, "events_mt")  # advance to v2
    print(
        "after merge: zeroed rows =",
        spark.table("events_mt").where("value = 0").count(),
        "| v1 still readable:", mt.read(spark, version=v1).count(),
    )
    spark.catalog.dropTempView("events_mt")

    spark.sql("DROP TABLE IF EXISTS fct")
    spark.sql("DROP TABLE IF EXISTS sfct")
    spark.sql("DROP DATABASE IF EXISTS demo")
    print("demo complete")


if __name__ == "__main__":
    main()
