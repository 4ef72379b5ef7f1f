"""Storage-layout queries: bucketed tables (shuffle-free co-located
joins) and manifest partition-spec evolution.

Bucketing is the classic 100 TB shuffle-elimination lever the rest of
the inventory doesn't exercise: two fact tables bucketed AND sorted on
the join key join with ZERO exchange on either side — the shuffle is
paid once at write time and amortized over every subsequent join
(Spark's bucketBy, the same contract as Hive bucketing / Iceberg's
bucket transform). The reference pins its own write-layout behavior the
same way (dynamic partition overwrite,
reference: src/test/scala/TestUtils.scala:64-65).
"""

from __future__ import annotations

import atexit
import os
import re
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from octopufs_spark.queries.common import SQL_REVENUE, revenue_col
from octopufs_spark.registry import register
from octopufs_spark.tables import load

_CLEANUP_REGISTERED: set[str] = set()


def pid_scoped_root(prefix: str, tag: str) -> str:
    """Per-(tag, process) temp location for query-owned table data.

    The pid suffix keeps a concurrent driver/bench/pytest trio from
    rmtree-ing or overwrite-deleting each other's live files mid-read
    (a plain per-tag path races exactly that way). Two halves keep the
    suffix from leaking a table copy per process forever: an atexit
    hook removes THIS process's root on clean exit, and roots left by
    crashed/killed siblings (their atexit never ran) are swept here
    whenever their pid is no longer alive. A recycled pid keeps its
    root until the recycler exits — conservative, never unsafe."""
    tmp = tempfile.gettempdir()
    root = os.path.join(tmp, f"{prefix}_{tag}_{os.getpid()}")
    if root not in _CLEANUP_REGISTERED:
        _CLEANUP_REGISTERED.add(root)
        atexit.register(shutil.rmtree, root, ignore_errors=True)
    pat = re.compile(re.escape(f"{prefix}_{tag}_") + r"(\d+)$")
    try:
        siblings = os.listdir(tmp)
    except OSError:
        siblings = []
    for entry in siblings:
        m = pat.match(entry)
        if not m or int(m.group(1)) == os.getpid():
            continue
        try:
            os.kill(int(m.group(1)), 0)
        except ProcessLookupError:
            shutil.rmtree(os.path.join(tmp, entry), ignore_errors=True)
        except (PermissionError, OSError):
            pass  # pid alive (or unknowable): leave its root alone
    return root

_N_BUCKETS = 8


def write_bucketed_pair(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Write orders+lineitem bucketed AND sorted on the order key, and
    return the two catalog-backed DataFrames. Both sides use the SAME
    bucket count so Spark plans the join bucket-to-bucket (a storage-
    partitioned join): no Exchange, and the sortBy lets the merge join
    skip its sorts too. Data lands under a per-(sf, process) temp
    location (stable across calls within a process — repeated runs
    overwrite instead of leaking temp dirs; the pid suffix keeps a
    concurrent process's mode('overwrite') from deleting bucket files
    this process's in-flight join is reading); table metadata lives in
    the session catalog."""
    import hashlib

    # stable digest (not the salted builtin hash): same-process runs
    # reuse one location instead of leaking a copy per run
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    root = pid_scoped_root("octopufs_buckets", tag)
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    # Repartition on the bucket key BEFORE the bucketed write (r10,
    # guide §6): Spark does not shuffle for bucketBy — each input task
    # writes its own file per bucket, so a many-split input produces
    # tasks x buckets small files while a single-split input sorts and
    # writes everything in ONE task. The explicit hash exchange makes
    # the write exactly one file per bucket at every input layout and
    # parallelizes the per-bucket sort — the same shuffle the bucket
    # layout is supposed to pre-pay.
    (
        o.repartition(_N_BUCKETS, "o_orderkey")
        .write.bucketBy(_N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", f"{root}/orders")
        .mode("overwrite")
        .saveAsTable("octopufs_bucketed_orders")
    )
    (
        li.repartition(_N_BUCKETS, "l_orderkey")
        .write.bucketBy(_N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", f"{root}/lineitem")
        .mode("overwrite")
        .saveAsTable("octopufs_bucketed_lineitem")
    )
    return spark.table("octopufs_bucketed_orders"), spark.table(
        "octopufs_bucketed_lineitem"
    )


def bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shuffle-free fact-to-fact join over the bucketed pair. The
    merge hint pins sort-merge (a broadcast at test scale would also
    skip the shuffle, but the bucket-to-bucket plan is the one that
    survives when BOTH sides are 100 TB facts); the bucket layout then
    removes the Exchange a plain SMJ needs on each side — pinned by
    tests/test_plans.py::test_bucketed_join_has_no_exchange."""
    ob, lb = write_bucketed_pair(spark, sf_dir)
    return ob.hint("merge").join(lb, ob.o_orderkey == lb.l_orderkey)


@register(
    "q_sink_bucketed",
    oracle=f"""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
""",
)
def q_sink_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed write + storage-partitioned join, value-verified: both
    fact tables are written bucketBy(8, orderkey) sortBy(orderkey), so
    the subsequent join plans bucket-to-bucket with NO Exchange on
    either side (the write pre-paid the shuffle — the one join shape
    that stays shuffle-free when both sides are 100 TB facts and
    neither broadcasts). The revenue-by-priority aggregate over the
    join is recomputed by the oracle from the raw tables, so a
    bucketing bug that drops/duplicates bucket files flips the hash."""
    joined = bucketed_join(spark, sf_dir)
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum(revenue_col()).cast("double").alias("revenue"),
    )


@register(
    "q_ext_partition_evolution",
    oracle="""
SELECT CAST(COUNT(DISTINCT CASE WHEN year(o_orderdate) >= 1998 THEN year(o_orderdate) END) AS BIGINT) AS files_new_layout,
       CAST(1 AS BIGINT) AS files_read_new,
       CAST((SELECT COUNT(*) FROM orders WHERE year(o_orderdate) = 2000) AS BIGINT) AS rows_new,
       CAST(1 AS BIGINT) AS files_read_old,
       CAST((SELECT COUNT(*) FROM orders WHERE year(o_orderdate) = 1995) AS BIGINT) AS rows_old,
       CAST((SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders) AS DOUBLE) AS total_price
FROM orders
""",
)
def q_ext_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-spec EVOLUTION on a manifest table (the Iceberg model:
    the spec is a property of the commit, not the table — old files
    keep their old layout forever, nothing is rewritten). v1 commits
    pre-1998 orders UNPARTITIONED (year lives in file bytes only,
    zone-map stats collected); v2 appends 1998+ orders
    hive-partitioned by year (year lives in dir names). The snapshot
    read unions both layouts (per-commit basePath scan groups), and
    pruning consults BOTH metadata kinds: a predicate on a post-
    evolution year prunes old files via zone maps and new files via
    path segments; a pre-evolution year kills every new partition by
    segment and narrows old files by stats. files_read for both probes
    AND the full-table aggregate are oracle-pinned, so over-pruning
    (lost rows) or under-reading flips the hash. Concurrent-OPTIMIZE
    safety is race-replay tested
    (tests/test_manifest.py::test_partition_evolution_*)."""
    import hashlib
    import shutil

    from octopufs_spark.manifest import ManifestTable, write_and_commit

    o = load(spark, sf_dir, "orders").withColumn("yr", F.year("o_orderdate"))
    # stable per-(sf, process) location, rebuilt from scratch each run:
    # repeated invocations within a process neither leak a temp dir per
    # run nor accumulate manifest versions, and the pid suffix keeps a
    # concurrent driver/bench/pytest trio from rmtree-ing each other's
    # live table mid-read (a plain per-sf path would); atexit + dead-pid
    # sweep in pid_scoped_root stop stale roots from accumulating
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    root = pid_scoped_root("octopufs_evolve", tag)
    shutil.rmtree(root, ignore_errors=True)
    table = ManifestTable(root)
    old = o.where(F.col("yr") <= 1997).repartition("yr")
    write_and_commit(old, table, stats=True)  # v1: unpartitioned spec
    new = o.where(F.col("yr") >= 1998).repartition("yr")
    write_and_commit(new, table, mode="append", partition_by=["yr"], stats=True)

    # Probes chosen so the expected file count is deterministic under
    # EITHER layout: a post-evolution year is exactly one hive dir
    # (one file — partitionBy splits per task per dir); the MIN
    # pre-evolution year is held by exactly one old file, and every
    # old file NOT holding it has min > 1995, so zone maps prune it
    # regardless of how AQE coalesced the v1 write into files.
    keep_new, _skip_new = table.prune_plan([("yr", "=", 2000)])
    keep_old, _skip_old = table.prune_plan([("yr", "=", 1995)])
    files_new_layout = sum(1 for f in table.read_manifest().files if "/yr=" in f)

    rows_new = (
        table.read_pruned(spark, [("yr", "=", 2000)]).where(F.col("yr") == 2000).count()
    )
    rows_old = (
        table.read_pruned(spark, [("yr", "=", 1995)]).where(F.col("yr") == 1995).count()
    )
    agg = table.read(spark).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price")
    )
    return agg.select(
        F.lit(files_new_layout).cast("long").alias("files_new_layout"),
        F.lit(len(keep_new)).cast("long").alias("files_read_new"),
        F.lit(rows_new).cast("long").alias("rows_new"),
        F.lit(len(keep_old)).cast("long").alias("files_read_old"),
        F.lit(rows_old).cast("long").alias("rows_old"),
        "total_price",
    )
