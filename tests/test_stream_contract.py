"""Stream-source contract edges found by review: positional Arrow
column binding, branch schema pinning, the skipChangeCommits escape
hatch on maintenance commits, and merge error scoping."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from octopufs_spark.manifest import ManifestTable, compact_and_commit, write_and_commit
from octopufs_spark.sources import register_manifest_stream


@pytest.fixture()
def table(tmp_path):
    return ManifestTable(str(tmp_path / "tbl"))


def _drain(spark, table, tmp_path, ckpt="ck", **opts):
    rows = []
    reader = spark.readStream.format("manifest_stream").option("path", table.root)
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.foreachBatch(lambda df, _b: rows.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return rows


def test_stream_reorders_differing_physical_column_orders(spark, table, tmp_path):
    """Spark binds Arrow batch columns POSITIONALLY against the
    declared schema: two commits whose files store the same columns in
    different physical order must still surface the right values in
    the right columns (same-typed columns would otherwise silently
    swap)."""
    register_manifest_stream(spark)
    write_and_commit(
        spark.range(5).select(F.col("id").alias("a"), (F.col("id") * 100).alias("b")),
        table,
    )
    write_and_commit(
        spark.range(5, 10).select(
            (F.col("id") * 100).alias("b"), F.col("id").alias("a")  # reversed order
        ),
        table,
        mode="append",
    )
    rows = _drain(spark, table, tmp_path)
    got = {(r.a, r.b) for r in rows}
    assert got == {(i, i * 100) for i in range(10)}, "columns mis-bound"


def test_branch_stream_schema_pins_branch_not_main(spark, table, tmp_path):
    """After a main-side rename past the fork, a branch stream must
    declare (and deliver) the BRANCH's schema — main's evolved log
    does not apply to the branch's files."""
    register_manifest_stream(spark)
    write_and_commit(
        spark.range(5).select("id", (F.col("id") * 2).alias("v")), table
    )
    table.create_branch("dev")
    write_and_commit(
        spark.range(5, 8).select("id", (F.col("id") * 2).alias("v")),
        table,
        mode="append",
        branch="dev",
    )
    table.rename_column("v", "val")  # main evolves past the fork
    rows = _drain(spark, table, tmp_path, branch="dev")
    assert {r.id for r in rows} == set(range(8))
    assert "v" in rows[0].asDict() and "val" not in rows[0].asDict()


def test_skip_change_commits_covers_maintenance_ops(spark, table, tmp_path):
    """skipChangeCommits must let a stream ride past compaction and
    MERGE commits (the Delta escape hatch) instead of failing the
    query forever at the first maintenance commit."""
    from octopufs_spark.merge import merge_upsert_manifest

    register_manifest_stream(spark)
    write_and_commit(spark.range(10).withColumn("v", F.col("id")), table)
    write_and_commit(
        spark.range(10, 20).withColumn("v", F.col("id")), table, mode="append"
    )
    compact_and_commit(spark, table)
    merge_upsert_manifest(
        spark, table, spark.range(20, 25).withColumn("v", F.col("id")), keys=["id"]
    )
    write_and_commit(
        spark.range(30, 35).withColumn("v", F.col("id")), table, mode="append"
    )
    # without the opt-in: fails at the compact commit
    with pytest.raises(Exception, match="compact"):
        _drain(spark, table, tmp_path, ckpt="ck_fail")
    # with it: the appends stream, the maintenance commits skip
    rows = _drain(spark, table, tmp_path, ckpt="ck_ok", skipChangeCommits="true")
    assert {r.id for r in rows} == set(range(20)) | set(range(30, 35))


def test_branch_merge_missing_branch_raises_not_empty_insert(spark, table):
    from octopufs_spark.merge import merge_upsert_manifest

    write_and_commit(spark.range(10).withColumn("v", F.col("id")), table)
    with pytest.raises(FileNotFoundError, match="no branch"):
        merge_upsert_manifest(
            spark,
            table,
            spark.range(5).withColumn("v", F.col("id")),
            keys=["id"],
            branch="nope",
        )
    # the table was not clobbered by a phantom 'empty table' insert
    assert table.read(spark).count() == 10
