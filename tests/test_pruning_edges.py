"""Edge cases of file pruning and vacuum found by the whole-file
review: cross-granularity date/timestamp probes, incomparable probe
types, op spellings on hidden layouts, transform lockstep at int64
extremes, and vacuum's orphan/sidecar hygiene."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from octopufs_spark.manifest import (
    ManifestTable,
    hidden_transform_expr,
    hidden_transform_value,
    write_and_commit,
)


@pytest.fixture()
def table(tmp_path):
    return ManifestTable(str(tmp_path / "tbl"))


def _ts_table(spark, table):
    df = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1 + i, 0, 0, 0)) for i in range(4)],
        "id long, ts timestamp",
    ).repartition(2, "id")
    write_and_commit(df, table, stats=True, bloom_columns=["ts"])
    return df


def test_date_probe_against_timestamp_stats_never_prunes_matches(spark, table):
    """A date probe compares below 'T00:00:00'-suffixed timestamp
    stats lexicographically — the harmonized interval check must keep
    the file holding the midnight row (and the bloom must not be a
    guaranteed false negative)."""
    _ts_table(spark, table)
    keep, skipped = table.prune_plan([("ts", "=", dt.date(2024, 1, 2))])
    rows = (
        table.read_pruned(spark, [("ts", "=", dt.date(2024, 1, 2))])
        .where(F.col("ts") == F.lit(dt.date(2024, 1, 2)).cast("timestamp"))
        .count()
    )
    assert rows == 1, f"matching row lost (keep={len(keep)}, skipped={skipped})"
    # range probes harmonize too
    got = (
        table.read_pruned(spark, [("ts", ">=", dt.date(2024, 1, 3))])
        .where(F.col("ts") >= F.lit(dt.date(2024, 1, 3)).cast("timestamp"))
        .count()
    )
    assert got == 2


def test_incomparable_probe_reads_instead_of_crashing(spark, table):
    write_and_commit(
        spark.range(100).withColumn("v", F.col("id") * 2), table, stats=True
    )
    # string probe against int stats: must not TypeError, must not prune
    keep, skipped = table.prune_plan([("v", "=", "50")])
    assert skipped == 0
    assert table.read_pruned(spark, [("v", "=", "50")]).count() == 100


def test_word_op_spellings_on_hidden_layout(spark, table):
    df = spark.range(100).select(
        "id", (F.lit("2024-01-01").cast("date") + F.col("id").cast("int")).alias("d")
    )
    write_and_commit(df, table, hidden_partition={"dd": ("days", "d")})
    # 'lt' worked on plain tables; it must not crash the derivation
    keep, skipped = table.prune_plan([("d", "lt", dt.date(2024, 1, 10))])
    assert keep  # and it still prunes through the transform
    assert skipped > 0
    assert (
        table.read_pruned(spark, [("d", "lt", dt.date(2024, 1, 10))])
        .where(F.col("d") < F.lit(dt.date(2024, 1, 10)))
        .count()
        == 9
    )


def test_truncate_transform_exact_beyond_double_precision(spark, table):
    """floor(c/p) through DOUBLE rounds above 2^53; the write-side dir
    value must match the Python twin exactly or pruning loses rows."""
    big = (1 << 60) + 12345
    vals = [big, big + 1, -big, 7, -7]
    df = spark.createDataFrame([(v,) for v in vals], "k long")
    expr_vals = {
        r.k: r.t
        for r in df.select("k", hidden_transform_expr("truncate", "k", 1000).alias("t")).collect()
    }
    for v in vals:
        assert expr_vals[v] == hidden_transform_value("truncate", v, 1000), v


def test_bucket_transform_lockstep_and_refusals(spark):
    df = spark.createDataFrame(
        [(True,), (False,)], "b boolean"
    ).select("b", hidden_transform_expr("bucket", "b", 8).alias("t"))
    for r in df.collect():
        assert r.t == hidden_transform_value("bucket", r.b, 8)
    with pytest.raises(ValueError, match="float"):
        hidden_transform_value("bucket", 1.5, 8)


def test_empty_pruned_read_keeps_logical_schema(spark, table):
    df = spark.range(50).select(
        "id", (F.lit("2024-01-01").cast("date") + (F.col("id") % 3).cast("int")).alias("d")
    )
    write_and_commit(df, table, hidden_partition={"dd": ("days", "d")}, stats=True)
    out = table.read_pruned(spark, [("id", ">", 10_000)])
    assert out.count() == 0
    # hidden partition column stripped exactly like a non-empty read
    assert out.columns == table.read(spark).columns


def test_vacuum_keep_versions_zero_rejected(spark, table):
    write_and_commit(spark.range(5), table)
    with pytest.raises(ValueError, match="keep_versions"):
        table.vacuum(keep_versions=0)


def test_vacuum_cleans_tmp_manifests_and_dead_sidecars(spark, table):
    write_and_commit(spark.range(10).withColumn("v", F.col("id")), table)
    # full overwrite: v1's staging dir (parquet + _SUCCESS) goes dead
    write_and_commit(spark.range(10, 30).withColumn("v", F.col("id")), table)
    # a crashed publisher's orphaned tmp manifest
    with table.fs.open_output_stream(f"{table._mdir}/v99.json.tmp.deadbeef") as f:
        f.write(b"{}")
    removed = table.vacuum(keep_versions=1, retention_seconds=0)
    assert any("v99.json.tmp.deadbeef" in r for r in removed)
    # the pruned v1 staging dir's _SUCCESS sidecar went with its parquet
    assert not any(
        r.endswith("_SUCCESS") and r in removed and False for r in removed
    )  # structure check below is the real assertion
    from octopufs_spark.fs.core import list_tree

    leftovers = [
        el.path
        for el in list_tree(table.root)
        if not el.is_dir
        and el.path.rsplit("/", 1)[-1] == "_SUCCESS"
    ]
    live_dirs = {f.rsplit("/", 1)[0] for f in table.read_manifest().files}
    for p in leftovers:
        rel_dir = p[len(table.root_path) + 1 :].rsplit("/", 1)[0]
        assert rel_dir in live_dirs, f"dead staging sidecar survived: {p}"
    # live table unharmed
    assert table.read(spark).count() == 20
    assert {r.id for r in table.read(spark).collect()} == set(range(10, 30))


def test_bucket_probe_decimal_and_dtype_mismatch_stay_conservative(spark, table):
    """The write-side bucket hashes Spark's CAST(c AS STRING) of the
    COLUMN type — decimal(10,2) renders 3 as '3.00'. A Decimal probe
    (str() drops the scale padding) or an int probe against a
    decimal-typed column therefore hashes a DIFFERENT string, derives
    the wrong bucket, and would silently prune files that hold
    matching rows. Both must skip the derivation (pruning stays
    conservative), gated by the source dtype recorded at write time."""
    from decimal import Decimal

    with pytest.raises(ValueError, match="Decimal"):
        hidden_transform_value("bucket", Decimal("1.1"), 8)
    with pytest.raises(ValueError, match="non-integer"):
        hidden_transform_value("bucket", 3, 8, dtype="decimal(10,2)")
    # int probes stay derivable against integer columns (dtype known or legacy)
    assert hidden_transform_value("bucket", 3, 8, dtype="bigint") == hidden_transform_value(
        "bucket", 3, 8
    )

    df = spark.range(20).select("id", F.col("id").cast("decimal(10,2)").alias("amt"))
    write_and_commit(df, table, hidden_partition={"ab": ("bucket", "amt", 8)}, stats=True)
    spec = table.read_manifest().meta["hidden_partitions"]["ab"]
    assert spec[3] == "decimal(10,2)"  # dtype recorded for the probe gate
    # md5('3') and md5('3.00') land in different buckets — before the
    # gate this int probe derived the WRONG bucket and pruned the file
    got = table.read_pruned(spark, [("amt", "=", 3)]).where("amt = 3")
    assert got.count() == 1


def test_scan_paths_collapse_to_live_dirs_only(spark, table):
    """High-file-count reads hand Spark staging DIRECTORIES instead of
    per-file paths — but only when the dir's live parquet set equals
    the snapshot's subset. A partially-retired dir, a time-travel
    subset, and sidecar files must all keep exact results."""
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    write_and_commit(df.repartition(40), table)  # 40 files, one dir
    m = table.read_manifest()
    paths = table._collapse_scan_paths(list(m.files))
    assert len(paths) == 1 and paths[0].rstrip("/").endswith(m.files[0].split("/", 1)[0])
    assert table.read(spark).count() == 100
    # a subset (rewrite retired files / pruned read) falls back to files
    subset = list(m.files)[:-1]
    sub_paths = table._collapse_scan_paths(subset)
    assert len(sub_paths) == len(subset)
    # sidecars Spark ignores don't defeat the equality check
    with table.fs.open_output_stream(
        f"{table.root_path}/{m.files[0].split('/', 1)[0]}/_SUCCESS"
    ) as f:
        f.write(b"")
    assert len(table._collapse_scan_paths(list(m.files))) == 1
    # below the threshold the exact list passes through untouched
    small = list(m.files)[:5]
    assert len(table._collapse_scan_paths(small)) == 5


def test_scan_paths_never_collapse_nested_nonhive_files(spark, table):
    """Spark reads a directory non-recursively (hive k=v subdirs
    excepted): a group with files under a non-hive subdir must keep
    its exact list, or the nested rows silently drop from every
    scan."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table({"id": list(range(5))})
    files = []
    import os

    os.makedirs(f"{table.root_path}/data-x/sub", exist_ok=True)
    for i in range(40):
        p = f"data-x/sub/nested-{i}.parquet" if i == 0 else f"data-x/part-{i}.parquet"
        pq.write_table(tbl, f"{table.root_path}/{p}")
        files.append(p)
    table._commit_with_retry(lambda parent: sorted(files), "commit", None)
    assert len(table._collapse_scan_paths(sorted(files))) == 40  # exact list kept
    assert table.read(spark).count() == 200  # nested rows present


def test_expire_refs_propagates_transient_errors(spark, table, monkeypatch):
    """A transient read error during expire_refs must PROPAGATE, never
    count as 'expired': deleting a ref on a storage hiccup lets the
    next vacuum permanently delete the pinned snapshot."""
    write_and_commit(spark.range(5), table)
    table.create_tag("keep")

    orig = type(table).read_manifest

    def boom(self, version=None):
        raise OSError("storage throttled")

    monkeypatch.setattr(type(table), "read_manifest", boom)
    with pytest.raises(OSError, match="throttled"):
        table.expire_refs(tag_max_age_seconds=0.0)
    monkeypatch.setattr(type(table), "read_manifest", orig)
    assert "keep" in table.tags()  # the ref survived the error


def test_append_hidden_spec_must_conform_to_live_layout(spark, table):
    """Appends with a hidden spec that disagrees with the table's —
    different transform params, a bucket source whose TYPE changed, or
    a brand-new hidden column — are refused: each would silently break
    pruning or the by-name read union."""
    df = spark.range(40).select("id", F.col("id").cast("bigint").alias("k"))
    write_and_commit(df, table, hidden_partition={"hb": ("bucket", "k", 8)})
    # conforming append is fine
    write_and_commit(
        spark.range(40, 50).select("id", F.col("id").cast("bigint").alias("k")),
        table,
        mode="append",
        hidden_partition={"hb": ("bucket", "k", 8)},
    )
    with pytest.raises(ValueError, match="must conform"):
        write_and_commit(
            df, table, mode="append", hidden_partition={"hb": ("bucket", "k", 16)}
        )
    with pytest.raises(ValueError, match="buckets per commit"):
        write_and_commit(
            spark.range(5).select("id", F.col("id").cast("decimal(10,2)").alias("k")),
            table,
            mode="append",
            hidden_partition={"hb": ("bucket", "k", 8)},
        )
    with pytest.raises(ValueError, match="via overwrite"):
        write_and_commit(
            df, table, mode="append", hidden_partition={"other": ("bucket", "id", 4)}
        )
    assert table.read(spark).count() == 50


def test_branch_append_conforms_to_branch_head_layout(spark, table):
    """r8 ADVICE (medium): the append-time layout conformance check must
    resolve against the COMMIT TARGET's head. A branch that adopted a
    different hidden layout via overwrite takes conforming appends of
    ITS layout (main's check would spuriously reject them) and refuses
    main's layout (main's check would silently pass it — the
    pruning-lost-rows hazard, on the branch line)."""
    dfA = spark.range(40).select("id", F.col("id").cast("bigint").alias("k"))
    write_and_commit(dfA, table, hidden_partition={"hb": ("bucket", "k", 8)})
    table.create_branch("dev")
    write_and_commit(
        dfA, table, mode="overwrite",
        hidden_partition={"hb": ("bucket", "k", 16)}, branch="dev",
    )
    write_and_commit(
        spark.range(40, 50).select("id", F.col("id").cast("bigint").alias("k")),
        table, mode="append",
        hidden_partition={"hb": ("bucket", "k", 16)}, branch="dev",
    )
    with pytest.raises(ValueError, match="must conform"):
        write_and_commit(
            dfA, table, mode="append",
            hidden_partition={"hb": ("bucket", "k", 8)}, branch="dev",
        )
    # main appends still conform against main's own head
    write_and_commit(
        spark.range(40, 50).select("id", F.col("id").cast("bigint").alias("k")),
        table, mode="append", hidden_partition={"hb": ("bucket", "k", 8)},
    )
    assert table.read(spark, branch="dev").count() == 50
    assert table.read(spark).count() == 50


def test_append_layout_reverified_at_commit_build_time(spark, table, monkeypatch):
    """r8 ADVICE (TOCTOU): a concurrent overwrite that changes the
    hidden layout BETWEEN the staging-time conformance check and the
    append's commit build must abort the append — a plain append would
    otherwise land a mixed-layout snapshot."""
    from octopufs_spark.manifest import ConcurrentModificationError

    df = spark.range(40).select("id", F.col("id").cast("bigint").alias("k"))
    write_and_commit(df, table, hidden_partition={"hb": ("bucket", "k", 8)})
    orig = ManifestTable._commit_with_retry
    fired = {"done": False}

    def racy(self, files_or_build, operation, meta, **kw):
        # fire the racing overwrite after the appender's staging-time
        # check passed but before its commit builds
        if not fired["done"] and operation == "append":
            fired["done"] = True
            write_and_commit(
                spark.range(5).select("id", F.col("id").cast("bigint").alias("k")),
                ManifestTable(table.root),
                mode="overwrite",
                hidden_partition={"hb": ("bucket", "k", 16)},
            )
        return orig(self, files_or_build, operation, meta, **kw)

    monkeypatch.setattr(ManifestTable, "_commit_with_retry", racy)
    with pytest.raises(ConcurrentModificationError, match="layout"):
        write_and_commit(
            spark.range(40, 50).select("id", F.col("id").cast("bigint").alias("k")),
            table, mode="append", hidden_partition={"hb": ("bucket", "k", 8)},
        )
    # the table is exactly the overwrite's content — nothing mixed in
    assert table.read(spark).count() == 5


def test_append_with_subset_layout_refused_at_staging(spark, table):
    """r9 ADVICE: an append specifying a strict SUBSET of the head's
    hidden partitions used to pass the staging check (each of its own
    specs matched) and then always die at commit-build with a
    misleading ConcurrentModificationError claiming a race that never
    happened. It must be refused AT STAGING with the conformance
    ValueError instead."""
    df = spark.range(40).select(
        "id",
        F.col("id").cast("bigint").alias("k"),
        F.concat(
            F.lit("2024-01-"), F.lpad((F.col("id") % 28 + 1).cast("string"), 2, "0")
        )
        .cast("date")
        .alias("d"),
    )
    write_and_commit(
        df, table,
        hidden_partition={"hb": ("bucket", "k", 8), "dd": ("days", "d")},
    )
    with pytest.raises(ValueError, match="omits hidden partition"):
        write_and_commit(
            df, table, mode="append", hidden_partition={"hb": ("bucket", "k", 8)}
        )
    assert table.read(spark).count() == 40


def test_plain_append_onto_hidden_layout_refused(spark, table):
    """r9 ADVICE: a plain append (no hidden_partition=) onto a
    hidden-layout table would land un-transformed files that every
    source-predicate prune silently skips — refused at staging."""
    df = spark.range(40).select("id", F.col("id").cast("bigint").alias("k"))
    write_and_commit(df, table, hidden_partition={"hb": ("bucket", "k", 8)})
    with pytest.raises(ValueError, match="plain\\s+append"):
        write_and_commit(
            spark.range(40, 50).select("id", F.col("id").cast("bigint").alias("k")),
            table, mode="append",
        )
    assert table.read(spark).count() == 40


def test_plain_append_racing_layout_adoption_aborts_at_build(
    spark, table, monkeypatch
):
    """r9 ADVICE (TOCTOU side): a PLAIN append staged against a
    layout-less head must abort if an overwrite ADOPTS a hidden layout
    before the append's commit builds — previously the un-transformed
    files landed unchecked."""
    from octopufs_spark.manifest import ConcurrentModificationError

    df = spark.range(40).select("id", F.col("id").cast("bigint").alias("k"))
    write_and_commit(df, table)  # layout-less head: plain append stages fine
    orig = ManifestTable._commit_with_retry
    fired = {"done": False}

    def racy(self, files_or_build, operation, meta, **kw):
        if not fired["done"] and operation == "append":
            fired["done"] = True
            write_and_commit(
                spark.range(5).select("id", F.col("id").cast("bigint").alias("k")),
                ManifestTable(table.root),
                mode="overwrite",
                hidden_partition={"hb": ("bucket", "k", 8)},
            )
        return orig(self, files_or_build, operation, meta, **kw)

    monkeypatch.setattr(ManifestTable, "_commit_with_retry", racy)
    with pytest.raises(ConcurrentModificationError, match="layout"):
        write_and_commit(
            spark.range(40, 50).select("id", F.col("id").cast("bigint").alias("k")),
            table, mode="append",
        )
    assert table.read(spark).count() == 5


def test_time_travel_reads_keep_exact_file_lists(spark, table, monkeypatch):
    """r8 ADVICE: directory collapse is a HEAD-read optimization only.
    An explicit-version (or tag/timestamp/branch) read keeps the exact
    file list, so a racing vacuum yields a loud file-not-found instead
    of a silently smaller dir scan."""
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    write_and_commit(df.repartition(40), table)
    v = table.current_version()
    calls: list[int] = []
    orig = ManifestTable._collapse_scan_paths

    def spy(self, rels):
        calls.append(len(rels))
        return orig(self, rels)

    monkeypatch.setattr(ManifestTable, "_collapse_scan_paths", spy)
    assert table.read(spark).count() == 100
    assert calls, "head read should attempt directory collapse"
    calls.clear()
    assert table.read(spark, version=v).count() == 100
    assert not calls, "explicit-version read must keep the exact file list"
    # read_pruned: head opts in, explicit version keeps exact lists
    assert table.read_pruned(spark, [("id", ">=", 0)]).count() == 100
    assert calls, "head read_pruned should attempt directory collapse"
    calls.clear()
    assert table.read_pruned(spark, [("id", ">=", 0)], version=v).count() == 100
    assert not calls
    # internal non-head scans (MV folds, merge/compaction sources) use
    # the exact-list default of _scan_files
    assert table._scan_files(spark, list(table.read_manifest().files)).count() == 100
    assert not calls


def test_hint_sweep_preserves_legacy_latest_file(spark, table):
    """r8 ADVICE follow-up (review-hardened): the sweep never deletes
    the legacy _latest file — a rolling-upgrade legacy writer could
    advance it past our hint between read and delete (no CAS on
    delete), dropping a hint AHEAD of ours. max() over hint files plus
    the legacy file absorbs it instead, in both directions."""
    import pyarrow.fs as pafs

    write_and_commit(spark.range(10).toDF("id"), table)
    legacy = f"{table.root_path}/_manifest/_latest"
    with table.fs.open_output_stream(legacy) as f:
        f.write(b"1")
    write_and_commit(spark.range(10).toDF("id"), table, mode="append")
    # superseded legacy value: preserved (harmless — max() ignores it)
    assert table.fs.get_file_info(legacy).type == pafs.FileType.File
    assert table.latest_version() == 2
    # a legacy hint ahead of every hint file still wins the max
    with table.fs.open_output_stream(legacy) as f:
        f.write(b"7")
    assert table._read_latest_hint() == 7
