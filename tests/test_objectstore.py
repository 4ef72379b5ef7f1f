"""Object-store integration suite — runs on two schemes.

The fs toolkit is pyarrow.fs-generic (octopufs_spark/fs/core.py:27).
This module runs the same operations against a non-``file://``
filesystem two ways:

  * by DEFAULT against ``mock://`` — the in-process object-store
    stand-in (octopufs_spark/fs/mockfs.py), a pyarrow
    ``FileSystemHandler`` with a deterministic path mapping that
    executor processes resolve without coordination — so the scheme
    dispatch, handler-mediated streams, and distributed copy/move
    paths run in every CI pass;
  * against a REAL remote filesystem when
    ``OCTOPUFS_REMOTE_URI=s3://bucket/prefix`` (or gs://, hdfs://) is
    set — mirroring the reference's env-gated ACL/HDFS suites
    (reference: src/test/scala/AclTest.scala:25, gated on a live
    hdfs://localhost:8020). Credentials come from the environment the
    respective pyarrow filesystem reads natively (AWS_*,
    GOOGLE_APPLICATION_CREDENTIALS, HADOOP_CONF_DIR, ...).

Tests that round-trip through Spark's JVM readers (manifest tables)
need a scheme Hadoop can open and skip on mock://.
"""

from __future__ import annotations

import os
import uuid

import pytest

REMOTE_BASE = os.environ.get("OCTOPUFS_REMOTE_URI", "").rstrip("/") or "mock://octopufs-it"
IS_MOCK = REMOTE_BASE.startswith("mock://")

requires_jvm_scheme = pytest.mark.skipif(
    IS_MOCK,
    reason="needs a Hadoop-readable scheme (spark.read.parquet) — set "
    "OCTOPUFS_REMOTE_URI to a real store to run",
)


@pytest.fixture()
def remote_prefix():
    """A unique prefix under the configured base; removed afterwards."""
    from octopufs_spark.fs.core import get_filesystem

    base = f"{REMOTE_BASE}/octopufs-it-{uuid.uuid4().hex[:12]}"
    yield base
    fs, path = get_filesystem(base)
    try:
        fs.delete_dir(path)
    except FileNotFoundError:
        pass


def _put(uri: str, payload: bytes) -> None:
    from octopufs_spark.fs.core import get_filesystem

    fs, path = get_filesystem(uri)
    parent = path.rsplit("/", 1)[0]
    fs.create_dir(parent, recursive=True)
    with fs.open_output_stream(path) as f:
        f.write(payload)


def _get(uri: str) -> bytes:
    from octopufs_spark.fs.core import get_filesystem

    fs, path = get_filesystem(uri)
    with fs.open_input_stream(path) as f:
        return f.read()


def test_list_and_sizes_remote(remote_prefix):
    from octopufs_spark.fs.core import get_filesystem, get_size, list_tree

    _put(f"{remote_prefix}/a/one.bin", b"x" * 10)
    _put(f"{remote_prefix}/a/b/two.bin", b"y" * 20)
    els = list_tree(remote_prefix)
    files = {e.path.rsplit("/", 1)[-1]: e.byte_size for e in els if not e.is_dir}
    assert files == {"one.bin": 10, "two.bin": 20}
    _, root_path = get_filesystem(remote_prefix)
    assert get_size(remote_prefix, skip_file_details=False).get_size_of_path(root_path) == 30


def test_copy_single_and_roundtrip(remote_prefix):
    from octopufs_spark.fs.core import copy_single_file

    _put(f"{remote_prefix}/src/f.bin", b"payload")
    assert copy_single_file(f"{remote_prefix}/src/f.bin", f"{remote_prefix}/dst/f.bin")
    assert _get(f"{remote_prefix}/dst/f.bin") == b"payload"


def test_distributed_copy_folder_remote(spark, remote_prefix):
    from octopufs_spark.fs.core import list_tree
    from octopufs_spark.fs.distributed import copy_folder

    for i in range(6):
        _put(f"{remote_prefix}/src/part-{i}.bin", bytes([i]) * (i + 1))
    results = copy_folder(spark, f"{remote_prefix}/src", f"{remote_prefix}/trg")
    assert all(r.success for r in results) and len(results) == 6
    got = {
        e.path.rsplit("/", 1)[-1]: e.byte_size
        for e in list_tree(f"{remote_prefix}/trg")
        if not e.is_dir
    }
    assert got == {f"part-{i}.bin": i + 1 for i in range(6)}


def test_move_delete_remote(remote_prefix):
    from octopufs_spark.fs.core import list_tree
    from octopufs_spark.fs.local import delete_paths, move_paths
    from octopufs_spark.fs.model import Paths

    _put(f"{remote_prefix}/m/a.bin", b"a")
    _put(f"{remote_prefix}/m/b.bin", b"b")
    res = move_paths([Paths(f"{remote_prefix}/m/a.bin", f"{remote_prefix}/m/a2.bin")])
    assert all(r.success for r in res)
    names = {e.path.rsplit("/", 1)[-1] for e in list_tree(f"{remote_prefix}/m") if not e.is_dir}
    assert names == {"a2.bin", "b.bin"}
    delete_paths([f"{remote_prefix}/m/b.bin"])
    names = {e.path.rsplit("/", 1)[-1] for e in list_tree(f"{remote_prefix}/m") if not e.is_dir}
    assert names == {"a2.bin"}


def test_delta_synchronize_remote(spark, remote_prefix):
    from octopufs_spark.fs.delta import get_delta, synchronize

    _put(f"{remote_prefix}/src/keep.bin", b"k")
    _put(f"{remote_prefix}/src/new.bin", b"n")
    _put(f"{remote_prefix}/trg/keep.bin", b"k")
    _put(f"{remote_prefix}/trg/stale.bin", b"s")
    missing, extra = get_delta(spark, f"{remote_prefix}/src", f"{remote_prefix}/trg")
    assert missing == ["new.bin"] and extra == ["stale.bin"]
    synchronize(spark, f"{remote_prefix}/src", f"{remote_prefix}/trg")
    missing, extra = get_delta(spark, f"{remote_prefix}/src", f"{remote_prefix}/trg")
    assert missing == [] and extra == []


@requires_jvm_scheme
def test_manifest_commit_remote(spark, remote_prefix):
    """Manifest tables (atomic publish via no-overwrite rename) work on
    the remote store — the property the whole design exists for."""
    from octopufs_spark.manifest import ManifestTable, write_and_commit

    table = ManifestTable(f"{remote_prefix}/mtbl")
    v = write_and_commit(spark.range(0, 50), table)
    assert v == 1
    assert table.read(spark).count() == 50


def test_cross_scheme_move_refused(remote_prefix, tmp_path):
    """Moves are metadata renames within ONE filesystem; a remote->local
    move must be refused up front (reference: checkIfFsIsTheSame,
    fs/package.scala:126-129) — the scheme-boundary check the regular
    file://-only suite can never exercise."""
    from octopufs_spark.fs.core import check_if_fs_is_the_same

    with pytest.raises(ValueError, match="same filesystem"):
        check_if_fs_is_the_same(f"{remote_prefix}/a.bin", f"file://{tmp_path}/a.bin")
    # same scheme on both sides passes
    check_if_fs_is_the_same(f"{remote_prefix}/a.bin", f"{remote_prefix}/b.bin")


def test_distributed_copy_retry_exhaustion_remote(spark, remote_prefix):
    """A copy whose source never exists fails all 5 attempts and raises
    — the retry loop must behave identically on a non-file:// scheme
    (reference: DistributedExecution.scala:72-83)."""
    from octopufs_spark.fs.distributed import copy_files
    from octopufs_spark.fs.model import Paths

    with pytest.raises(RuntimeError, match="distributed copy failed"):
        copy_files(
            spark,
            [Paths(f"{remote_prefix}/nope/missing.bin", f"{remote_prefix}/trg/x.bin")],
        )


def test_mock_partial_failure_merges_with_retry(spark, remote_prefix):
    """One good file + one missing file: the good copy lands, the bad
    one exhausts retries and raises — partial results must not mask the
    failure (reference merges partial successes before retrying)."""
    from octopufs_spark.fs.core import list_tree
    from octopufs_spark.fs.distributed import copy_files
    from octopufs_spark.fs.model import Paths

    _put(f"{remote_prefix}/src/good.bin", b"ok")
    with pytest.raises(RuntimeError, match="distributed copy failed"):
        copy_files(
            spark,
            [
                Paths(f"{remote_prefix}/src/good.bin", f"{remote_prefix}/trg/good.bin"),
                Paths(f"{remote_prefix}/src/gone.bin", f"{remote_prefix}/trg/gone.bin"),
            ],
        )
    copied = {
        e.path.rsplit("/", 1)[-1]
        for e in list_tree(f"{remote_prefix}/trg")
        if not e.is_dir
    }
    assert copied == {"good.bin"}
