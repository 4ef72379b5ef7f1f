"""Env-gated object-store integration suite.

The fs toolkit is pyarrow.fs-generic (octopufs_spark/fs/core.py:27),
but the regular suite only ever exercises ``file://``. This module
runs the same operations against a REAL remote filesystem when

    OCTOPUFS_REMOTE_URI=s3://bucket/prefix   (or gs://, hdfs://)

is set — mirroring the reference's env-gated ACL/HDFS suites
(reference: src/test/scala/AclTest.scala:25, gated on a live
hdfs://localhost:8020). Without the variable the module skips
cleanly, so the sandbox (no network) stays green while the code path
exists and runs where credentials do.

Credentials come from the environment the respective pyarrow
filesystem reads natively (AWS_*, GOOGLE_APPLICATION_CREDENTIALS,
HADOOP_CONF_DIR, ...).
"""

from __future__ import annotations

import os
import uuid

import pytest

REMOTE_BASE = os.environ.get("OCTOPUFS_REMOTE_URI", "").rstrip("/")

pytestmark = pytest.mark.skipif(
    not REMOTE_BASE,
    reason="set OCTOPUFS_REMOTE_URI=<scheme://bucket/prefix> to run "
    "object-store integration tests",
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


def test_manifest_commit_remote(spark, remote_prefix):
    """Manifest tables (atomic publish via no-overwrite rename) work on
    the remote store — the property the whole design exists for."""
    from octopufs_spark.manifest import ManifestTable, write_and_commit

    table = ManifestTable(f"{remote_prefix}/mtbl")
    v = write_and_commit(spark.range(0, 50), table)
    assert v == 1
    assert table.read(spark).count() == 50
