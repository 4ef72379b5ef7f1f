"""Subfolder (non-Hive partition) promotion tests, mirroring the
reference's TestSubFolderCopy / TestSubFolderCopyOverwrite /
TestSubFolderMove suites: substring-matched subfolder copy/move with
bystander preservation (reference:
src/test/scala/TestSubFolderCopyOverwrite.scala:37-40 — a dummy file
and an unmatched folder must survive the operation)."""

from __future__ import annotations

from pathlib import Path

import pytest

from octopufs_spark import promotor


@pytest.fixture()
def trees(tmp_path):
    src = tmp_path / "src"
    trg = tmp_path / "trg"
    for part in ("day=01", "day=02", "month=01"):
        d = src / part
        d.mkdir(parents=True)
        (d / "data.bin").write_bytes(part.encode() * 10)
        (d / "nested").mkdir()
        (d / "nested" / "deep.bin").write_bytes(b"deep" + part.encode())
    # target bystanders: must survive copy/overwrite of day=* folders
    keep = trg / "folderTobeKept"
    keep.mkdir(parents=True)
    (keep / "dummyFile.txt").write_bytes(b"bystander")
    # pre-existing content in a matched target folder (overwrite target)
    stale = trg / "day=01"
    stale.mkdir()
    (stale / "stale.bin").write_bytes(b"stale")
    return str(src), str(trg)


def _rel_files(root: str) -> set[str]:
    return {
        str(p.relative_to(root)) for p in Path(root).rglob("*") if p.is_file()
    }


def test_copy_selected_subfolders_appends(spark, trees):
    src, trg = trees
    promotor.copy_selected_subfolders_content(spark, src, trg, ["day="])
    files = _rel_files(trg)
    assert "day=01/data.bin" in files and "day=02/nested/deep.bin" in files
    assert "month=01/data.bin" not in files  # unmatched folder not copied
    assert "folderTobeKept/dummyFile.txt" in files  # bystander intact
    assert "day=01/stale.bin" in files  # append mode: stale content kept


def test_copy_selected_subfolders_overwrite(spark, trees):
    src, trg = trees
    promotor.copy_selected_subfolders_content(spark, src, trg, ["day="], overwrite=True)
    files = _rel_files(trg)
    assert "day=01/data.bin" in files
    assert "day=01/stale.bin" not in files  # overwrite cleared matched target
    assert "folderTobeKept/dummyFile.txt" in files  # bystander intact


def test_move_selected_subfolders(spark, trees):
    src, trg = trees
    # moveFolders refuses to overwrite a non-empty pre-existing target
    # via doesMoveLookSafe unless the source still has content — here
    # source day=01 is non-empty so the stale target folder is replaced.
    promotor.move_selected_subfolders(spark, src, trg, ["day="])
    trg_files = _rel_files(trg)
    src_files = _rel_files(src)
    assert "day=01/data.bin" in trg_files and "day=02/nested/deep.bin" in trg_files
    assert "day=01/stale.bin" not in trg_files  # replaced, not merged
    assert not any(f.startswith("day=") for f in src_files)  # moved away
    assert any(f.startswith("month=01") for f in src_files)  # unmatched stays
    assert "folderTobeKept/dummyFile.txt" in trg_files
