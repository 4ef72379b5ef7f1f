"""Rerun-safety transaction markers (reference: SafetyFuse.scala:5-21).

A destructive sequence (delete target, then move source into place)
must not repeat its delete phase if it crashed midway. The fuse is a
marker file created before the destructive phase and removed after —
its presence on entry means the previous run died inside the
transaction and the target may be inconsistent.
"""

from __future__ import annotations

import logging

from pyarrow import fs as pafs

from octopufs_spark.fs.core import get_filesystem

log = logging.getLogger(__name__)


class SafetyFuse:
    def __init__(self, folder_uri: str, run_id: str = "default"):
        self.folder_uri = folder_uri
        self.fs, folder = get_filesystem(folder_uri)
        self.marker = f"{folder}/{run_id}_open_transaction"

    def is_in_progress(self) -> bool:
        return self.fs.get_file_info(self.marker).type != pafs.FileType.NotFound

    def start_transaction(self) -> None:
        self.fs.create_dir(self.marker.rsplit("/", 1)[0], recursive=True)
        with self.fs.open_output_stream(self.marker) as w:
            w.write(b"")
        if not self.is_in_progress():
            raise RuntimeError(f"could not create transaction marker {self.marker}")

    def end_transaction(self) -> None:
        try:
            self.fs.delete_file(self.marker)
        except Exception as e:
            raise RuntimeError(
                f"could not remove transaction marker {self.marker}; "
                "operator attention required before rerun"
            ) from e
