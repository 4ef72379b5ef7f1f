"""Measure the reference's only published performance figure
(README.md:9: distributed copy ~3x faster than read->write) against
this rebuild — r7 verdict task #6.

The claim: copying a parquet tree by moving BYTES (one file per Spark
task, no decode) beats `spark.read.parquet(src).write.parquet(dst)`
(decompress -> rows -> shuffle-less rewrite -> recompress) because the
latter burns CPU on codec work and loses the original file layout.

The probe generates an N-file parquet tree (default ~2 GB), then
times: `fs.distributed.copy_folder` at several ``task_count`` settings
vs the read->write baseline. Prints one JSON line with the ratio.

Run: python tools/copy_probe.py [total_mb] [n_files]
Measured numbers live in SCALE.md ("reference 3x copy claim").
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from octopufs_spark.fs.core import get_size  # noqa: E402
from octopufs_spark.fs.distributed import copy_folder  # noqa: E402
from octopufs_spark.session import get_spark  # noqa: E402


def main() -> None:
    total_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark("copy_probe")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="copy_probe_")
    src = f"{work}/src"

    # ~28 bytes/row after snappy for this shape; calibrate roughly
    rows = total_mb * 1024 * 1024 // 28
    t0 = time.time()
    (
        spark.range(rows)
        .select(
            "id",
            (F.col("id") * 31 % 997).alias("a"),
            F.rand(7).alias("b"),
            F.md5(F.col("id").cast("string")).alias("s"),
        )
        .repartition(n_files)
        .write.parquet(src)
    )
    gen_s = round(time.time() - t0, 1)
    size_b = get_size(src).get_size_of_path(src)
    out: dict = {
        "src_bytes": size_b,
        "src_gb": round(size_b / 2**30, 2),
        "n_files": n_files,
        "gen_s": gen_s,
    }

    # min-of-2 per mode: the first pass after generation competes with
    # the page-cache writeback of the 3 GB just written (observed 16x
    # inflation on whichever mode runs first), so each mode runs twice
    # and reports its best — steady-state throughput, same treatment
    # for both sides.
    def rw_once(i):
        t0 = time.time()
        spark.read.parquet(src).write.parquet(f"{work}/rw{i}")
        s = round(time.time() - t0, 1)
        shutil.rmtree(f"{work}/rw{i}")
        return s

    def copy_once(tc, i):
        dst = f"{work}/cp_{tc}_{i}"
        t0 = time.time()
        res = copy_folder(spark, src, dst, task_count=tc)
        s = round(time.time() - t0, 1)
        assert all(r.success for r in res)
        assert get_size(dst).get_size_of_path(dst) == size_b  # byte-identical
        shutil.rmtree(dst)
        return s

    rw_once(0)  # absorb the writeback spike before anything is timed
    out["read_write_s"] = min(rw_once(1), rw_once(2))
    for tc in (-1, 32, 8):
        out[f"copy_s_tasks_{tc}"] = min(copy_once(tc, 1), copy_once(tc, 2))

    out["ratio_rw_over_copy"] = round(out["read_write_s"] / out["copy_s_tasks_-1"], 2)
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
