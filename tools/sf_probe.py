"""Fresh-session-per-query scale probe over a scaled sf directory.

    python tools/sf_probe.py <sf_dir> <query> [<query> ...]
    python tools/sf_probe.py <sf_dir> --json out.json <query> ...

Runs each registered query in its OWN subprocess/SparkSession (one
cold + one warm execution through the noop sink) and prints a
markdown row per query. The isolation is the point: probing many
heavy queries sequentially in one session lets accumulated executor
state (sort spill, storage-memory pressure, GC) poison later
timings — the first sf10 sweep reported 36-118x for queries that
measure 2-10x in isolation. Any super-linear reading from a shared
session must be re-measured here before being called a defect
(SCALE.md, "a measurement lesson").

Heap for big probes: SPARK_GRAFT_DRIVER_MEM=48g (same knob as
scale_probe.py --deep).
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parents[1])

_CHILD = r"""
import sys, time, json
name, sf_dir, repo = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, repo)
from octopufs_spark.session import get_spark
from octopufs_spark.registry import all_queries
spark = get_spark("sf_probe"); spark.sparkContext.setLogLevel("ERROR")
q = all_queries()[name]
out = {}
for label in ("cold", "warm"):
    t0 = time.perf_counter()
    q(spark, sf_dir).write.format("noop").mode("overwrite").save()
    out[label] = round(time.perf_counter() - t0, 2)
print("SF_PROBE_RESULT " + json.dumps(out))
"""


def probe(sf_dir: str, name: str, timeout: int = 3600) -> dict:
    try:
        p = subprocess.run(
            [sys.executable, "-c", _CHILD, name, sf_dir, REPO],
            capture_output=True,
            text=True,
            timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        # a wedged query is a RESULT (record it), not a sweep abort
        return {"error": f"timeout after {timeout}s"}
    for line in p.stdout.splitlines():
        if line.startswith("SF_PROBE_RESULT "):
            return json.loads(line[len("SF_PROBE_RESULT ") :])
    tail = (p.stderr or p.stdout).strip().splitlines()[-3:]
    return {"error": " / ".join(tail)[:300]}


def main() -> int:
    args = sys.argv[1:]
    if not args or len(args) < 2:
        print(__doc__)
        return 2
    sf_dir = args.pop(0)
    out_path = None
    if args and args[0] == "--json":
        args.pop(0)
        out_path = args.pop(0)
    results = {}
    print("| query | cold | warm |\n|---|---|---|")
    for name in args:
        r = probe(sf_dir, name)
        results[name] = r
        if "error" in r:
            print(f"| {name} | ERR | {r['error']} |", flush=True)
        else:
            print(f"| {name} | {r['cold']} s | {r['warm']} s |", flush=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
