"""Diff two BENCH_FULL.json files on plan metrics, not wall clock.

Wall-clock totals move ±20% with machine load (BENCH.md); shuffle
bytes/records and peak-task shuffle write are deterministic plan
properties. This gate flags structural regressions — a new exchange, a
fattened shuffle, a skewed partition — that timing noise would hide,
and ignores pure timing drift.

Usage:
    python tools/bench_diff.py OLD.json NEW.json [--ratio 1.5]

Exit 1 if any query's shuffle_write_bytes or peak_task_shuffle_write
grew by more than --ratio (with a small absolute floor so tiny-byte
jitter doesn't flag).
"""

from __future__ import annotations

import argparse
import json
import sys

ABS_FLOOR = 64 * 1024  # ignore growth below 64 KiB — fixture jitter

WATCHED = ("shuffle_write_bytes", "peak_task_shuffle_write_bytes")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--ratio", type=float, default=1.5)
    args = ap.parse_args()

    old = json.load(open(args.old)).get("plan_metrics", {})
    new = json.load(open(args.new)).get("plan_metrics", {})
    if not old or not new:
        print("one side has no plan_metrics (pre-r3 bench file?) — nothing to diff")
        return 0

    flags = []
    for q in sorted(set(old) & set(new)):
        for k in WATCHED:
            o, n = old[q].get(k, 0), new[q].get(k, 0)
            if n > max(o * args.ratio, o + ABS_FLOOR):
                flags.append((q, k, o, n))
        so, sn = old[q].get("stages", 0), new[q].get("stages", 0)
        if sn > so + 2:  # wholesale plan-shape change
            flags.append((q, "stages", so, sn))

    for q, k, o, n in flags:
        print(f"REGRESSION {q}: {k} {o} -> {n}")
    gone = sorted(set(old) - set(new))
    added = sorted(set(new) - set(old))
    if gone:
        print("queries no longer present:", " ".join(gone))
    if added:
        print("new queries (no baseline):", " ".join(added))
    if not flags:
        print(f"ok: no shuffle/plan regressions across {len(set(old) & set(new))} queries")
    return 1 if flags else 0


if __name__ == "__main__":
    sys.exit(main())
