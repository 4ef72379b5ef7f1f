"""Shuffle-metric regression gate (NEXT item: make tools/bench_diff.py
automatic): compare the latest BENCH_FULL.json plan metrics against
the committed baseline (tools/bench_baseline.json). Wall-clock is
noise; shuffle bytes and peak-task shuffle write are deterministic
plan properties — a new exchange or a fattened shuffle fails here even
when timings look fine. After an INTENTIONAL plan change, re-run
bench.py and refresh the baseline copy in the same commit."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
RATIO = 2.0
ABS_FLOOR = 256 * 1024  # ignore growth below 256 KiB

WATCHED = ("shuffle_write_bytes", "peak_task_shuffle_write_bytes")


def test_shuffle_metrics_vs_baseline():
    base_p = REPO / "tools" / "bench_baseline.json"
    cur_p = REPO / "BENCH_FULL.json"
    if not base_p.exists() or not cur_p.exists():
        pytest.skip("bench files missing")
    base = json.loads(base_p.read_text()).get("plan_metrics", {})
    cur = json.loads(cur_p.read_text()).get("plan_metrics", {})
    if not base or not cur:
        pytest.skip("no plan metrics recorded")
    regressions = []
    for name, b in base.items():
        c = cur.get(name)
        if c is None:
            continue  # query removed/renamed — baseline refresh handles it
        for metric in WATCHED:
            old, new = b.get(metric, 0), c.get(metric, 0)
            if new <= ABS_FLOOR:
                continue
            # old == 0 with material new bytes is a brand-new exchange —
            # exactly the case this gate exists to catch, not a skip.
            if old == 0 or new / old > RATIO:
                regressions.append(f"{name}.{metric}: {old} -> {new}")
    assert not regressions, (
        "shuffle plan regressions vs tools/bench_baseline.json "
        "(refresh the baseline if intentional):\n" + "\n".join(regressions)
    )


def test_no_superlinear_growth_at_sf1():
    """Verdict r4 #3: per-query sf0.1->sf1 growth must stay within the
    10x data ratio (with slack); super-linear queries need an explicit
    'scale-exempt: <name>' justification in SCALE.md."""
    import sys

    sys.path.insert(0, str(REPO / "tools"))
    import scale_gate

    if not (REPO / "BENCH_SF1.json").exists() or not (REPO / "BENCH_FULL.json").exists():
        pytest.skip("sf1 bench not recorded")
    bad = scale_gate.check()
    assert not bad, "super-linear sf1 growth (justify in SCALE.md or fix):\n" + "\n".join(bad)


def test_robust_time_repeat_logic():
    """bench.py reports the MEDIAN of 3+ samples (one outlier in either
    direction — GC pause, cached run — is discarded) and the MIN below
    3 (the first run pays codegen JIT; no outlier budget for 2)."""
    import sys

    sys.path.insert(0, str(REPO))
    from bench import robust_time

    assert robust_time([]) == -1.0
    assert robust_time([2.0]) == 2.0
    assert robust_time([5.0, 2.0]) == 2.0  # min: first-run JIT discarded
    assert robust_time([9.0, 1.0, 1.1]) == 1.1  # median kills the GC spike
    assert robust_time([0.01, 1.0, 1.1]) == 1.0  # and the too-fast outlier
    assert robust_time([4.0, 1.0, 2.0, 3.0]) == 3.0  # upper-middle of even n


def test_outlier_retime_selection():
    """r7 verdict #1: a median >1.5x its prior record with an UNCHANGED
    plan is a phantom regression and gets re-timed; a changed plan, a
    ratio under threshold, missing metrics, or a failed run never do.
    r9 verdict #1: a plan change means SHUFFLE metrics moved — stage
    counts jitter under AQE and must not deny a re-time."""
    import bench

    pm = {"stages": 10, "shuffle_write_bytes": 1_000_000, "shuffle_write_records": 500}
    pm_close = dict(pm, shuffle_write_bytes=1_010_000)  # within 2% slack
    pm_diff = dict(pm, shuffle_write_records=501)  # a REAL plan change
    timings = {
        "noisy": 5.0,       # 7x, plan unchanged -> retime
        "legit": 5.0,       # 7x but plan changed -> real regression, keep
        "steady": 0.8,      # 1.1x -> untouched
        "nometrics": 5.0,   # 7x but no plan evidence -> keep
        "failed": -1.0,     # errored run -> never retimed
        "fresh": 4.0,       # no prior record -> nothing to compare
    }
    prior = {"noisy": 0.7, "legit": 0.7, "steady": 0.7, "nometrics": 0.7, "failed": 0.7}
    cur_pm = {"noisy": pm_close, "legit": pm_diff, "steady": pm, "failed": pm}
    prior_pm = {"noisy": pm, "legit": pm, "steady": pm, "failed": pm}
    assert bench.find_outliers(timings, prior, cur_pm, prior_pm) == ["noisy"]
    # plan equality is exact on records, 2% slack on bytes
    assert bench.plans_unchanged(pm, pm_close)
    assert not bench.plans_unchanged(pm, pm_diff)
    assert not bench.plans_unchanged(pm, dict(pm, shuffle_write_bytes=2_000_000))
    assert not bench.plans_unchanged(pm, None)


def test_stage_jitter_does_not_deny_retime():
    """r9 verdict #1 regression: the official r9 record denied 4
    legitimate load-spike re-times SOLELY because AQE stage counts
    jittered while every shuffle metric matched exactly. Replays the
    actual q_ext_dedup_cluster numbers from that record (0.78→1.47 s,
    stages 37→44, shuffle records/bytes identical): the retime pass
    must select it."""
    import bench

    prior_pm = {
        "q_ext_dedup_cluster": {
            "stages": 37,
            "shuffle_write_bytes": 4026,
            "shuffle_write_records": 161,
        }
    }
    cur_pm = {
        "q_ext_dedup_cluster": {
            "stages": 44,  # AQE jitter — identical shuffle signature
            "shuffle_write_bytes": 4026,
            "shuffle_write_records": 161,
        }
    }
    assert bench.plans_unchanged(
        cur_pm["q_ext_dedup_cluster"], prior_pm["q_ext_dedup_cluster"]
    )
    got = bench.find_outliers(
        {"q_ext_dedup_cluster": 1.47}, {"q_ext_dedup_cluster": 0.78}, cur_pm, prior_pm
    )
    assert got == ["q_ext_dedup_cluster"]


def test_bench_diff_stage_jitter_is_informational_only():
    """r9 verdict #2 regression: the r8→r9 diff printed 6 false
    "REGRESSION stages" flags on queries with byte-identical shuffle
    metrics. Stage deltas must demote to info notes (no exit-1 flag);
    a genuine shuffle fattening still flags."""
    import sys

    sys.path.insert(0, str(REPO / "tools"))
    import bench_diff

    base = {"shuffle_write_bytes": 5_000_000, "shuffle_write_records": 1000,
            "peak_task_shuffle_write_bytes": 500_000}
    old = {"q_jit": dict(base, stages=37), "q_fat": dict(base, stages=10)}
    new = {
        "q_jit": dict(base, stages=44),  # AQE jitter, shuffle identical
        "q_fat": dict(base, stages=10, shuffle_write_bytes=20_000_000),
    }
    flags, notes = bench_diff.plan_flags(old, new)
    assert [(q, k) for q, k, *_ in flags] == [("q_fat", "shuffle_write_bytes")]
    assert [(q, so, sn) for q, so, sn in notes] == [("q_jit", 37, 44)]


def test_bench_diff_noise_floor_from_timing_spread():
    """r9 verdict #5: with both records carrying timing_spread, a mover
    whose normalized ratio sits inside its OWN sample spread is tagged
    'within own noise floor'; a mover beyond it is not."""
    import sys

    sys.path.insert(0, str(REPO / "tools"))
    import bench_diff

    old = {
        "queries": {"q_noisy": 1.0, "q_tight": 1.0},
        "load_sentinel": [0.1, 0.1],
        "timing_spread": {"q_noisy": [0.8, 1.0, 1.6], "q_tight": [0.98, 1.0, 1.02]},
    }
    new = {
        "queries": {"q_noisy": 1.8, "q_tight": 1.8},
        "load_sentinel": [0.1, 0.1],
        "timing_spread": {"q_noisy": [1.2, 1.8, 2.0], "q_tight": [1.75, 1.8, 1.85]},
    }
    assert bench_diff.noise_floor(old, new, "q_noisy") == 2.0  # 1.6/0.8
    assert bench_diff.noise_floor(old, new, "q_tight") < 1.1
    assert bench_diff.noise_floor({}, {}, "q_absent") == 1.0  # pre-r10 records
    lines = bench_diff.timing_report(old, new)
    noisy = [ln for ln in lines if "mover q_noisy" in ln]
    tight = [ln for ln in lines if "mover q_tight" in ln]
    assert noisy and "[within own noise floor]" in noisy[0]
    assert tight and "[within own noise floor]" not in tight[0]


def test_stdout_line_fits_capture_window():
    """r8 verdict #1: the one-line stdout contract must fit the
    consumer's 2000-char tail window no matter how many queries or
    retimed outliers the run produced. Round 8's BENCH_r08.json was
    `parsed: null` because the 40-entry outlier_retimed block rode the
    capped line; the line is now built from a slim payload that never
    carries it."""
    import bench

    # Worst case: 300 long-named queries and 100 retimed outliers.
    timings = {f"q_ext_some_quite_long_query_name_{i:03d}": i / 7.0 for i in range(300)}
    line = bench.stdout_line(timings, total=1234.567, sf=0.1, retimed_count=100)
    assert len(line) <= 1900
    parsed = json.loads(line)
    assert parsed["metric"] == "total_seconds_all_queries"
    assert parsed["value"] == 1234.567
    assert parsed["unit"] == "sec"
    assert parsed["sf"] == 0.1
    assert parsed["queries_in_full"] == 300
    assert parsed["outliers_retimed"] == 100
    assert parsed["queries"]  # at least some queries packed
    # Slowest-first packing: every kept query is >= every dropped one.
    kept_min = min(parsed["queries"].values())
    dropped = [t for n, t in timings.items() if n not in parsed["queries"]]
    assert all(t <= kept_min for t in dropped)
    # Degenerate case: zero queries still emits a valid, tiny line.
    empty = bench.stdout_line({}, total=0.0, sf=0.01)
    assert len(empty) < 200 and json.loads(empty)["queries_in_full"] == 0


def test_bench_diff_sentinel_normalization():
    """r8 verdict #6: bench_diff separates machine drift from code
    drift by normalizing per-query ratios with the load-sentinel
    medians — a uniformly-1.5x-slower machine reads as 1.0x
    normalized, and a genuinely-2x query still shows as a mover."""
    import sys

    sys.path.insert(0, str(REPO / "tools"))
    import bench_diff

    old = {
        "queries": {"q_a": 1.0, "q_b": 2.0, "q_c": 4.0},
        "load_sentinel": [0.10, 0.10, 0.11],
    }
    # machine 1.5x slower; q_c ALSO genuinely doubled on top of that
    new = {
        "queries": {"q_a": 1.5, "q_b": 3.0, "q_c": 12.0},
        "load_sentinel": [0.15, 0.16, 0.15],
    }
    assert abs(bench_diff.sentinel_factor(old, new) - 1.5) < 0.01
    lines = "\n".join(bench_diff.timing_report(old, new))
    assert "normalized" in lines
    assert "median 1.000x" in lines  # q_a/q_b are pure machine drift
    assert "mover q_c" in lines and "normalized 2.00x" in lines
    # pre-sentinel record degrades to raw-only, no crash
    raw_only = bench_diff.timing_report({"queries": {"q_a": 1.0}}, {"queries": {"q_a": 2.0}})
    assert any("raw ratios only" in ln for ln in raw_only)


def test_committed_plan_baselines_in_sync():
    """r9 verdict #6: PLANS.md and tools/bench_baseline.json must be
    refreshed against the SAME BENCH_FULL.json — the r9 flow needed two
    manual refresh commits and the artifacts drifted between them. One
    command (tools/explain_audit.py --refresh-baseline) now does both;
    this gate fails any commit where they drifted apart."""
    import sys

    sys.path.insert(0, str(REPO / "tools"))
    import explain_audit

    if not (REPO / "BENCH_FULL.json").exists():
        pytest.skip("no bench record")
    problems = explain_audit.check_baselines(str(REPO))
    assert not problems, "\n".join(problems)


def test_sentinel_factor_prefers_shuffle_series():
    """r9: the shuffle-shaped sentinel is the machine proxy when both
    records carry it (the CPU-only sum under-indexed Spark-bound
    drift); records that predate it fall back to the plain series."""
    import sys

    sys.path.insert(0, str(REPO / "tools"))
    import bench_diff

    old = {"load_sentinel": [0.1, 0.1], "load_sentinel_shuffle": [0.4, 0.4]}
    new = {"load_sentinel": [0.1, 0.1], "load_sentinel_shuffle": [0.8, 0.8]}
    assert abs(bench_diff.sentinel_factor(old, new) - 2.0) < 1e-9
    # pre-r9 old record: falls back to the plain series
    pre = {"load_sentinel": [0.1, 0.1]}
    assert abs(bench_diff.sentinel_factor(pre, new) - 1.0) < 1e-9
    assert bench_diff.sentinel_factor({}, new) is None
