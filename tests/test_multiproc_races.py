"""REAL cross-process commit races (r7 verdict task #4).

Every prior race test (two-writer contention, mixed-op fuzz, the
Hypothesis schedule model) runs threads inside one interpreter, where
the GIL and shared page cache soften timing. The manifest's atomicity
claim is cross-PROCESS: the no-overwrite publish (hard link on local
stores, conditional put elsewhere) must serialize writers that share
nothing but the filesystem. These tests spawn N real processes racing
append commits, WAP stage+publish, branch fast-forwards, and catalog
pin flips on one table root, then audit the log:

- version history is LINEAR: contiguous version numbers, one manifest
  per version, every parent pointer resolving below its child;
- ZERO lost updates: every operation that reported success left its
  unique marker file in the final snapshot (appends/publishes never
  drop a racer's rows);
- failures are CLEAN conflicts (ConcurrentModificationError), never
  corruption.

Spark is deliberately absent from the workers — commits are pure
manifest-layer I/O over pyarrow-written parquet, so the fuzz isolates
exactly the cross-process CAS primitive (and 4 Spark JVMs would turn
a race test into a startup benchmark).
"""

from __future__ import annotations

import multiprocessing as mp
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from octopufs_spark.manifest import ConcurrentModificationError, ManifestTable

N_PROCS = 5
OPS_PER_PROC = 16  # 5 * 16 = 80 attempts; >=50 must SUCCEED


def _stage(root: str, marker: str) -> str:
    staged = f"data-{marker}"
    os.makedirs(f"{root}/{staged}", exist_ok=True)
    pq.write_table(
        pa.table({"id": [hash(marker) % 10_000], "marker": [marker]}),
        f"{root}/{staged}/part-0.parquet",
    )
    return staged


def _append_build(t: ManifestTable, staged: str):
    def build(parent):
        base = parent.files if parent else []
        return sorted(base + t._data_files_under(staged))

    return build


def _race_worker(root: str, wid: int, out: "mp.Queue") -> None:
    """Mixed-op worker: appends, WAP stage+publish, branch+fast-forward.
    Reports (marker, op, outcome) per attempt; 'ok' means the op claims
    its rows are durable on main — the parent audits exactly that."""
    import random

    rng = random.Random(1000 + wid)
    t = ManifestTable(root)
    results = []
    for i in range(OPS_PER_PROC):
        marker = f"w{wid}-{i}"
        op = rng.choice(["append", "append", "wap", "branch_ff", "mor"])
        try:
            if op == "mor":
                # equality delete vector: the commit half of
                # delete_where_mor (the vector parquet itself needs no
                # Spark) — races the meta-carry path against appends
                dv_rel = f"_dv/dv-{marker}.parquet"
                os.makedirs(f"{root}/_dv", exist_ok=True)
                pq.write_table(pa.table({"id": [wid]}), f"{root}/{dv_rel}")

                def mor_build(parent):
                    if parent is None:
                        raise ValueError("MOR delete requires a snapshot")
                    return list(parent.files)

                t._commit_with_retry(
                    mor_build,
                    "delete_mor",
                    {"delete_vectors": [{"path": dv_rel, "keys": ["id"]}]},
                )
                results.append((marker, op, "ok"))
                continue
            staged = _stage(root, marker)
            if op == "append":
                t._commit_with_retry(_append_build(t, staged), "append", None)
                results.append((marker, op, "ok"))
            elif op == "wap":
                t._commit_with_retry(
                    _append_build(t, staged), "append", None, wap_id=marker
                )
                t.publish_wap(wap_id=marker)
                results.append((marker, op, "ok"))
            else:
                branch = f"b-{marker}"
                t.create_branch(branch)
                t._commit_with_retry(
                    _append_build(t, staged), "append", None, branch=branch
                )
                try:
                    t.fast_forward(branch)
                    results.append((marker, op, "ok"))
                except ConcurrentModificationError:
                    # main moved past the fork point: the documented
                    # clean abort — the branch rows are NOT on main
                    results.append((marker, op, "conflict"))
        except ConcurrentModificationError:
            results.append((marker, op, "conflict"))
        except RuntimeError as e:
            if "lost the" in str(e) and "race" in str(e):
                # bounded-retry exhaustion (reference-style 5 attempts)
                # under a commit storm: a documented clean outcome —
                # the audit still requires these rows NOT on main
                results.append((marker, op, "conflict"))
            else:
                results.append((marker, op, f"ERROR:RuntimeError:{e}"))
        except Exception as e:  # noqa: BLE001 — corruption shows here
            results.append((marker, op, f"ERROR:{type(e).__name__}:{e}"))
    out.put((wid, results))


def test_cross_process_commit_races_keep_log_linear(tmp_path):
    root = str(tmp_path / "t")
    # seed v1 so every worker starts from an existing table
    t = ManifestTable(root)
    staged = _stage(root, "seed")
    t._commit_with_retry(_append_build(t, staged), "commit", None)

    ctx = mp.get_context("spawn")
    out: mp.Queue = ctx.Queue()
    procs = [
        ctx.Process(target=_race_worker, args=(root, wid, out)) for wid in range(N_PROCS)
    ]
    for p in procs:
        p.start()
    results = [out.get(timeout=540) for _ in procs]
    for p in procs:
        p.join(timeout=60)
        assert p.exitcode == 0

    flat = [r for _wid, rs in results for r in rs]
    errors = [r for r in flat if r[2].startswith("ERROR")]
    assert errors == [], f"non-conflict failures: {errors}"
    oks = [r for r in flat if r[2] == "ok"]
    assert len(oks) >= 50, f"only {len(oks)} successful commits raced"

    # --- linear history: contiguous versions, one manifest per slot ---
    vs = t.versions()
    assert vs == list(range(vs[0], vs[0] + len(vs))), "version gaps/duplicates"
    for v in vs:
        m = t.read_manifest(v)
        assert m.version == v
        assert m.parent is None or m.parent < v

    # --- zero lost updates: every 'ok' marker is in the main head ---
    head = t.read_manifest()
    head_markers = {
        f.split("/", 1)[0].removeprefix("data-") for f in head.files
    }
    head_vectors = {dv["path"] for dv in head.meta.get("delete_vectors", [])}
    lost = [
        m
        for m, op, _r in oks
        if (op != "mor" and m not in head_markers)
        or (op == "mor" and f"_dv/dv-{m}.parquet" not in head_vectors)
    ]
    assert lost == [], f"committed rows/vectors missing from the head: {lost}"

    # --- clean-conflict rows are genuinely absent (no half-commits) ---
    conflicted = [m for m, _op, r in flat if r == "conflict"]
    for m in conflicted:
        assert m not in head_markers, f"conflicted op {m} leaked rows onto main"


def _pin_worker(catalog_root: str, table_roots: dict, wid: int, out: "mp.Queue") -> None:
    """Race catalog pin flips (the atomic multi-table commit point):
    each worker re-pins ITS OWN table repeatedly while sharing the one
    catalog log — disjoint flips must all merge, and the final catalog
    must hold every worker's last pin."""
    from octopufs_spark.multitable import Catalog

    cat = Catalog(catalog_root)
    name = f"t{wid}"
    t = ManifestTable(table_roots[name])
    last = None
    for i in range(10):
        staged = _stage(table_roots[name], f"p{wid}-{i}")
        v = t._commit_with_retry(_append_build(t, staged), "append", None)
        expected = {name: (cat.snapshot().get(name) or {}).get("version")}
        cat._commit_pins(
            {name: {"root": table_roots[name], "version": v}}, "catalog-register", expected
        )
        last = v
    out.put((name, last))


def test_cross_process_catalog_pin_flips_merge(tmp_path):
    from octopufs_spark.multitable import Catalog

    catalog_root = str(tmp_path / "cat")
    roots = {}
    for wid in range(4):
        name = f"t{wid}"
        root = str(tmp_path / name)
        t = ManifestTable(root)
        t._commit_with_retry(_append_build(t, _stage(root, f"seed{wid}")), "commit", None)
        roots[name] = root
    cat = Catalog(catalog_root)
    for name, root in roots.items():
        cat.register(name, ManifestTable(root))

    ctx = mp.get_context("spawn")
    out: mp.Queue = ctx.Queue()
    procs = [
        ctx.Process(target=_pin_worker, args=(catalog_root, roots, wid, out))
        for wid in range(4)
    ]
    for p in procs:
        p.start()
    finals = dict(out.get(timeout=540) for _ in procs)
    for p in procs:
        p.join(timeout=60)
        assert p.exitcode == 0

    snap = cat.snapshot()
    for name, last in finals.items():
        assert snap[name]["version"] == last, f"lost pin flip on {name}"
    # the catalog log itself stayed linear
    vs = cat.log.versions()
    assert vs == list(range(vs[0], vs[0] + len(vs)))
