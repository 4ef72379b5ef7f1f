"""CI replica of the driver's oracle gate, at sf0.001.

The driver hash-compares a bounded prefix of ``queries()`` per round,
so a divergent oracle can sit unnoticed until its turn comes up. This
test sweeps EVERY oracle-backed query against DuckDB on the small
fixture in the regular suite, so any Spark/DuckDB mismatch fails
locally first. (sf0.01 — the driver's scale — is covered by running
``python tools/verify_local.py`` manually; value mismatches are scale
independent, row-count-sensitive bugs usually reproduce at any sf.)

Set OCTOPUFS_SKIP_SWEEP=1 to skip when iterating on a single module.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, "/root/repo/tools")

from verify_local import sweep  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(bool(os.environ.get("OCTOPUFS_SKIP_SWEEP")), reason="sweep disabled")
def test_all_oracles_match_duckdb(spark):
    results = sweep(spark, SF_DIR, verbose=False)
    failures = {n: r["msg"] for n, r in results.items() if r["status"] == "fail"}
    n_pass = sum(1 for r in results.values() if r["status"] == "pass")
    assert not failures, f"{len(failures)} oracle mismatches: {failures}"
    # Inventory floor on the hard-verified set: don't silently demote
    # oracle-backed queries to weak.
    assert n_pass >= 119
