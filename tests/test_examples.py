"""The lakehouse demos are executable documentation — keep them
runnable. Each runs as a subprocess against its own tmp workspace
(self-contained synthetic data, no fixtures), asserting the final OK
line so a silent mid-script regression still fails. The corpus-based
demos (curation/pipeline) read the sf fixtures and are exercised by
the query suites that back every stage; these two compose code paths
no registered query drives end-to-end (streaming restart, CDC merge
sink, auto_optimize)."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

# Multi-minute end-to-end demos: excluded from the default
# (driver-window) run; run with `pytest -m slow` before recording.
pytestmark = pytest.mark.slow


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize(
    "script",
    [
        "examples/lakehouse_stream_demo.py",
        "examples/cdc_upsert_demo.py",
        "examples/schema_evolution_demo.py",
        "examples/wap_tag_demo.py",
        "examples/lakehouse_platform_demo.py",
        "examples/mv_maintenance_demo.py",
    ],
)
def test_demo_runs_clean(script):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, script)],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert proc.stdout.strip().splitlines()[-1] == "OK", proc.stdout[-2000:]
