"""Driver-contract tests for __spark_entry__.py: the three functions
the correctness harness calls, plus a build-check of every registered
query so a registration/column regression fails fast in pytest rather
than in the external gate."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from tests.conftest import SF_DIR  # noqa: E402


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"l_returnflag", "sum_qty", "count_order"} <= set(df.columns)


def test_oracles_subset_of_queries():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 219  # inventory floor: don't silently lose queries
    # r4: the last 4 declared-weak entries (seeded ANN/dedup production
    # variants) gained planted-clone contract oracles — every registered
    # query is now oracle-backed. Keep it that way.
    weak = set(q) - set(o)
    assert weak == set()


def test_every_query_builds(spark):
    """Every registered callable produces a DataFrame against sf0.001
    (plan construction catches missing columns/typos; execution is the
    oracle gate's job)."""
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_DIR)
        assert df.columns, f"{name} produced no columns"


def test_registry_matches_survey_declaration():
    """SURVEY.md §2C is the judged contract: every backticked q_* name
    in the survey must be registered and vice versa — no silent drift
    in either direction."""
    import re
    from pathlib import Path

    survey = (Path(__file__).resolve().parent.parent / "SURVEY.md").read_text()
    declared = set(re.findall(r"`(q_[a-z0-9_]+)`", survey))
    registered = set(entrymod.queries())
    assert registered - declared == set(), f"undeclared: {sorted(registered - declared)}"
    assert declared - registered == set(), f"unregistered: {sorted(declared - registered)}"
