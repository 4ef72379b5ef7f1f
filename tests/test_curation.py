"""Behavior-level tests for the curation audits (queries/curation.py)
and the subquery/interval SQL surface (queries/subq.py). Value-level
cross-engine correctness is the oracle gate's job
(tests/test_oracle_parity.py sweeps these too); here we assert the
semantic invariants a curation pipeline depends on: rule counters
partition the corpus, contamination shares are well-formed fractions,
drift cross-products reconcile with their own sums, entropy bands stay
inside the alphabet's information bound, the epoch plan respects both
the cap and the budget, and component labels partition the node set.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from octopufs_spark.queries import curation, subq
from octopufs_spark.queries.graph import _edges
from octopufs_spark.tables import load
from tests.conftest import SF_DIR


def test_gopher_rules_counters_partition_the_corpus(spark):
    r = curation.q_ext_gopher_rules(spark, SF_DIR).first()
    n_docs = load(spark, SF_DIR, "documents").count()
    assert r["n_docs"] == n_docs
    for c in ("fail_len", "fail_wlen", "fail_alpha", "fail_stop", "fail_ellipsis"):
        assert 0 <= r[c] <= n_docs
    assert 0 <= r["pass_all"] <= n_docs
    # A doc failing any rule is not in pass_all, so pass_all plus the
    # LARGEST single failure count can never exceed the corpus.
    worst = max(r[c] for c in ("fail_len", "fail_wlen", "fail_alpha", "fail_stop"))
    assert r["pass_all"] + worst <= n_docs
    # Retained token mass only comes from passing docs.
    total_tokens = (
        load(spark, SF_DIR, "documents")
        .select(F.size(F.filter(F.split("text", " "), lambda x: x != "")).alias("n"))
        .agg(F.sum("n"))
        .first()[0]
    )
    assert 0 <= r["retained_tokens"] <= total_tokens
    if r["pass_all"] == 0:
        assert r["retained_tokens"] == 0


def test_source_contamination_shares_are_well_formed(spark):
    rows = curation.q_ext_source_contamination(spark, SF_DIR).collect()
    n_sources = load(spark, SF_DIR, "documents").select("source").distinct().count()
    assert len(rows) == n_sources
    for r in rows:
        assert 0 <= r["n_shared"] <= r["n_shingles"]
        assert 0 <= r["shared_milli"] <= 1000
        assert r["shared_milli"] == r["n_shared"] * 1000 // r["n_shingles"]
        assert r["n_docs"] >= 1


def test_embedding_drift_cross_product_reconciles(spark):
    rows = curation.q_ext_embedding_drift(spark, SF_DIR).collect()
    n_vecs = load(spark, SF_DIR, "embeddings").count()
    dim = len(load(spark, SF_DIR, "embeddings").select("embedding").first()[0])
    assert len(rows) == dim
    for r in rows:
        assert r["n_a"] + r["n_b"] == n_vecs
        assert r["drift_x"] == abs(
            r["sum_a_milli"] * r["n_b"] - r["sum_b_milli"] * r["n_a"]
        )


def test_char_entropy_bands_respect_information_bound(spark):
    rows = curation.q_ext_char_entropy(spark, SF_DIR).collect()
    n_docs = load(spark, SF_DIR, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    # 27-symbol alphabet: entropy <= log2(27) ~ 4.755 bits, so decibit
    # bands live in [0, 47].
    bound = int(math.log2(27) * 10)
    for r in rows:
        assert 0 <= r["band"] <= bound


def test_token_budget_plan_respects_cap_and_budget(spark):
    rows = curation.q_ext_token_budget_plan(spark, SF_DIR).collect()
    total = sum(r["tokens"] for r in rows)
    for r in rows:
        assert 0 <= r["epochs_milli"] <= 4000
        assert r["effective_tokens"] == r["tokens"] * r["epochs_milli"] // 1000
    # Per-source shares floor-divide the budget, so the plan can never
    # overshoot it.
    assert sum(r["effective_tokens"] for r in rows) <= 2 * total


def test_graph_components_partition_the_node_set(spark):
    rows = curation.q_graph_components(spark, SF_DIR).collect()
    edges = _edges(spark, SF_DIR)
    nodes = (
        edges.select(F.col("src").alias("n"))
        .union(edges.select(F.col("dst").alias("n")))
        .distinct()
        .collect()
    )
    node_set = {r["n"] for r in nodes}
    assert sum(r["n_nodes"] for r in rows) == len(node_set)
    # Component ids are min member ids, hence actual nodes.
    assert all(r["component"] in node_set for r in rows)
    assert min(r["component"] for r in rows) == min(node_set)


def test_exists_and_scalar_subquery_agree_on_customer_totals(spark):
    ex = {r["n_name"]: r for r in subq.q_sql_exists_correlated(spark, SF_DIR).collect()}
    sc = {r["n_name"]: r for r in subq.q_sql_scalar_subquery(spark, SF_DIR).collect()}
    assert set(ex) == set(sc) and len(ex) == 25
    for name, r in ex.items():
        # idle (no orders) and big spenders (has a >150k order) are
        # disjoint customer sets within the nation.
        assert r["idle_customers"] + r["big_spenders"] <= sc[name]["n_cust"]
    assert sum(s["share_milli"] for s in sc.values()) <= 1000


def test_arg_extremes_bounds(spark):
    rows = subq.q_agg_arg_extremes(spark, SF_DIR).collect()
    for r in rows:
        assert 0 <= r["n_overdrawn"] <= r["n_cust"]
        if r["n_cust"] >= 2:
            assert r["richest"] != r["poorest"]


def test_interval_arithmetic_invariants(spark):
    rows = subq.q_scalar_interval(spark, SF_DIR).collect()
    n_orders = load(spark, SF_DIR, "orders").count()
    assert sum(r["n_orders"] for r in rows) == n_orders
    for r in rows:
        assert r["qtr"].month in (1, 4, 7, 10) and r["qtr"].day == 1
        assert 0 <= r["month_span"] <= 2
        assert 0 <= r["first_month_orders"] <= r["n_orders"]
        assert r["days_to_eom"] >= 0


def test_entropy_bands_match_python_reference_on_generated_strings(spark):
    """The 27-counter len-replace construction must equal a direct
    per-doc entropy computation (same 6dp term quantization) on
    arbitrary a-z+space strings — including repetition extremes the
    fixtures never hit (single-char docs: entropy 0, band 0)."""
    import random
    from collections import Counter
    from decimal import Decimal

    rng = random.Random(7)
    alphabet = "abcdefghijklmnopqrstuvwxyz "
    texts = ["aaaa", "ab", "the quick brown fox", " ", "zz zz zz"]
    for _ in range(40):
        n = rng.randint(1, 80)
        texts.append("".join(rng.choice(alphabet) for _ in range(n)))

    def ref_band(s: str) -> int:
        counts = Counter(ch for ch in s if ch in alphabet)
        known = sum(counts.values())
        ent = Decimal(0)
        for c in counts.values():
            term = round(c / known * math.log2(known / c), 6)
            ent += Decimal(str(term)).quantize(Decimal("0.000001"))
        return int(ent * 10 // 1)

    expected = Counter(ref_band(t) for t in texts)
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = {r["band"]: r["n_docs"] for r in curation.entropy_bands(df).collect()}
    assert got == dict(expected)
