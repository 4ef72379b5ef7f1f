"""Behavior-level tests for the training-run prep operators
(queries/trainprep.py). Value-level cross-engine correctness is the
oracle gate's job (tests/test_oracle_parity.py sweeps these too); here
we assert the SEMANTIC invariants a dataloader or trainer depends on:
the split partitions without leakage, shards cover the corpus evenly,
the trained logistic weights actually descend the loss, and the
normal-equation statistics solve to a working linear probe.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from octopufs_spark.queries import trainprep
from octopufs_spark.tables import load
from tests.conftest import SF_DIR


def test_shard_assign_covers_corpus_evenly(spark):
    out = trainprep.q_ext_shard_assign(spark, SF_DIR).collect()
    n_docs = load(spark, SF_DIR, "documents").count()
    assert sum(r["n_docs"] for r in out) == n_docs  # partition, no loss
    assert all(0 <= r["shard"] < 64 for r in out)
    # md5 is uniform: with n docs over 64 shards no shard should hold
    # more than ~4x the mean (a loose bound that still catches a broken
    # hash collapsing everything onto few shards).
    mean = n_docs / 64
    assert max(r["n_docs"] for r in out) <= max(4 * mean, 8)


def test_length_buckets_account_for_every_token(spark):
    out = trainprep.q_ext_length_buckets(spark, SF_DIR).collect()
    toks = (
        load(spark, SF_DIR, "documents")
        .select(F.size(F.filter(F.split("text", " "), lambda x: x != "")).alias("n"))
        .agg(F.sum("n"), F.count("*"))
        .first()
    )
    assert sum(r["total_tokens"] for r in out) == toks[0]
    assert sum(r["n_docs"] for r in out) == toks[1]
    assert all(r["padding_waste"] >= 0 and r["truncated_tokens"] >= 0 for r in out)


def test_split_leakproof_partitions_without_leakage(spark):
    rows = trainprep.q_ext_split_leakproof(spark, SF_DIR).collect()
    n_docs = load(spark, SF_DIR, "documents").count()
    by_split = {r["split"]: r for r in rows}
    assert set(by_split) <= {"train", "val", "test"} and "train" in by_split
    assert sum(r["n_docs"] for r in rows) == n_docs  # a true partition
    assert all(r["leaky_clusters"] == 0 for r in rows)  # the guarantee
    # train gets 12/16 of the hash space; don't let a sign flip in the
    # split predicate pass silently.
    assert by_split["train"]["n_docs"] > n_docs / 3


def test_logreg_descends_the_loss(spark):
    """Two GD rounds from w=0 must strictly reduce mean logistic loss
    on the training objective (computed here with the same algebraic
    sigmoid the query trains with)."""
    out = trainprep.q_ext_logreg_train(spark, SF_DIR).collect()
    w = np.zeros(64)
    for r in out:
        w[r["dim"] - 1] = r["weight"]
    emb = load(spark, SF_DIR, "embeddings").select("embedding", "label").collect()
    X = np.array([r["embedding"] for r in emb], dtype=np.float64)
    y = np.array([1.0 if r["label"] < 5 else 0.0 for r in emb])

    def loss(wv):
        t = X @ wv
        p = np.clip(0.5 * (1 + t / (1 + np.abs(t))), 1e-9, 1 - 1e-9)
        return float(-np.mean(y * np.log(p) + (1 - y) * np.log(1 - p)))

    assert loss(w) < loss(np.zeros(64))
    assert all(math.isfinite(r["weight"]) for r in out)


def test_normal_equations_match_numpy_and_solve(spark):
    out = trainprep.q_ext_normal_equations(spark, SF_DIR).collect()
    emb = load(spark, SF_DIR, "embeddings").select("embedding", "label").collect()
    X = np.array([r["embedding"] for r in emb], dtype=np.float64)
    y = np.array([1.0 if r["label"] < 5 else 0.0 for r in emb])
    xty = np.zeros(64)
    diag = np.zeros(64)
    for r in out:
        assert r["n"] == len(emb)
        xty[r["dim"] - 1] = r["xty"]
        diag[r["dim"] - 1] = r["xtx_diag"]
    # statistics agree with a local exact recompute (the query rounds
    # per-row contributions at 9 decimals; n rows bound the drift)
    assert np.allclose(xty, X.T @ y, atol=len(emb) * 1e-9)
    assert np.allclose(diag, np.diag(X.T @ X), atol=len(emb) * 1e-9)
    # and the full workflow works: the driver ridge-solves the k-by-k
    # system with the engine-computed X'y (the full X'X is the same
    # kind of distributed aggregate; recomputed locally here) and the
    # resulting probe must beat predicting the base rate.
    # center y for the intercept, tiny ridge for conditioning: the
    # in-sample fit can then only improve on predicting the mean.
    xtyc = xty - X.sum(axis=0) * y.mean()
    w = np.linalg.solve(X.T @ X + 1e-6 * np.eye(64), xtyc)
    pred = y.mean() + X @ w
    base = float(np.mean((y - y.mean()) ** 2))
    assert float(np.mean((y - pred) ** 2)) < base


def test_quality_ensemble_bands_are_exhaustive(spark):
    rows = trainprep.q_ext_quality_ensemble(spark, SF_DIR).collect()
    n_docs = load(spark, SF_DIR, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert all(0 <= r["band"] <= 9 for r in rows)
    for r in rows:
        assert 0 <= r["retained"] <= r["n_docs"]
        # score_sum must sit inside the band's score range (loose: the
        # band is [band/10, (band+1)/10) except the top band's cap)
        if r["band"] < 9:
            assert r["band"] / 10 * r["n_docs"] <= r["score_sum"] <= (r["band"] + 1) / 10 * r["n_docs"]


def test_dedup_normalized_counts_are_consistent(spark):
    r = trainprep.q_ext_dedup_normalized(spark, SF_DIR).first()
    # normalization can only fold MORE docs together than raw equality
    assert r["distinct_norm"] <= r["distinct_raw"] <= r["n_docs"]
    assert r["norm_dupe_docs"] >= r["exact_dupe_docs"] >= 0


def test_corpus_mix_budget_caps_at_equal_share(spark):
    rows = trainprep.q_ext_corpus_mix(spark, SF_DIR).collect()
    total = sum(r["tokens"] for r in rows)
    equal = total // len(rows)
    for r in rows:
        assert r["budget_tokens"] <= r["tokens"]  # downsampling-only
        assert r["budget_tokens"] <= equal + 1
        assert 0 < r["share"] < 1
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-6


def test_mix_temperature_flattens_toward_uniform(spark):
    rows = trainprep.q_ext_mix_temperature(spark, SF_DIR).collect()
    assert abs(sum(r["nat_share"] for r in rows) - 1.0) < 1e-6
    assert abs(sum(r["temp_share"] for r in rows) - 1.0) < 1e-6
    mean_tokens = sum(r["tokens"] for r in rows) / len(rows)
    for r in rows:
        # sqrt-scaling moves every share TOWARD uniform: sources above
        # the mean get downweighted (upsample < 1), below upweighted.
        if r["tokens"] > mean_tokens * 1.05:
            assert r["upsample"] < 1.0
        if 0 < r["tokens"] < mean_tokens * 0.95:
            assert r["upsample"] > 1.0
        # temp share sits between natural share and uniform 1/n
        lo, hi = sorted((r["nat_share"], 1.0 / len(rows)))
        assert lo - 1e-9 <= r["temp_share"] <= hi + 1e-9


def test_shuffle_order_is_an_exact_permutation(spark):
    rows = trainprep.q_ext_shuffle_order(spark, SF_DIR).collect()
    n_docs = load(spark, SF_DIR, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    # Recompute checksums independently: positions within a shard must
    # be exactly 1..n in the order of the second hash (tie: doc_id).
    import hashlib

    docs = [r["doc_id"] for r in load(spark, SF_DIR, "documents").select("doc_id").collect()]
    per_shard: dict[int, list[tuple[int, int]]] = {}
    for d in docs:
        h = hashlib.md5(str(d).encode()).hexdigest()
        shard = int(h[:4], 16) % 64
        ordk = int(hashlib.md5(f"{d}:o".encode()).hexdigest()[:8], 16)
        per_shard.setdefault(shard, []).append((ordk, d))
    expect = {}
    for shard, items in per_shard.items():
        items.sort()
        expect[shard] = sum(pos * (d % 1000003) for pos, (_, d) in enumerate(items, 1))
    got = {r["shard"]: r["perm_checksum"] for r in rows}
    assert got == expect
    # Determinism: a second run reproduces the identical permutation.
    again = {r["shard"]: r["perm_checksum"] for r in trainprep.q_ext_shuffle_order(spark, SF_DIR).collect()}
    assert again == got


def test_curriculum_order_prefix_property(spark):
    rows = trainprep.q_ext_curriculum_order(spark, SF_DIR).collect()
    rows.sort(key=lambda r: r["cum_tokens"])
    # cum_tokens strictly increases down the ranking and each step adds
    # exactly that source's tokens.
    acc = 0
    for r in rows:
        acc += r["tokens"]
        assert r["cum_tokens"] == acc
    # ranking is by avg_score desc (tiebreak source asc)
    keys = [(-r["avg_score"], r["source"]) for r in rows]
    assert keys == sorted(keys)
    # in_budget is a PREFIX of the ranking: once outside, never back in
    flags = [r["in_budget"] for r in rows]
    assert flags == sorted(flags, reverse=True)
    total = sum(r["tokens"] for r in rows)
    for r in rows:
        assert r["in_budget"] == (1 if r["cum_tokens"] <= total // 2 else 0)
