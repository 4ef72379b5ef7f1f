"""Deterministic k-means (llm/clustering.py) invariants the SQL oracle
doesn't cover: repeat-run determinism, full assignment coverage, and
that iterating strictly reduces (or holds) the quantized within-cluster
cost — Lloyd's monotonicity, which only holds if assignment and update
are implemented consistently."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from octopufs_spark.llm import clustering
from octopufs_spark.tables import load

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def vecs(spark):
    return load(spark, SF_DIR, "embeddings")


def _cost(vecs_df, assignment):
    """Exact integer within-cluster cost for the assignment's own
    integer-mean centroids."""
    q = clustering.quantize(vecs_df).join(assignment, "vec_id")
    cents = (
        q.select("cluster", F.posexplode("qv").alias("pos", "val"))
        .groupBy("cluster", "pos")
        .agg(F.floor(F.sum("val").cast("double") / F.count("*")).cast("long").alias("m"))
    )
    per_dim = (
        q.select("vec_id", "cluster", F.posexplode("qv").alias("pos", "val"))
        .join(cents, ["cluster", "pos"])
        .select(((F.col("val") - F.col("m")) * (F.col("val") - F.col("m"))).alias("sq"))
    )
    return per_dim.agg(F.sum("sq")).collect()[0][0]


def test_assignment_total_and_deterministic(spark, vecs):
    a1 = clustering.kmeans_int(vecs, k=4, iters=2).collect()
    a2 = clustering.kmeans_int(vecs, k=4, iters=2).collect()
    assert len(a1) == vecs.count()
    assert sorted((r["vec_id"], r["cluster"]) for r in a1) == sorted(
        (r["vec_id"], r["cluster"]) for r in a2
    )
    assert {r["cluster"] for r in a1} <= {0, 1, 2, 3}


def test_lloyds_cost_monotone(spark, vecs):
    costs = [
        _cost(vecs, clustering.kmeans_int(vecs, k=4, iters=i)) for i in (1, 2, 4)
    ]
    assert costs[0] >= costs[1] >= costs[2]


def test_init_vectors_stay_near_own_centroid_first_iter(spark, vecs):
    # After 0 update rounds the init vectors are their own centroids,
    # so each vec_id < k must be assigned to its own cluster id.
    q = clustering.quantize(vecs).localCheckpoint()
    init = [list(r["qv"]) for r in q.where(F.col("vec_id") < 4).orderBy("vec_id").collect()]
    a0 = clustering.assign_clusters(q, init)
    own = a0.where(F.col("vec_id") < 4).collect()
    assert all(r["cluster"] == r["vec_id"] for r in own)
