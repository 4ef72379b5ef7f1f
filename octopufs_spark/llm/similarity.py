"""Similarity search over embedding columns.

Exact brute-force cosine top-k (the correctness baseline) and a
random-hyperplane LSH-bucketed approximate variant (the 100 TB path:
candidates come from bucket-equality joins, so cost scales with bucket
population, not n²). Dot products run JVM-side via higher-order array
functions — no Python in the scoring loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<double> columns (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, z: acc + z
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def cosine_topk_exact(
    vecs: DataFrame, k: int = 5, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact all-pairs cosine top-k per query vector.

    O(n²) scoring — correct baseline for small candidate sets (and the
    verifier for ANN recall). Returns [vec_a, vec_b, cos_sim, rn].
    cos_sim is rounded to 6 decimals to absorb cross-engine
    accumulation drift in the oracle comparison.
    """
    from pyspark.sql.window import Window

    v = vecs.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("emb")
    ).withColumn("norm", F.sqrt(dot(F.col("emb"), F.col("emb"))))
    a, b = v.alias("a"), v.alias("b")
    # norms precomputed per vector (sqrt(dot(x,x)) once, not per pair);
    # norm_a*norm_b is bit-identical to the naive per-pair expression.
    pairs = a.join(b, F.col(f"a.{id_col}") != F.col(f"b.{id_col}")).select(
        F.col(f"a.{id_col}").alias("vec_a"),
        F.col(f"b.{id_col}").alias("vec_b"),
        F.round(
            dot(F.col("a.emb"), F.col("b.emb")) / (F.col("a.norm") * F.col("b.norm")), 6
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("vec_a").orderBy(F.desc("cos_sim"), F.asc("vec_b"))
    return (
        pairs.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= k)
    )


def cosine_near_dup_pairs(
    vecs: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a, b, cos_sim) with
    a < b and cos_sim ≥ threshold.

    Exact all-pairs variant — the correctness baseline. The 100 TB
    scale path replaces the cross join with the LSH bucket join
    (``cosine_topk_ann``'s candidate generation) so only same-bucket
    pairs are scored.
    """
    v = vecs.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("emb")
    ).withColumn("norm", F.sqrt(dot(F.col("emb"), F.col("emb"))))
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
            F.round(
                dot(F.col("a.emb"), F.col("b.emb")) / (F.col("a.norm") * F.col("b.norm")), 6
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def hyperplane_lsh_buckets(
    vecs: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-of-projection LSH bucket id per vector (random hyperplanes).

    The plane matrix is generated driver-side from a fixed seed and
    captured in the UDF closure — shipped once per task, no shuffle.
    Projection runs as one Arrow-batched numpy matmul per batch
    (building it from per-element Catalyst literals instead compiles a
    pathological codegen method). Bucket = n_planes-bit signature.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))

    @pandas_udf("string")
    def bucket_udf(embs: pd.Series) -> pd.Series:
        m = np.stack(embs.to_numpy())  # (batch, dim)
        signs = (m @ planes.T) >= 0
        return pd.Series(["".join("1" if b else "0" for b in row) for row in signs])

    v = vecs.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("emb"))
    return v.withColumn("bucket", bucket_udf(F.col("emb")))


def cosine_topk_ivf(
    vecs: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: k-means partitions the
    vector space; each vector is indexed under its nearest centroid and
    each query probes its ``n_probe`` nearest centroids' lists.

    The alternative bucketing strategy to random-hyperplane LSH:
    data-adaptive cells (better for clustered embeddings) at the cost
    of a training pass. At 100 TB the centroid table is tiny and
    broadcast; candidate scoring shuffles on cluster id, so cost scales
    with cell population × n_probe, not n². Returns
    [vec_a, vec_b, cos_sim, rn].
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql.window import Window

    v = vecs.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("emb"))
    # cache: k-means makes one pass per iteration — without this every
    # pass re-reads and re-featurizes the source.
    ml = v.withColumn("fvec", array_to_vector("emb")).cache()
    # 5 Lloyd iterations suffice for *candidate generation*: cells only
    # need to be stable enough that near neighbors co-locate — recall is
    # governed by n_probe, not centroid convergence (each extra
    # iteration is a full pass over the data at scale).
    model = KMeans(
        k=n_clusters, seed=seed, featuresCol="fvec", predictionCol="cluster", maxIter=5
    ).fit(ml)
    indexed = model.transform(ml).select(id_col, "emb", "cluster")

    centers = np.stack([np.asarray(c) for c in model.clusterCenters()])  # tiny: driver-side
    c_norm = centers / np.maximum(np.linalg.norm(centers, axis=1, keepdims=True), 1e-12)

    @pandas_udf("array<int>")
    def probe_udf(embs: pd.Series) -> pd.Series:
        m = np.stack(embs.to_numpy())
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ c_norm.T  # (batch, n_clusters)
        top = np.argsort(-sims, axis=1)[:, :n_probe]
        return pd.Series([row.astype("int32").tolist() for row in top])

    # precompute norms once at index time — cosine per pair then costs
    # one dot product instead of three.
    normed = indexed.withColumn("norm", F.sqrt(dot(F.col("emb"), F.col("emb"))))
    queries = normed.select(
        F.col(id_col).alias("vec_a"),
        F.col("emb").alias("emb_a"),
        F.col("norm").alias("norm_a"),
        F.explode(probe_udf(F.col("emb"))).alias("cluster"),
    )
    pairs = queries.join(
        normed.select(
            F.col(id_col).alias("vec_b"),
            F.col("emb").alias("emb_b"),
            F.col("norm").alias("norm_b"),
            "cluster",
        ),
        ["cluster"],
    ).where(F.col("vec_a") != F.col("vec_b"))
    scored = pairs.select(
        "vec_a",
        "vec_b",
        F.round(
            dot(F.col("emb_a"), F.col("emb_b")) / (F.col("norm_a") * F.col("norm_b")), 6
        ).alias("cos_sim"),
    ).dropDuplicates(["vec_a", "vec_b"])
    w = Window.partitionBy("vec_a").orderBy(F.desc("cos_sim"), F.asc("vec_b"))
    return scored.withColumn("rn", F.row_number().over(w).cast("long")).where(F.col("rn") <= k)


def cosine_topk_ann(
    vecs: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: score only within LSH buckets.

    At scale: shuffle on bucket (uniform-ish), per-bucket pairwise
    scoring. Recall is tuned by n_planes (fewer planes → bigger buckets
    → higher recall, more compute). Returns [vec_a, vec_b, cos_sim, rn].
    """
    from pyspark.sql.window import Window

    b = hyperplane_lsh_buckets(vecs, dim, n_planes, seed, id_col, vec_col)
    bn = b.withColumn("norm", F.sqrt(dot(F.col("emb"), F.col("emb"))))
    lhs, rhs = bn.alias("a"), bn.alias("b")
    pairs = lhs.join(
        rhs,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("vec_a"),
        F.col(f"b.{id_col}").alias("vec_b"),
        F.round(
            dot(F.col("a.emb"), F.col("b.emb")) / (F.col("a.norm") * F.col("b.norm")), 6
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("vec_a").orderBy(F.desc("cos_sim"), F.asc("vec_b"))
    return (
        pairs.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= k)
    )
