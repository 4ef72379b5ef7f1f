"""Training-run preparation operators: the last mile between a curated
corpus and a dataloader, plus the distributed-ML primitives a data team
runs in-engine (no separate ML cluster) over embedding columns.

Everything here is exact cross-engine arithmetic: integer counts,
md5-derived determinism (the established q_ext_sample_hash pattern),
and DECIMAL-summed float contributions with explicit per-row rounding
so aggregation order can never drift between Spark and DuckDB. The
logistic-regression trainer uses the algebraic sigmoid
``0.5*(1 + t/(1+|t|))`` — pure IEEE arithmetic, no transcendental libm
calls whose last-ulp behavior differs across engines.

This module registers LAST (see queries/__init__.py): the registry's
fresh-first ordering must keep previously unsampled queries ahead of
brand-new ones so the driver's bounded per-round sample drains the
verification ledger before it reaches these.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from octopufs_spark.registry import register
from octopufs_spark.tables import load

# Shared tokenization — identical to queries/pipeline.py.
SQL_WORDS = "list_filter(string_split(text, ' '), x -> x <> '')"


def _words(col: str = "text"):
    return F.filter(F.split(F.col(col), " "), lambda x: x != "")


def _ntok():
    return F.size(_words()).cast("long")


def _md5_bucket(col, width: int):
    """First 4 md5 hex chars of ``col``'s string form, mod ``width``.

    Deterministic, engine-portable shard assignment: Spark ``conv``
    and DuckDB's ``('0x'||hex)::BIGINT`` agree on 16-bit hex. DuckDB
    twin: ``CAST(('0x'||substr(md5(CAST(c AS VARCHAR)),1,4)) AS BIGINT) % width``.
    """
    hx = F.substring(F.md5(col.cast("string")), 1, 4)
    return (F.conv(hx, 16, 10).cast("long") % width).alias("shard")


@register(
    "q_ext_shard_assign",
    oracle="""
WITH t AS (
  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 64 AS shard,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tok
  FROM documents
)
SELECT shard, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS total_tokens
FROM t GROUP BY shard
""",
)
def q_ext_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard assignment: every doc hashes to one
    of 64 shards via its md5 prefix; output is the per-shard manifest
    (doc count, token load) a dataloader consumes as its file plan.

    The reproducible global shuffle every pretraining run needs: the
    permutation is a pure per-row expression — stable across engines,
    runs, and partitionings — so resharding never re-reads state. At
    100 TB this is one projection + one 64-key aggregate; writing the
    shards themselves is `df.repartition(64, "shard").write` with the
    same expression, no sort, no skew (md5 is uniform)."""
    docs = load(spark, sf_dir, "documents")
    t = docs.select(
        _md5_bucket(F.col("doc_id"), 64),
        _ntok().alias("n_tok"),
    )
    return t.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
    )


@register(
    "q_ext_length_buckets",
    oracle="""
WITH t AS (
  SELECT CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tok
  FROM documents
), b AS (
  SELECT n_tok,
         LEAST(n_tok // 64, 7) AS bucket,
         (LEAST(n_tok // 64, 7) + 1) * 64 AS cap
  FROM t
)
SELECT bucket,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       CAST(SUM(cap - LEAST(n_tok, cap)) AS BIGINT) AS padding_waste,
       CAST(SUM(GREATEST(n_tok - 512, 0)) AS BIGINT) AS truncated_tokens
FROM b GROUP BY bucket
""",
)
def q_ext_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching plan: docs fall into eight 64-token
    buckets (the last open-ended at 512); per bucket, the padding waste
    if every doc pads to the bucket cap and the tokens lost to
    truncation at the 512 cap.

    The batch-shape audit run before fixing a dataloader's bucket
    boundaries — padding waste is pure money at scale. Integer
    arithmetic end-to-end; one projection + one 8-key aggregate, no
    shuffle beyond the tiny final groupBy."""
    docs = load(spark, sf_dir, "documents")
    t = docs.select(_ntok().alias("n_tok"))
    bucket = F.least(F.floor(F.col("n_tok") / 64), F.lit(7)).cast("long")
    b = t.select(
        F.col("n_tok"),
        bucket.alias("bucket"),
        ((bucket + 1) * 64).alias("cap"),
    )
    return b.groupBy("bucket").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.sum(F.col("cap") - F.least(F.col("n_tok"), F.col("cap"))).alias("padding_waste"),
        F.sum(F.greatest(F.col("n_tok") - 512, F.lit(0))).alias("truncated_tokens"),
    )


@register(
    "q_ext_split_leakproof",
    oracle="""
WITH c AS (
  SELECT doc_id, md5(text) AS ck FROM documents
), reps AS (
  SELECT ck, MIN(doc_id) AS rep FROM c GROUP BY ck
), sp AS (
  SELECT ck,
         CASE WHEN substr(md5(CAST(rep AS VARCHAR)), 1, 1) < 'c' THEN 'train'
              WHEN substr(md5(CAST(rep AS VARCHAR)), 1, 1) < 'e' THEN 'val'
              ELSE 'test' END AS split
  FROM reps
), a AS (
  SELECT c.doc_id, c.ck, sp.split FROM c JOIN sp USING (ck)
), leak AS (
  SELECT COALESCE(SUM(CASE WHEN ns > 1 THEN 1 ELSE 0 END), 0) AS leaky
  FROM (SELECT ck, COUNT(DISTINCT split) AS ns FROM a GROUP BY ck)
)
SELECT split, COUNT(*) AS n_docs, COUNT(DISTINCT ck) AS n_clusters,
       (SELECT CAST(leaky AS BIGINT) FROM leak) AS leaky_clusters
FROM a GROUP BY split
""",
)
def q_ext_split_leakproof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: docs cluster by exact-text
    digest, the cluster REPRESENTATIVE's hash decides the split, and
    every member follows its cluster — so duplicate documents can never
    straddle train and eval. Output: per-split doc/cluster counts plus
    the (provably zero) count of clusters spanning >1 split.

    The split bug this prevents — eval contamination via duplicated
    docs — is one of the most common corpus-prep errors. Shape: one
    md5 groupBy (exact-dedup shape), one hash join back on the digest,
    one 3-key aggregate; the leak check reuses the same join. At
    100 TB the cluster key would come from the near-dup component id
    (q_ext_dedup_cluster) instead of the exact digest — identical
    plan."""
    docs = load(spark, sf_dir, "documents")
    c = docs.select("doc_id", F.md5("text").alias("ck"))
    reps = c.groupBy("ck").agg(F.min("doc_id").alias("rep"))
    h1 = F.substring(F.md5(F.col("rep").cast("string")), 1, 1)
    sp = reps.select(
        "ck",
        F.when(h1 < "c", "train").when(h1 < "e", "val").otherwise("test").alias("split"),
    )
    a = c.join(sp, "ck")
    leak = (
        a.groupBy("ck")
        .agg(F.countDistinct("split").alias("ns"))
        .agg(F.coalesce(F.sum(F.when(F.col("ns") > 1, 1).otherwise(0)), F.lit(0)).cast("long").alias("leaky_clusters"))
    )
    per_split = a.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("ck").alias("n_clusters"),
    )
    return per_split.crossJoin(F.broadcast(leak))


@register(
    "q_ext_corpus_mix",
    oracle="""
WITH t AS (
  SELECT source,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tok
  FROM documents
), s AS (
  SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS tokens FROM t GROUP BY source
), tot AS (
  SELECT CAST(SUM(tokens) AS BIGINT) AS total, COUNT(*) AS n_src FROM s
)
SELECT source, n_docs, tokens,
       ROUND(CAST(tokens AS DOUBLE) / total, 9) AS share,
       LEAST(tokens, CAST(FLOOR(CAST(total AS DOUBLE) / n_src) AS BIGINT)) AS budget_tokens
FROM s, tot
""",
)
def q_ext_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixture plan: per-source token counts, corpus share, and
    the downsampling-only token budget that moves the mixture toward
    uniform across sources (over-represented sources capped at the
    equal share, under-represented kept whole).

    The sampling-weight table fed to a weighted dataloader. Per-source
    stats are a bounded aggregate (sources are thousands, not
    billions), the total is a 1-row broadcast — no second pass over
    the corpus. Exact integer token counts; the only doubles are the
    final share/budget expressions, identical bit patterns in both
    engines."""
    docs = load(spark, sf_dir, "documents")
    t = docs.select("source", _ntok().alias("n_tok"))
    s = t.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("tokens")
    )
    tot = s.agg(
        F.sum("tokens").alias("total"), F.count("*").cast("long").alias("n_src")
    )
    return s.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "tokens",
        F.round(F.col("tokens").cast("double") / F.col("total"), 9).alias("share"),
        F.least(
            F.col("tokens"),
            F.floor(F.col("total").cast("double") / F.col("n_src")).cast("long"),
        ).alias("budget_tokens"),
    )


# ---------------------------------------------------------------------------
# Distributed ML primitives over the embeddings table.
# ---------------------------------------------------------------------------

_LR = 0.1  # learning rate; fixed so both engines replay the identical run


@register(
    "q_ext_normal_equations",
    oracle="""
WITH e AS (
  SELECT CAST(embedding AS DOUBLE[]) AS x,
         CASE WHEN label < 5 THEN 1.0 ELSE 0.0 END AS y
  FROM embeddings
), ex AS (
  SELECT y, unnest(x) AS xj, generate_subscripts(x, 1) AS dim FROM e
)
SELECT CAST(dim AS INT) AS dim,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(xj * y, 9) AS DECIMAL(38,9))) AS DOUBLE) AS xty,
       CAST(SUM(CAST(ROUND(xj * xj, 9) AS DECIMAL(38,9))) AS DOUBLE) AS xtx_diag
FROM ex GROUP BY dim
""",
)
def q_ext_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed sufficient statistics for a closed-form linear probe
    over the embedding column: X'y and diag(X'X) per dimension (the
    driver solves the tiny k-by-k system; k=64 here). Label is the
    binary task label<5.

    The map-side-combinable shape that makes linear probes free at
    100 TB: one explode + one 64-key aggregate, partial aggregation
    does all the work before the shuffle. Per-row contributions round
    to 9 decimals and sum as DECIMAL so the result is independent of
    accumulation order — bit-identical across engines and
    partitionings."""
    v = load(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("x"),
        F.when(F.col("label") < 5, 1.0).otherwise(0.0).alias("y"),
    )
    ex = v.select("y", F.posexplode("x").alias("dim0", "xj")).select(
        (F.col("dim0") + 1).cast("int").alias("dim"), "y", "xj"
    )
    dec = "decimal(38,9)"
    return ex.groupBy("dim").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("xj") * F.col("y"), 9).cast(dec)).cast("double").alias("xty"),
        F.sum(F.round(F.col("xj") * F.col("xj"), 9).cast(dec)).cast("double").alias("xtx_diag"),
    )


def _sigmoid_alg(t):
    """Algebraic sigmoid 0.5*(1 + t/(1+|t|)): same monotone S-shape,
    zero transcendental calls — bit-identical in Spark and DuckDB.
    DuckDB twin: 0.5 * (1 + t / (1 + abs(t)))."""
    return F.lit(0.5) * (F.lit(1.0) + t / (F.lit(1.0) + F.abs(t)))


@register(
    "q_ext_logreg_train",
    oracle=f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x,
         CASE WHEN label < 5 THEN 1.0 ELSE 0.0 END AS y
  FROM embeddings
), ex AS (
  SELECT vec_id, y, unnest(x) AS xj, generate_subscripts(x, 1) AS dim FROM e
), n AS (
  SELECT COUNT(*) AS n FROM e
), g1 AS (  -- w0 = 0 so sigma(0) = 0.5 for every row
  SELECT dim,
         CAST(SUM(CAST(ROUND((0.5 - y) * xj, 9) AS DECIMAL(38,9))) AS DOUBLE) AS g
  FROM ex GROUP BY dim
), w1 AS (
  SELECT dim, ROUND(-{_LR} * (g / (SELECT n FROM n)), 12) AS w FROM g1
), p2 AS (
  SELECT ex.vec_id, ex.y,
         CAST(SUM(CAST(ROUND(ex.xj * w1.w, 12) AS DECIMAL(38,12))) AS DOUBLE) AS t
  FROM ex JOIN w1 USING (dim)
  GROUP BY ex.vec_id, ex.y
), s2 AS (
  SELECT vec_id, y, 0.5 * (1 + t / (1 + abs(t))) AS s FROM p2
), g2 AS (
  SELECT ex.dim,
         CAST(SUM(CAST(ROUND((s2.s - s2.y) * ex.xj, 9) AS DECIMAL(38,9))) AS DOUBLE) AS g
  FROM ex JOIN s2 USING (vec_id)
  GROUP BY ex.dim
)
SELECT CAST(w1.dim AS INT) AS dim,
       ROUND(w1.w - {_LR} * (g2.g / (SELECT n FROM n)), 9) AS weight
FROM w1 JOIN g2 USING (dim)
""",
)
def q_ext_logreg_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two full rounds of distributed batch gradient descent for
    logistic regression on the embedding column (binary task label<5),
    driver-side parameter update between passes — the classic
    data-parallel training loop, run entirely in-engine.

    Every pass is one map-side-combinable aggregate over the corpus;
    the 64-float parameter vector collects to the driver and
    broadcasts back as a literal (the parameter-server pattern — the
    ONLY driver traffic is the model, never data). Cross-engine
    exactness: per-row gradient contributions round to 9 decimals and
    sum as DECIMAL (order-independent); the activation is the
    algebraic sigmoid (no libm exp). At 100 TB this loop runs
    unchanged — each iteration is a scan + 64-key aggregate."""
    v = load(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("x"),
        F.when(F.col("label") < 5, 1.0).otherwise(0.0).alias("y"),
    )
    dec9 = "decimal(38,9)"
    dec12 = "decimal(38,12)"

    # Pass 1: w0 = 0 -> sigma = 0.5 row-independent; g1 by dimension.
    # The parameter update rounds IN-ENGINE (F.round) so both engines
    # apply the identical decimal-rounding implementation to w1.
    ex1 = v.select("y", F.posexplode("x").alias("dim0", "xj"))
    g1 = (
        ex1.groupBy("dim0")
        .agg(
            F.sum(F.round((F.lit(0.5) - F.col("y")) * F.col("xj"), 9).cast(dec9))
            .cast("double")
            .alias("g"),
            F.count("*").alias("n"),
        )
        .select(
            "dim0",
            "n",
            F.round(F.lit(-_LR) * (F.col("g") / F.col("n")), 12).alias("w"),
        )
        .collect()
    )
    n = g1[0]["n"]
    w1 = [0.0] * len(g1)
    for r in g1:
        w1[r["dim0"]] = r["w"]

    # Pass 2: per-row t via exact DECIMAL dot with the broadcast w1.
    # The fold re-casts the accumulator each step: decimal addition
    # widens precision, and aggregate() requires a stable acc type.
    w_lit = F.array(*[F.lit(w) for w in w1])
    t = F.aggregate(
        F.zip_with(F.col("x"), w_lit, lambda a, b: F.round(a * b, 12).cast(dec12)),
        F.lit(0).cast(dec12),
        lambda acc, u: (acc + u).cast(dec12),
    ).cast("double")
    s = v.select("x", "y", _sigmoid_alg(t).alias("s"))
    ex2 = s.select("y", "s", F.posexplode("x").alias("dim0", "xj"))
    g2 = ex2.groupBy("dim0").agg(
        F.sum(F.round((F.col("s") - F.col("y")) * F.col("xj"), 9).cast(dec9))
        .cast("double")
        .alias("g")
    )
    w1_df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(w1)], "dim0 int, w double"
    )
    return (
        g2.join(F.broadcast(w1_df), "dim0")
        .select(
            (F.col("dim0") + 1).cast("int").alias("dim"),
            F.round(F.col("w") - F.lit(_LR) * (F.col("g") / F.lit(float(n))), 9).alias("weight"),
        )
    )


@register(
    "q_ext_dedup_normalized",
    oracle="""
WITH t AS (
  SELECT text,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                             ' +', ' ', 'g')) AS norm
  FROM documents
)
SELECT COUNT(*) AS n_docs,
       COUNT(DISTINCT text) AS distinct_raw,
       COUNT(DISTINCT norm) AS distinct_norm,
       COUNT(*) - COUNT(DISTINCT text) AS exact_dupe_docs,
       COUNT(*) - COUNT(DISTINCT norm) AS norm_dupe_docs
FROM t
""",
)
def q_ext_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-aware dedup audit: lowercase, strip non-alnum,
    collapse whitespace, then count how many more documents fold
    together under the normalized key than under raw text.

    Normalize-before-hash is standard corpus-dedup practice (it
    catches trivial casing/punctuation variants exact hashing misses);
    this audit quantifies what the normalization buys before anyone
    commits to it. Both distincts count md5 DIGESTS, not the strings:
    two multi-column distinct aggregates plan an Expand (one replica
    of every row per distinct), so distinct-ing the raw text would
    shuffle the corpus twice at full width — digesting first keeps the
    doubled shuffle at 32 bytes/row (measured 4x at sf10: 30 s -> 7 s).
    The counts are identical (md5 collisions are negligible below
    ~2^64 docs), and the oracle counts the plain strings."""
    docs = load(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    t = docs.select(F.md5("text").alias("raw_d"), F.md5(norm).alias("norm_d"))
    return t.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("raw_d").alias("distinct_raw"),
        F.countDistinct("norm_d").alias("distinct_norm"),
        (F.count("*") - F.countDistinct("raw_d")).alias("exact_dupe_docs"),
        (F.count("*") - F.countDistinct("norm_d")).alias("norm_dupe_docs"),
    )


@register(
    "q_ext_mix_temperature",
    oracle="""
WITH t AS (
  SELECT source,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tok
  FROM documents
), s AS (
  SELECT source, CAST(SUM(n_tok) AS BIGINT) AS tokens FROM t GROUP BY source
), w AS (
  SELECT source, tokens, ROUND(sqrt(CAST(tokens AS DOUBLE)), 9) AS wgt FROM s
), tot AS (
  SELECT CAST(SUM(tokens) AS BIGINT) AS total,
         CAST(SUM(CAST(wgt AS DECIMAL(38,9))) AS DOUBLE) AS wsum
  FROM w
)
SELECT source, tokens,
       ROUND(CAST(tokens AS DOUBLE) / total, 9) AS nat_share,
       ROUND(wgt / wsum, 9) AS temp_share,
       ROUND((wgt / wsum) / (CAST(tokens AS DOUBLE) / total), 9) AS upsample
FROM w, tot
""",
)
def q_ext_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled corpus mixture (T = 0.5): per-source sampling
    share proportional to tokens^T, the standard flattening that keeps
    giant sources from drowning small ones (UniMax / multilingual-LM
    practice). Output: natural share, temperature share, and the
    upsample factor each source's dataloader weight gets.

    T = 0.5 on purpose: tokens^0.5 is ``sqrt`` — a single
    correctly-rounded IEEE op, bit-identical in Spark and DuckDB —
    whereas a general ``pow(x, 0.7)`` is a libm transcendental whose
    last ulp differs across engines. Per-source stats are a bounded
    aggregate; the weight normalizer sums ROUND(sqrt,9) as DECIMAL so
    accumulation order never drifts. One corpus scan at any scale."""
    docs = load(spark, sf_dir, "documents")
    s = (
        docs.select("source", _ntok().alias("n_tok"))
        .groupBy("source")
        .agg(F.sum("n_tok").alias("tokens"))
    )
    w = s.select(
        "source", "tokens", F.round(F.sqrt(F.col("tokens").cast("double")), 9).alias("wgt")
    )
    tot = w.agg(
        F.sum("tokens").alias("total"),
        F.sum(F.col("wgt").cast("decimal(38,9)")).cast("double").alias("wsum"),
    )
    nat = F.col("tokens").cast("double") / F.col("total")
    tshare = F.col("wgt") / F.col("wsum")
    return w.crossJoin(F.broadcast(tot)).select(
        "source",
        "tokens",
        F.round(nat, 9).alias("nat_share"),
        F.round(tshare, 9).alias("temp_share"),
        F.round(tshare / nat, 9).alias("upsample"),
    )


@register(
    "q_ext_shuffle_order",
    oracle="""
WITH t AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 64 AS shard,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':o'), 1, 8)) AS BIGINT) AS ordk
  FROM documents
), p AS (
  SELECT shard, doc_id,
         ROW_NUMBER() OVER (PARTITION BY shard ORDER BY ordk, doc_id) AS pos
  FROM t
)
SELECT shard, COUNT(*) AS n_docs,
       CAST(SUM(pos * (doc_id % 1000003)) AS BIGINT) AS perm_checksum
FROM p GROUP BY shard
""",
)
def q_ext_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized deterministic global shuffle: every doc gets a
    reproducible (shard, position) — shard from one hash of the id,
    intra-shard position by ranking an INDEPENDENT second hash. Output
    folds the permutation into a per-shard checksum
    (sum of pos * (doc_id mod 1000003)) so the oracle verifies the
    EXACT position of every document, not just counts.

    This is the training-order contract: epoch order is a pure function
    of doc_id, so any worker can recompute its slice without a central
    shuffle service. The rank window is PARTITIONED by shard — 64
    parallel sorts, never a global single-task sort; at 100 TB the
    shard count is the knob (pick shards so corpus/shards fits a task,
    e.g. 8192), and the same expression still assigns shards without
    re-reading state. Integer checksum arithmetic is order-independent
    and exact in both engines."""
    docs = load(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    ordk = F.conv(
        F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":o"))), 1, 8),
        16,
        10,
    ).cast("long")
    t = docs.select(
        "doc_id", _md5_bucket(F.col("doc_id"), 64), ordk.alias("ordk")
    )
    w = Window.partitionBy("shard").orderBy("ordk", "doc_id")
    p = t.select("shard", "doc_id", F.row_number().over(w).alias("pos"))
    return p.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("pos") * (F.col("doc_id") % 1000003)).alias("perm_checksum"),
    )


@register(
    "q_ext_curriculum_order",
    oracle="""
WITH f AS (
  SELECT source,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tok,
         CAST(len(list_filter(string_split(text, ' '),
                              x -> x IN ('a', 'the'))) AS BIGINT) AS n_stop
  FROM documents
), sc AS (
  SELECT source, n_tok,
         LEAST(1.0, n_tok / 256.0) * 0.5
           + LEAST(1.0, 5.0 * (n_stop / CAST(GREATEST(n_tok, 1) AS DOUBLE))) * 0.3
           + CASE WHEN n_tok >= 16 THEN 0.2 ELSE 0.0 END AS score
  FROM f
), s AS (
  SELECT source,
         CAST(SUM(n_tok) AS BIGINT) AS tokens,
         ROUND(CAST(SUM(CAST(ROUND(score, 9) AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*), 9) AS avg_score
  FROM sc GROUP BY source
), tot AS (
  SELECT CAST(FLOOR(CAST(SUM(tokens) AS DOUBLE) / 2) AS BIGINT) AS budget FROM s
), c AS (
  SELECT source, tokens, avg_score,
         CAST(SUM(tokens) OVER (ORDER BY avg_score DESC, source
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
  FROM s
)
SELECT source, tokens, avg_score, cum_tokens,
       CASE WHEN cum_tokens <= (SELECT budget FROM tot) THEN 1 ELSE 0 END AS in_budget
FROM c
""",
)
def q_ext_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-first curriculum plan: sources rank by mean ensemble
    quality score (same fixed-weight score as q_ext_quality_ensemble),
    tokens accumulate down the ranking, and sources inside the first
    half of the token budget are flagged — the "train on the best half
    first" curriculum cut, decided from one corpus scan.

    The running-total window is over the PER-SOURCE aggregate (tens to
    thousands of rows at any corpus size), so the unpartitioned window
    is bounded post-aggregate state, not a base-table sort — the same
    justification as the per-day rollup windows. Mean scores sum
    DECIMAL-rounded contributions, the ranking orders by the ROUNDED
    mean with the source name as tiebreak, and the cumsum is integer —
    every engine replays the identical order and totals."""
    docs = load(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    words = _words()
    f = docs.select(
        "source",
        F.size(words).cast("long").alias("n_tok"),
        F.size(F.filter(words, lambda x: x.isin("a", "the"))).cast("long").alias("n_stop"),
    )
    score = (
        F.least(F.lit(1.0), F.col("n_tok") / F.lit(256.0)) * F.lit(0.5)
        + F.least(
            F.lit(1.0),
            F.lit(5.0) * (F.col("n_stop") / F.greatest(F.col("n_tok"), F.lit(1)).cast("double")),
        )
        * F.lit(0.3)
        + F.when(F.col("n_tok") >= 16, 0.2).otherwise(0.0)
    )
    s = (
        f.select("source", "n_tok", score.alias("score"))
        .groupBy("source")
        .agg(
            F.sum("n_tok").alias("tokens"),
            F.round(
                F.sum(F.round(F.col("score"), 9).cast("decimal(38,9)")).cast("double")
                / F.count("*"),
                9,
            ).alias("avg_score"),
        )
    )
    tot = s.agg(
        F.floor(F.sum("tokens").cast("double") / 2).cast("long").alias("budget")
    )
    w = (
        Window.orderBy(F.col("avg_score").desc(), F.col("source"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = s.select(
        "source", "tokens", "avg_score", F.sum("tokens").over(w).alias("cum_tokens")
    )
    return c.crossJoin(F.broadcast(tot)).select(
        "source",
        "tokens",
        "avg_score",
        "cum_tokens",
        F.when(F.col("cum_tokens") <= F.col("budget"), 1).otherwise(0).alias("in_budget"),
    )


@register(
    "q_ext_quality_ensemble",
    oracle="""
WITH f AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tok,
         CAST(len(list_filter(string_split(text, ' '),
                              x -> x IN ('a', 'the'))) AS BIGINT) AS n_stop
  FROM documents
), s AS (
  SELECT doc_id,
         LEAST(1.0, n_tok / 256.0) * 0.5
           + LEAST(1.0, 5.0 * (n_stop / CAST(GREATEST(n_tok, 1) AS DOUBLE))) * 0.3
           + CASE WHEN n_tok >= 16 THEN 0.2 ELSE 0.0 END AS score
  FROM f
)
SELECT LEAST(CAST(FLOOR(score * 10) AS BIGINT), 9) AS band,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS retained,
       CAST(SUM(CAST(ROUND(score, 9) AS DECIMAL(38,9))) AS DOUBLE) AS score_sum
FROM s GROUP BY band
""",
)
def q_ext_quality_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-weight quality ensemble: length credit (saturating at 256
    tokens), stopword-density credit, and a minimum-length gate combine
    into one score; output is the score-band histogram with the
    retention count at the 0.5 production threshold.

    How fasttext-style quality filters get threshold-calibrated in
    practice: score the corpus once, read the band histogram, pick the
    cut. All features are integer counts; the score is a fixed-order
    double expression (identical bits both engines) and the band sums
    are DECIMAL-rounded — no aggregation-order drift. One projection,
    one 10-key aggregate at any scale."""
    docs = load(spark, sf_dir, "documents")
    words = _words()
    f = docs.select(
        "doc_id",
        F.size(words).cast("long").alias("n_tok"),
        F.size(F.filter(words, lambda w: w.isin("a", "the"))).cast("long").alias("n_stop"),
    )
    score = (
        F.least(F.lit(1.0), F.col("n_tok") / F.lit(256.0)) * F.lit(0.5)
        + F.least(
            F.lit(1.0),
            F.lit(5.0) * (F.col("n_stop") / F.greatest(F.col("n_tok"), F.lit(1)).cast("double")),
        )
        * F.lit(0.3)
        + F.when(F.col("n_tok") >= 16, 0.2).otherwise(0.0)
    )
    s = f.select("doc_id", score.alias("score"))
    return s.groupBy(
        F.least(F.floor(F.col("score") * 10).cast("long"), F.lit(9).cast("long")).alias("band")
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("score") >= 0.5, 1).otherwise(0)).alias("retained"),
        F.sum(F.round(F.col("score"), 9).cast("decimal(38,9)")).cast("double").alias("score_sum"),
    )
