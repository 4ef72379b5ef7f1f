"""LLM-data-pipeline queries (SURVEY.md §2C ext rows).

Thin registry wrappers over octopufs_spark.llm operators, each with a
full DuckDB value oracle (deterministic twins cover the
algorithm-specific MinHash-LSH / SimHash / ANN outputs; VERIFICATION.md
records 0 weak entries).
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from octopufs_spark.llm import dedup, multimodal, similarity, text
from octopufs_spark.registry import register
from octopufs_spark.tables import load

# q_ext_simhash_pairs: the ONE enumeration of Manku-style complete
# banding blocks — 3-of-6 byte blocks of the 48-bit signature. The
# DuckDB oracle's band SQL and the Spark band structs are BOTH
# generated from this list; a drift between them would silently break
# candidate-set equality (widening to 4-of-7 at the next corpus
# decade edits exactly this line).
_SIMHASH_BLOCK_COMBOS: tuple = tuple(combinations(range(6), 3))


@register(
    "q_ext_dedup_exact",
    oracle="""
SELECT md5(text) AS h, MIN(doc_id) AS doc_id, COUNT(*) AS dup_cnt
FROM documents GROUP BY md5(text)
""",
)
def q_ext_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on md5(text): surviving min doc_id per digest."""
    return dedup.exact_dedup_groups(load(spark, sf_dir, "documents"))


@register(
    "q_ext_text_stats",
    oracle="""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
       CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*) AS avg_tokens
FROM documents GROUP BY lang
""",
)
def q_ext_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language doc counts and average char/token lengths."""
    d = load(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " ")).cast("long")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
        (F.sum(n_tokens).cast("double") / F.count("*")).alias("avg_tokens"),
    )


@register(
    "q_ext_sim_knn",
    oracle="""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings WHERE vec_id < 50
), p AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         ROUND(list_dot_product(a.emb, b.emb) /
               (SQRT(list_dot_product(a.emb, a.emb)) * SQRT(list_dot_product(b.emb, b.emb))), 6) AS cos_sim
  FROM v a JOIN v b ON a.vec_id <> b.vec_id
)
SELECT vec_a, vec_b, cos_sim, rn FROM (
  SELECT p.*, ROW_NUMBER() OVER (PARTITION BY vec_a ORDER BY cos_sim DESC, vec_b) AS rn FROM p
) WHERE rn <= 5
""",
)
def q_ext_sim_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for vec_id<50, broadcast-block
    shaped: the bounded query block is broadcast and the corpus streams
    through one matmul per Arrow batch — no pair-product join in the
    plan (the all-pairs self-join ``cosine_topk_exact`` is now the
    pytest-only verifier)."""
    vecs = load(spark, sf_dir, "embeddings").where(F.col("vec_id") < 50)
    return similarity.cosine_topk_broadcast(vecs, k=5)


@register(
    "q_ext_neardup_cosine",
    oracle="""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings WHERE vec_id < 200
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND(list_dot_product(a.emb, b.emb) /
             (SQRT(list_dot_product(a.emb, a.emb)) * SQRT(list_dot_product(b.emb, b.emb))), 6) AS cos_sim
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE ROUND(list_dot_product(a.emb, b.emb) /
            (SQRT(list_dot_product(a.emb, a.emb)) * SQRT(list_dot_product(b.emb, b.emb))), 6) >= 0.35
""",
)
def q_ext_neardup_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (threshold 0.35 — the
    synthetic embeddings have no true near-dups, so the threshold sits
    in the upper tail of the actual similarity distribution).
    Broadcast-block shaped: exact values, but no all-pairs join in the
    plan (see ``cosine_near_dup_pairs_broadcast``)."""
    vecs = load(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    return similarity.cosine_near_dup_pairs_broadcast(vecs, threshold=0.35)


# Planted-clone contracts (round-4): the seeded production ANN/dedup
# variants were declared-weak (oracle=None) because their raw outputs
# are seed-specific. Each now runs the SAME seeded production path but
# reports a seed-INDEPENDENT invariant any correct LSH/IVF/MinHash
# implementation guarantees by construction: an exact clone of a vector
# or document hashes into the same bucket under every plane/permutation
# choice, so planted clones MUST be retrieved (top-1 / candidate pair /
# same cluster). The oracle recomputes the planted count from the base
# table and expects a perfect score — a seed regression, banding bug, or
# normalization drift that breaks the retrieval guarantee flips the
# hard signal, while the benched plan stays the production scale path.
_CLONE_OFFSET = 10_000_000


def _planted_vecs(spark: SparkSession, sf_dir: str, n: int, limit: int | None = None):
    """(base ∪ clones, n_planted 1-row DF): clones duplicate the
    embeddings of vec_id < n under vec_id + _CLONE_OFFSET."""
    vecs = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    if limit is not None:
        vecs = vecs.where(F.col("vec_id") < limit)
    src = vecs.where(F.col("vec_id") < n)
    clones = src.select(
        (F.col("vec_id") + _CLONE_OFFSET).alias("vec_id"), "embedding"
    )
    planted = src.agg(F.count("*").alias("n_planted"))
    return vecs.unionByName(clones), planted


@register(
    "q_ext_ann_lsh",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_planted,
       CAST(COUNT(*) AS BIGINT) AS n_top1_hits
FROM embeddings WHERE vec_id < 20
""",
)
def q_ext_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate cosine top-5 — the 100 TB ANN path
    (seeded Gaussian hyperplanes, production variant; the hash-verified
    value-level twin is q_ext_ann_lsh_det). Verified by a PLANTED-CLONE
    contract: 20 exact-duplicate vectors are appended under offset ids;
    identical embeddings project to identical sign buckets under ANY
    plane seed, so each clone's top-1 neighbor must be its source with
    cos_sim ~ 1.0. Output (n_planted, n_top1_hits) — the oracle expects
    them equal; any regression in bucketing/scoring/ranking breaks the
    equality and flags red. n_planes=None sizes the plane count to the
    corpus (planes ≈ log2(N/32)) so expected bucket occupancy — and the
    within-bucket pair join — stays bounded as the corpus grows; the
    contract is plane-count-independent because identical vectors hash
    identically under any plane set."""
    vecs_u, planted = _planted_vecs(spark, sf_dir, n=20)
    ann = similarity.cosine_topk_ann(vecs_u, dim=64, k=5, n_planes=None, seed=42)
    hits = ann.where(
        (F.col("vec_a") >= _CLONE_OFFSET)
        & (F.col("rn") == 1)
        & (F.col("vec_b") == F.col("vec_a") - _CLONE_OFFSET)
    ).agg(F.count("*").alias("n_top1_hits"))
    return planted.crossJoin(hits).select("n_planted", "n_top1_hits")


@register(
    "q_ext_dedup_minhash",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_planted,
       CAST(COUNT(*) AS BIGINT) AS n_clone_pairs
FROM documents WHERE doc_id < 30
""",
)
def q_ext_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-duplicate candidates via ``pyspark.ml``
    MinHashLSH — the API-PARITY path (split out of the combined recall
    entry in round 4; the exact ground-truth sweep lives in
    q_ext_dedup_minhash_recall, the value-level hash-verified variant
    in q_ext_dedup_minhash_det). For the 100 TB route use
    q_ext_dedup_minhash_banded: the sf10 probe measured this ML path
    at ~90 s / 500k docs (HashingTF feature detour + r=1 hash tables:
    any single shared min-hash is a candidate) vs ~11 s for the
    banded pure-DataFrame path with corpus-adaptive r. Verified by a
    PLANTED-CLONE contract: the texts of doc_id < 30 are re-ingested
    under offset ids; an identical token stream produces identical
    shingles, hence identical MinHash signatures in every hash table
    under any seed, so each (source, clone) pair MUST surface as a
    candidate at Jaccard distance 0. Output
    (n_planted, n_clone_pairs); the oracle expects equality."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    clones = docs.where(F.col("doc_id") < 30).select(
        (F.col("doc_id") + _CLONE_OFFSET).alias("doc_id"), "text"
    )
    lsh = dedup.minhash_near_dup_pairs(docs.unionByName(clones), threshold=0.81)
    found = lsh.where(
        (F.col("doc_a") < 30) & (F.col("doc_b") == F.col("doc_a") + _CLONE_OFFSET)
    ).agg(F.count("*").alias("n_clone_pairs"))
    planted = docs.where(F.col("doc_id") < 30).agg(F.count("*").alias("n_planted"))
    return planted.crossJoin(found).select("n_planted", "n_clone_pairs")


@register(
    "q_ext_dedup_minhash_recall",
    oracle="""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), g AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(toks) >= 5
           THEN list_transform(generate_series(1, len(toks) - 4), i -> array_to_string(toks[i:i+4], ' '))
           ELSE [] END) AS ngrams
  FROM d
), e AS (
  SELECT doc_id, unnest(ngrams) AS ng FROM g
), s AS (
  SELECT doc_id, len(ngrams) AS n_ng FROM g
), i AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM e a JOIN e b ON a.ng = b.ng AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), x AS (
  SELECT doc_a, doc_b
  FROM i JOIN s sa ON i.doc_a = sa.doc_id JOIN s sb ON i.doc_b = sb.doc_id
  WHERE CAST(inter AS DOUBLE) / (sa.n_ng + sb.n_ng - inter) >= 0.2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_pairs, TRUE AS recall_ok FROM x
""",
)
def q_ext_dedup_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH RECALL CONTRACT (split from q_ext_dedup_minhash in
    round 4; same pattern as the approx-distinct tolerance oracle):
    the LSH pair set itself is seed-specific, but the ground truth —
    exact 5-gram Jaccard ≥ 0.2 pairs — is SQL-computable, so the
    registered output is (n_exact_pairs, recall_ok) where recall_ok
    asserts the LSH found ≥ 90% of the exact set. The oracle
    recomputes n_exact_pairs and expects recall_ok = TRUE; a
    seed/banding regression that drops recall flips the hard signal.

    The LSH under test is the pure-DataFrame banded path in its r=1
    hash-tables mode (b=24 one-row bands: any shared min-hash is a
    candidate — the same matching rule as pyspark.ml MinHashLSH's
    numHashTables, detection 1-(1-s)^24 ≈ 0.995 at the s=0.2
    boundary and higher above it). It replaced the pyspark.ml
    implementation in round 10: the r10 sf10 probe measured the ML
    path's HashingTF-featurization + vector-UDT join at 189-266 s /
    500k docs where the banded path's signature fold stays in the
    tens of seconds, and its checkpointed featurization dominated a
    whole-session heap budget. The ML path itself stays pytest-covered
    (tests/test_llm.py) as API parity, per the round-6 retirement
    plan."""
    docs = load(spark, sf_dir, "documents")
    # ONE shared shingle pass (r10, guide §7.2): the LSH side and the
    # exact ground-truth side previously each ran their own
    # tokenize→5-gram→hash pipeline with its own checkpoint — the
    # most expensive stage of the operator, paid twice. Both operators
    # now read the same materialized hashed-shingle sets; the exact
    # side's semantics are unchanged (hashed_ngram_sets == its old
    # in-house sets), the LSH side bands the very sets it is scored
    # against (recall can only be cleaner), and the signature/banding
    # parameters are untouched.
    g = dedup.hashed_ngram_sets(docs, n=5).localCheckpoint()
    lsh = (
        dedup.minhash_near_dup_pairs_df(
            docs, threshold=0.2, num_perm=24, bands=24, sets=g
        )
        .select("doc_a", "doc_b")
        .withColumn("_m", F.lit(1))
    )
    exact = dedup.ngram_jaccard_pairs(
        docs, n=5, threshold=0.2, max_doc_freq=1 << 30, sets=g
    ).select("doc_a", "doc_b")
    stats = exact.join(lsh, ["doc_a", "doc_b"], "left").agg(
        F.count("*").alias("n_exact_pairs"),
        F.sum(F.coalesce(F.col("_m"), F.lit(0))).alias("n_found"),
    )
    return stats.select(
        F.col("n_exact_pairs").cast("long").alias("n_exact_pairs"),
        F.coalesce(
            F.col("n_found") / F.col("n_exact_pairs") >= 0.9, F.lit(True)
        ).alias("recall_ok"),
    )


@register(
    "q_ext_dedup_minhash_banded",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_planted,
       CAST(COUNT(*) AS BIGINT) AS n_clone_pairs
FROM documents WHERE doc_id < 30
""",
)
def q_ext_dedup_minhash_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-DataFrame MinHash near-dup with corpus-ADAPTIVE banding —
    the 100 TB-hardened variant of q_ext_dedup_minhash: no pyspark.ml
    pipeline (shingles hashed directly by xxhash64, no HashingTF
    collision layer, no vector UDTs in the shuffle), signature built
    in ONE aggregate fold, and rows-per-band r climbing an integer
    ladder with corpus count (llm/dedup.py::adaptive_minhash_params)
    so background-pair candidate volume stays ~linear while band count
    re-tunes to hold ≥0.95 recall at the threshold. Verified by the
    same PLANTED-CLONE contract as the ml path: identical texts give
    identical shingle sets, hence identical signatures, which collide
    in EVERY band at any ladder step, and exact-Jaccard verification
    scores the clone pair at 1.0 ≥ any threshold — so
    (n_planted, n_clone_pairs) equality is banding-independent.
    Threshold 0.5 is the production near-dup operating point: the
    signature cost num_perm = b·r scales as ~1/s^r (0.2 would need
    148 permutations where 0.5 needs 22 for the same ≥0.95 recall),
    so the threshold choice IS the signature budget."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    clones = docs.where(F.col("doc_id") < 30).select(
        (F.col("doc_id") + _CLONE_OFFSET).alias("doc_id"), "text"
    )
    pairs = dedup.minhash_near_dup_pairs_df(
        docs.unionByName(clones), threshold=0.5, num_perm=None, bands=None
    )
    found = pairs.where(
        (F.col("doc_a") < 30) & (F.col("doc_b") == F.col("doc_a") + _CLONE_OFFSET)
    ).agg(F.count("*").alias("n_clone_pairs"))
    planted = docs.where(F.col("doc_id") < 30).agg(F.count("*").alias("n_planted"))
    return planted.crossJoin(found).select("n_planted", "n_clone_pairs")


@register(
    "q_ext_dedup_cluster",
    oracle="""
WITH RECURSIVE pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM (SELECT doc_id, md5(substr(text, 1, 15)) AS h FROM documents WHERE doc_id < 500) a
  JOIN (SELECT doc_id, md5(substr(text, 1, 15)) AS h FROM documents WHERE doc_id < 500) b
    ON a.h = b.h AND a.doc_id < b.doc_id
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
), walk AS (
  SELECT src AS id, src AS reach FROM edges
  UNION SELECT w.id, e.dst FROM walk w JOIN edges e ON w.reach = e.src
)
SELECT id AS doc_id, MIN(reach) AS cluster_id FROM (
  SELECT id, reach FROM walk UNION SELECT src, src FROM edges
) GROUP BY id
""",
)
def q_ext_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: prefix-collision candidate pairs →
    connected components (min-reachable-id labels). Oracle: recursive
    CTE transitive closure — both sides compute the same component ids.
    """
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    keyed = d.select("doc_id", F.md5(F.substring("text", 1, 15)).alias("h"))
    a, b = keyed.alias("a"), keyed.alias("b")
    pairs = a.join(
        b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    return dedup.connected_components(pairs)


@register(
    "q_ext_simhash",
    oracle="""
SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_docs,
       CAST((SELECT COUNT(*) FROM documents WHERE doc_id < 50) AS BIGINT) AS n_planted,
       CAST((SELECT COUNT(*) FROM documents WHERE doc_id < 50) AS BIGINT) AS n_clone_matches,
       TRUE AS discriminates
""",
)
def q_ext_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash + 16-bit bands (xxhash64 JVM fold — the
    production candidate-key path; the md5-based SQL-replayable twin is
    q_ext_simhash_det). Verified by a PLANTED-CLONE contract: the texts
    of doc_id < 50 are re-hashed under offset ids; SimHash is a pure
    function of the token stream, so every clone must reproduce its
    source's full 64-bit signature (which implies all 4 band keys
    match). `discriminates` guards the degenerate failure the clone
    check alone can't see (a constant hash would still match clones):
    the corpus must produce at least 2 distinct signatures. The oracle
    recomputes the counts from the documents table and expects a
    perfect score. The raw per-doc band surface stays pytest-covered
    and SQL-replayable via q_ext_simhash_det / q_ext_simhash_pairs."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    clones = docs.where(F.col("doc_id") < 50).select(
        (F.col("doc_id") + _CLONE_OFFSET).alias("doc_id"), "text"
    )
    # Single-pass report (r10, guide §7.2 duplicated subtrees): the
    # old shape read the signature table from THREE legs (src side of
    # the match join, clone side, corpus stats) glued with a join and
    # a crossJoin — Spark does not CSE across joins, so the tokenize +
    # 64-bit vote fold (the expensive part at any scale) ran 3x.
    # Instead: fold clone ids back onto their source id, ONE groupBy
    # pairing each source with its clone (doc ids are unique — the
    # same premise the old equi-join and the clone-offset scheme rest
    # on), then one scalar aggregate. Signatures are computed once and
    # no join remains.
    sigs = dedup.simhash_bands(docs.unionByName(clones))
    tagged = sigs.select(
        F.when(
            F.col("doc_id") >= _CLONE_OFFSET, F.col("doc_id") - _CLONE_OFFSET
        )
        .otherwise(F.col("doc_id"))
        .alias("orig"),
        (F.col("doc_id") >= _CLONE_OFFSET).alias("is_clone"),
        "simhash",
    )
    per_doc = tagged.groupBy("orig").agg(
        F.count(F.when(~F.col("is_clone"), 1)).alias("n_src"),
        F.count(F.when(F.col("is_clone"), 1)).alias("n_cln"),
        F.max(F.when(~F.col("is_clone"), F.col("simhash"))).alias("sig_src"),
        F.max(F.when(F.col("is_clone"), F.col("simhash"))).alias("sig_clone"),
    )
    return per_doc.agg(
        F.sum("n_src").cast("long").alias("n_docs"),
        # == count(*) of the old src-x-clone equi-join (clone groups
        # carry n_src=1), including its multiplicity under duplicate
        # ids; sig equality below is null-unsafe exactly like the old
        # `sig_src == sig_clone` predicate.
        F.sum(F.col("n_src") * F.col("n_cln")).cast("long").alias("n_planted"),
        F.count(F.when(F.col("sig_src") == F.col("sig_clone"), 1)).alias(
            "n_clone_matches"
        ),
        (F.countDistinct("sig_src") >= 2).alias("discriminates"),
    ).select("n_docs", "n_planted", "n_clone_matches", "discriminates")


@register(
    "q_ext_ngram_jaccard",
    oracle="""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id < 100
), g AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(toks) >= 3
           THEN list_transform(generate_series(1, len(toks) - 2), i -> array_to_string(toks[i:i+2], ' '))
           ELSE [] END) AS ngrams
  FROM d
), e AS (
  SELECT doc_id, unnest(ngrams) AS ng FROM g
), s AS (
  SELECT doc_id, len(ngrams) AS n_ng FROM g
), i AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM e a JOIN e b ON a.ng = b.ng AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, CAST(inter AS DOUBLE) / (sa.n_ng + sb.n_ng - inter) AS jaccard
FROM i JOIN s sa ON i.doc_a = sa.doc_id JOIN s sb ON i.doc_b = sb.doc_id
WHERE CAST(inter AS DOUBLE) / (sa.n_ng + sb.n_ng - inter) >= 0.2
""",
)
def q_ext_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard pairs (inverted-index join) for doc_id<100."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    return dedup.ngram_jaccard_pairs(d, n=3, threshold=0.2)


@register(
    "q_ext_lang_id",
    oracle="""
SELECT doc_id, lang,
       CAST(len(list_filter(string_split(text, ' '),
                            t -> t IN ('the','a','of','and','to','in'))) AS DOUBLE)
         / len(string_split(text, ' ')) AS en_ratio,
       CASE WHEN CAST(len(list_filter(string_split(text, ' '),
                            t -> t IN ('the','a','of','and','to','in'))) AS DOUBLE)
                 / len(string_split(text, ' ')) > 0.05
            THEN 'en' ELSE 'other' END AS lang_pred
FROM documents
""",
)
def q_ext_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language-ID heuristic."""
    d = text.lang_id(load(spark, sf_dir, "documents"))
    return d.select("doc_id", "lang", "en_ratio", "lang_pred")


@register(
    "q_ext_quality",
    oracle=r"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       LEAST(CAST(n_chars AS DOUBLE) / 400, 1.0) AS len_score,
       CAST(length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS DOUBLE)
         / length(text) AS punct_ratio,
       CAST(len(list_filter(string_split(text, ' '),
                            t -> t IN ('the','a','of','and','to','in'))) AS DOUBLE)
         / len(string_split(text, ' ')) AS stop_ratio,
       0.4 * LEAST(CAST(n_chars AS DOUBLE) / 400, 1.0)
         + 0.4 * LEAST(CAST(len(string_split(text, ' ')) AS DOUBLE) / 80, 1.0)
         + 0.1 * (1.0 - CAST(length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS DOUBLE)
                        / length(text))
         + 0.1 * LEAST((CAST(len(list_filter(string_split(text, ' '),
                                 t -> t IN ('the','a','of','and','to','in'))) AS DOUBLE)
                        / len(string_split(text, ' '))) / 0.05, 1.0) AS quality
FROM documents
""",
)
def q_ext_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gates per document: length, token, punctuation-density
    and stopword-ratio signals combined into one deterministic score."""
    d = text.quality_score(load(spark, sf_dir, "documents"))
    return d.select("doc_id", "n_tokens", "len_score", "punct_ratio", "stop_ratio", "quality")


@register(
    "q_ext_token_count",
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_unique_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         / len(string_split(text, ' ')) AS ttr
FROM documents
""",
)
def q_ext_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counts + type-token ratio per document."""
    d = text.token_stats(load(spark, sf_dir, "documents"))
    return d.select("doc_id", "n_tokens", "n_unique_tokens", "ttr")


@register(
    "q_ext_fingerprint",
    oracle="""
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
FROM documents
""",
)
def q_ext_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive document fingerprint (md5 of sorted token set)."""
    d = text.fingerprint(load(spark, sf_dir, "documents"))
    return d.select("doc_id", "fp")


@register(
    "q_ext_grouped_pandas",
    oracle="""
SELECT doc_id, lang,
       ROUND((n_chars - AVG(n_chars) OVER (PARTITION BY lang))
             / STDDEV_SAMP(n_chars) OVER (PARTITION BY lang), 4) AS z_chars
FROM documents
""",
)
def q_ext_grouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language z-score of n_chars via applyInPandas (grouped-map UDF)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["n_chars"].astype("float64")
        z = (x - x.mean()) / x.std(ddof=1)
        return pd.DataFrame(
            {"doc_id": pdf["doc_id"], "lang": pdf["lang"], "z_chars": z.round(4)}
        )

    return d.groupBy("lang").applyInPandas(zscore, schema="doc_id long, lang string, z_chars double")


@register(
    "q_udf_scalar",
    oracle="""
SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g') AS clean
FROM documents
""",
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Pandas UDF: vectorized text normalization."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", text.clean_text_udf()(F.col("text")).alias("clean"))


@register(
    "q_udtf_explode",
    oracle="""
SELECT token, COUNT(*) AS cnt FROM (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
) GROUP BY token
""",
)
def q_udtf_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-generating tokenize: explode(split) → corpus token counts."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "q_ext_multimodal_decode",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       'text/plain' AS media_type,
       CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT) AS width,
       CAST(octet_length(encode(text)) % 480 + 1 AS BIGINT) AS height,
       md5(text) AS checksum
FROM documents
""",
)
def q_ext_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column → metadata via mapInPandas (deterministic fake
    decode; real codec stubbed — see llm/multimodal.py)."""
    media = multimodal.documents_as_media(load(spark, sf_dir, "documents"))
    return multimodal.decode_media(media, fake=True)


_BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


@register(
    "q_ext_token_bpe",
    oracle=r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_tokens,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS DOUBLE)
         / len(string_split(text, ' ')) AS bpe_per_word
FROM documents
""",
)
def q_ext_token_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: a GPT-style pre-tokenizer regex (letter
    runs / digit runs / single punctuation) alongside whitespace tokens
    — the cost estimator every training-data pipeline runs over its
    corpus. Pure JVM regexp, no UDF."""
    d = load(spark, sf_dir, "documents")
    # Spark SQL string literals process C-style escapes, so \s must be
    # doubled there; DuckDB string literals keep the backslash as-is.
    spark_pattern = _BPE_PATTERN.replace("\\", "\\\\")
    bpe = F.expr(f"regexp_extract_all(text, '{spark_pattern}', 0)")
    ws = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(bpe).cast("long").alias("n_bpe_tokens"),
        F.size(ws).cast("long").alias("n_ws_tokens"),
        (F.size(bpe).cast("double") / F.size(ws)).alias("bpe_per_word"),
    )


@register(
    "q_ext_fingerprint_winnow",
    oracle="""
WITH g AS (
  SELECT doc_id,
         list_transform(generate_series(1, length(substr(text, 1, 200)) - 4),
                        i -> ('0x' || substr(md5(substr(substr(text, 1, 200), i, 5)), 1, 8))::BIGINT) AS h
  FROM documents WHERE doc_id < 200
), w AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, len(h) - 3),
                                      j -> list_min(h[j:j+3]))) AS fps
  FROM g WHERE len(h) >= 4
)
SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fp, list_min(fps) AS fp_min, list_max(fps) AS fp_max
FROM w
""",
)
def q_ext_fingerprint_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprint (rolling hash): char-5-gram
    hashes, window-of-4 minima, distinct — the plagiarism/near-dup
    fingerprint selection of Schleimer et al.'s winnowing, entirely in
    JVM higher-order functions. Hash = md5-prefix int, identical on
    both engines."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    expr = """
      transform(sequence(1, length(substr(text, 1, 200)) - 4),
                i -> cast(conv(substring(md5(substring(substr(text, 1, 200), i, 5)), 1, 8), 16, 10) as bigint))
    """
    g = d.select("doc_id", F.expr(expr).alias("h")).where(F.size("h") >= 4)
    fps = F.array_distinct(
        F.expr("transform(sequence(1, size(h) - 3), j -> array_min(slice(h, j, 4)))")
    )
    return g.select(
        "doc_id",
        F.size(fps).cast("long").alias("n_fp"),
        F.array_min(fps).alias("fp_min"),
        F.array_max(fps).alias("fp_max"),
    )


@register(
    "q_ext_ann_ivf",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_planted,
       CAST(COUNT(*) AS BIGINT) AS n_top1_hits
FROM embeddings WHERE vec_id < 20
""",
)
def q_ext_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate cosine top-5: k-means cells + n_probe=2 — the
    data-adaptive alternative to the random-hyperplane LSH path (seeded
    sample-fit centroids, production variant; the hash-verified twin is
    q_ext_ann_ivf_det). Verified by a PLANTED-CLONE contract: identical
    embeddings assign to the same home cell under ANY trained centroid
    set, so each planted clone's top-1 neighbor must be its source
    (cos_sim ~ 1.0, found in the clone's own home cell). Output
    (n_planted, n_top1_hits); the oracle expects equality — a
    probe/assignment/scoring regression flags red while the benched
    plan stays the production shuffle-to-cell shape. n_clusters=None
    applies the canonical IVF sizing nlist ≈ √N (per-query scan work
    ~n_probe·√N rows, O(N^1.5) total) instead of a frozen cell count
    whose cells grow linearly dense; the contract is nlist-independent
    because identical embeddings share a home cell under any trained
    centroid set."""
    vecs_u, planted = _planted_vecs(spark, sf_dir, n=20)
    ann = similarity.cosine_topk_ivf(
        vecs_u, k=5, n_clusters=None, n_probe=2, seed=42
    )
    hits = ann.where(
        (F.col("vec_a") >= _CLONE_OFFSET)
        & (F.col("rn") == 1)
        & (F.col("vec_b") == F.col("vec_a") - _CLONE_OFFSET)
    ).agg(F.count("*").alias("n_top1_hits"))
    return planted.crossJoin(hits).select("n_planted", "n_top1_hits")


@register(
    "q_udtf_python",
    oracle="""
SELECT doc_id, u.part AS part, u.idx AS idx FROM (
  SELECT doc_id, unnest(list_transform(string_split(text, '. '), (p, i) -> {'part': p, 'idx': i - 1})) AS u
  FROM documents WHERE doc_id < 100
) WHERE u.part <> ''
""",
)
def q_udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark @udtf): sentence-ish splitter emitting
    (part, idx) rows per document via LATERAL — the arbitrary-arity
    table function surface beyond explode()."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="part string, idx int")
    class SplitParts:
        def eval(self, text: str):
            for i, p in enumerate(text.split(". ")):
                if p:
                    yield p, i

    spark.udtf.register("octopufs_split_parts", SplitParts)
    load(spark, sf_dir, "documents").where(F.col("doc_id") < 100).createOrReplaceTempView(
        "_docs_udtf"
    )
    return spark.sql(
        "SELECT doc_id, part, CAST(idx AS INT) AS idx "
        "FROM _docs_udtf, LATERAL octopufs_split_parts(text)"
    )


@register(
    "q_ext_chunk",
    oracle="""
SELECT doc_id, CAST(u.chunk_id AS BIGINT) AS chunk_id,
       u.chunk_text AS chunk_text,
       CAST(u.n AS BIGINT) AS n_chunk_tokens
FROM (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(string_split(text, ' ')) - 8, 1), 24),
           s -> {'chunk_id': (s - 1) // 24,
                 'chunk_text': array_to_string(string_split(text, ' ')[s:s+31], ' '),
                 'n': len(string_split(text, ' ')[s:s+31])}
         )) AS u
  FROM documents WHERE doc_id < 200
)
""",
)
def q_ext_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window chunking: 32-token chunks, 8-token overlap
    (stride 24) — one row per chunk, JVM-side explode."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    return text.chunk_tokens(d, chunk_size=32, overlap=8)


@register(
    "q_ext_dedup_semantic",
    oracle="""
WITH RECURSIVE v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings WHERE vec_id < 200
), pairs AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
  FROM v a JOIN v b ON a.vec_id < b.vec_id
  WHERE ROUND(list_dot_product(a.emb, b.emb) /
              (SQRT(list_dot_product(a.emb, a.emb)) * SQRT(list_dot_product(b.emb, b.emb))), 6) >= 0.3
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
), walk AS (
  SELECT src AS id, src AS reach FROM edges
  UNION SELECT w.id, e.dst FROM walk w JOIN edges e ON w.reach = e.src
), labels AS (
  SELECT id, MIN(reach) AS cluster_id FROM (
    SELECT id, reach FROM walk UNION SELECT src, src FROM edges
  ) GROUP BY id
)
SELECT cluster_id, COUNT(*) AS cluster_size, MIN(id) AS canonical_id
FROM labels GROUP BY cluster_id
""",
)
def q_ext_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup end-to-end: embedding-cosine candidate pairs →
    connected components → one canonical (min-id) document per
    cluster. The full composition a training-data pipeline runs.
    Candidate generation is the broadcast-block exact scorer (no
    pair-product join; the corpus-vs-corpus scale twin is
    q_ext_dedup_semantic_ann) piped into the distributed clustering
    operator."""
    vecs = load(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    pairs = similarity.cosine_near_dup_pairs_broadcast(vecs, threshold=0.3).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    labels = dedup.connected_components(pairs)
    return labels.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size"), F.min("doc_id").alias("canonical_id")
    )


@register(
    "q_ext_dedup_semantic_ann",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_planted,
       CAST(COUNT(*) AS BIGINT) AS n_same_cluster
FROM embeddings WHERE vec_id < 20
""",
)
def q_ext_dedup_semantic_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup, scale path: multi-table LSH candidate pairs →
    connected components → cluster labels. The composition a 100 TB
    pipeline actually runs — candidates come from (table, bucket)
    joins, never an all-pairs product; n_planes=4/n_tables=24 targets
    this fixture's low 0.35 threshold (production near-dup thresholds
    0.9+ use the b=8/L=8 default with far smaller buckets; the exact
    and hash-verified twins are q_ext_dedup_semantic /
    q_ext_dedup_semantic_det). Verified by a PLANTED-CLONE contract:
    20 exact-duplicate vectors are appended under offset ids; an
    identical embedding lands in the same bucket of EVERY table under
    any plane seed, the (source, clone) pair scores cos_sim ~ 1.0 >=
    threshold, so connected components must label each clone into its
    source's cluster. Output (n_planted, n_same_cluster); the oracle
    expects equality. Recall vs the exact pair set stays pytest-pinned
    (tests/test_llm.py::test_semantic_ann_recall)."""
    vecs_u, planted = _planted_vecs(spark, sf_dir, n=20, limit=200)
    pairs = similarity.cosine_near_dup_pairs_ann(
        vecs_u, dim=64, threshold=0.35, n_planes=4, n_tables=24, seed=42
    ).select(F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b"))
    labels = dedup.connected_components(pairs)
    src = labels.where(F.col("doc_id") < 20).select(
        "doc_id", F.col("cluster_id").alias("c_src")
    )
    cln = labels.where(F.col("doc_id") >= _CLONE_OFFSET).select(
        (F.col("doc_id") - _CLONE_OFFSET).alias("doc_id"),
        F.col("cluster_id").alias("c_clone"),
    )
    same = src.join(cln, "doc_id").agg(
        F.count(F.when(F.col("c_src") == F.col("c_clone"), 1)).alias("n_same_cluster")
    )
    return planted.crossJoin(same).select("n_planted", "n_same_cluster")


@register(
    "q_ext_pii_scrub",
    oracle="""
WITH t0 AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@mail.example.com visit https://site.example/p/'
              || CAST(doc_id AS VARCHAR) || ' id ' || lpad(CAST(doc_id AS VARCHAR), 8, '0')
           AS t
  FROM documents
), t1 AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
         regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t
  FROM t0
), t2 AS (
  SELECT doc_id, n_email,
         CAST(len(regexp_extract_all(t, 'https?://[^ ]+')) AS BIGINT) AS n_url,
         regexp_replace(t, 'https?://[^ ]+', '<URL>', 'g') AS t
  FROM t1
)
SELECT doc_id, n_email, n_url,
       CAST(len(regexp_extract_all(t, '[0-9]{6,}')) AS BIGINT) AS n_id_number,
       regexp_replace(t, '[0-9]{6,}', '<ID_NUMBER>', 'g') AS scrubbed
FROM t2
""",
)
def q_ext_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (emails / URLs / long digit runs → placeholders)
    with per-class counts — the standard pre-training privacy pass.
    The fixture text is synthetic word soup, so deterministic PII is
    appended identically in both engines before scrubbing; the
    operator itself (llm/text.py::scrub_pii) is input-agnostic.
    All JVM regexp — one codegen stage, no shuffle."""
    from octopufs_spark.llm.text import scrub_pii

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com visit https://site.example/p/"),
            F.col("doc_id").cast("string"),
            F.lit(" id "),
            F.lpad(F.col("doc_id").cast("string"), 8, "0"),
        ).alias("text"),
    )
    return scrub_pii(d).select(
        "doc_id", "n_email", "n_url", "n_id_number", "scrubbed"
    )


@register(
    "q_ext_merge_upsert",
    oracle="""
WITH orders_d AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders
), changes AS (
  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
         CAST(ROUND(o_totalprice * CAST('1.1' AS DECIMAL(2,1)), 2) AS DECIMAL(18,2))
           AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders_d WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey + 1000000000, o_custkey, 'N', o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders_d WHERE o_orderkey % 97 = 0
), merged AS (
  SELECT * FROM orders_d o
  WHERE NOT EXISTS (SELECT 1 FROM changes c WHERE c.o_orderkey = o.o_orderkey)
  UNION ALL
  SELECT * FROM changes
)
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       SUM(o_totalprice) AS total_price
FROM merged GROUP BY o_orderstatus
""",
)
def q_ext_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level MERGE (CDC upsert): a deterministic changeset (every
    7th order updated with status 'U' and +10% price, every 97th
    inserted under a shifted key with status 'N') merged into orders
    via merge.merge_upsert — one anti-join shuffle on the key,
    changeset broadcast by AQE. Money math is decimal end-to-end so
    the post-merge rollup (which makes updates, inserts and
    carried-forward rows all participate in the hash) is exact in both
    engines. The manifest-atomic variant (merge_upsert_manifest) is
    pytest-verified."""
    from octopufs_spark.merge import merge_upsert

    o = load(spark, sf_dir, "orders").withColumn(
        "o_totalprice", F.col("o_totalprice").cast("decimal(18,2)")
    )
    updates = o.where(F.col("o_orderkey") % 7 == 0).withColumns(
        {
            "o_orderstatus": F.lit("U"),
            "o_totalprice": F.round(
                F.col("o_totalprice") * F.lit("1.1").cast("decimal(2,1)"), 2
            ).cast("decimal(18,2)"),
        }
    )
    inserts = o.where(F.col("o_orderkey") % 97 == 0).withColumns(
        {
            "o_orderkey": F.col("o_orderkey") + 1000000000,
            "o_orderstatus": F.lit("N"),
        }
    )
    merged = merge_upsert(o, updates.unionByName(inserts), keys=["o_orderkey"])
    return merged.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum("o_totalprice").alias("total_price"),
    )


@register(
    "q_ext_embed_quantize",
    oracle="""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings WHERE vec_id < 300
), s AS (
  SELECT vec_id, emb,
         GREATEST(ABS(list_min(emb)), ABS(list_max(emb)), 1e-12) / 127 AS raw_scale
  FROM v
), q AS (
  SELECT vec_id, raw_scale,
         list_transform(emb, x -> CAST(ROUND(x / raw_scale, 0) AS BIGINT)) AS qvec,
         emb
  FROM s
)
-- NB: the output alias must differ from the column the error term
-- reads — DuckDB resolves lateral SELECT aliases left-to-right, so
-- `ROUND(raw_scale,9) AS scale` followed by `... * scale` would feed
-- the ROUNDED scale into the error (a 3e-8 cross-engine mismatch).
SELECT vec_id,
       ROUND(raw_scale, 9) AS scale,
       CAST(list_min(qvec) AS BIGINT) AS q_min,
       CAST(list_max(qvec) AS BIGINT) AS q_max,
       ROUND(list_max(list_transform(list_zip(emb, qvec),
                                     p -> ABS(p[1] - p[2] * raw_scale))), 9) AS max_abs_err
FROM q
""",
)
def q_ext_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of embeddings — the 4× storage /
    bandwidth cut every 100 TB vector corpus takes before ANN. Scale =
    max|x|/127 per vector; outputs the quantized range and the exact
    max dequantization error, all JVM higher-order array ops (no
    Python). Deterministic: scale/round/error are plain IEEE
    arithmetic, pinned at 9 decimals (no transcendentals)."""
    e = load(spark, sf_dir, "embeddings").where(F.col("vec_id") < 300)
    emb = F.col("embedding").cast("array<double>")
    scale = (
        F.greatest(
            F.abs(F.array_min(emb)), F.abs(F.array_max(emb)), F.lit(1e-12)
        )
        / 127
    )
    # the internal column is named raw_scale on BOTH sides: aliasing the
    # rounded output to "scale" in the same select would lateral-shadow
    # a column of that name inside the error expression (Spark and
    # DuckDB both resolve select-list aliases laterally) and feed the
    # ROUNDED scale into the error — a ~3e-8 corruption.
    s = e.select(F.col("vec_id"), emb.alias("emb"), scale.alias("raw_scale"))
    qvec = F.transform(
        F.col("emb"), lambda x: F.round(x / F.col("raw_scale"), 0).cast("long")
    )
    q = s.select("vec_id", "raw_scale", qvec.alias("qvec"), "emb")
    err = F.array_max(
        F.zip_with(
            F.col("emb"), F.col("qvec"), lambda x, qv: F.abs(x - qv * F.col("raw_scale"))
        )
    )
    return q.select(
        "vec_id",
        F.round("raw_scale", 9).alias("scale"),
        F.array_min("qvec").cast("long").alias("q_min"),
        F.array_max("qvec").cast("long").alias("q_max"),
        F.round(err, 9).alias("max_abs_err"),
    )


@register(
    "q_ext_dedup_incremental",
    oracle="""
WITH old AS (
  SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id < 250
), new_docs AS (
  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id >= 250
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_new,
       CAST(SUM(CASE WHEN o.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_of_old,
       CAST(SUM(CASE WHEN o.h IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       MIN(CASE WHEN o.h IS NULL THEN doc_id END) AS first_kept_id
FROM new_docs n LEFT JOIN old o ON n.h = o.h
""",
)
def q_ext_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (cross-corpus) exact dedup — the shape every
    ongoing ingestion pipeline runs: dedup the NEW batch against the
    EXISTING corpus's digest set, not against itself. The existing
    side reduces to distinct digests (bounded, broadcastable at any
    corpus size since digests ≪ bytes); the new batch anti-joins on
    digest. Here both halves come from the fixture split at
    doc_id 250."""
    d = load(spark, sf_dir, "documents")
    old = (
        d.where(F.col("doc_id") < 250)
        .select(F.md5("text").alias("h"))
        .distinct()
        .withColumn("_seen", F.lit(1))
    )
    new_docs = d.where(F.col("doc_id") >= 250).select(
        "doc_id", F.md5("text").alias("h")
    )
    j = new_docs.join(F.broadcast(old), "h", "left")
    return j.agg(
        F.count("*").alias("n_new"),
        F.sum(F.when(F.col("_seen").isNotNull(), 1).otherwise(0)).alias("n_dup_of_old"),
        F.sum(F.when(F.col("_seen").isNull(), 1).otherwise(0)).alias("n_kept"),
        F.min(F.when(F.col("_seen").isNull(), F.col("doc_id"))).alias("first_kept_id"),
    )


@register(
    "q_ext_dedup_canonical_quality",
    oracle="""
WITH RECURSIVE pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM (SELECT doc_id, md5(substr(text, 1, 15)) AS h FROM documents WHERE doc_id < 500) a
  JOIN (SELECT doc_id, md5(substr(text, 1, 15)) AS h FROM documents WHERE doc_id < 500) b
    ON a.h = b.h AND a.doc_id < b.doc_id
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
), walk AS (
  SELECT src AS id, src AS reach FROM edges
  UNION SELECT w.id, e.dst FROM walk w JOIN edges e ON w.reach = e.src
), labels AS (
  SELECT id, MIN(reach) AS cluster_id FROM (
    SELECT id, reach FROM walk UNION SELECT src, src FROM edges
  ) GROUP BY id
), ranked AS (
  SELECT l.cluster_id, l.id AS doc_id, d.n_chars,
         ROW_NUMBER() OVER (PARTITION BY l.cluster_id
                            ORDER BY d.n_chars DESC, l.id) AS rn
  FROM labels l JOIN documents d ON l.id = d.doc_id
)
SELECT cluster_id, doc_id AS canonical_id, CAST(n_chars AS BIGINT) AS canonical_chars
FROM ranked WHERE rn = 1
""",
)
def q_ext_dedup_canonical_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection: near-dup clusters keep their
    LONGEST member (n_chars, min-id tie-break) instead of the min-id —
    what production dedup actually ships (min-id loses the best copy).
    Same prefix-collision candidate pairs and distributed CC as
    q_ext_dedup_cluster, plus one window over cluster labels joined to
    the quality column."""
    from pyspark.sql.window import Window

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    keyed = d.select("doc_id", F.md5(F.substring("text", 1, 15)).alias("h"))
    a, b = keyed.alias("a"), keyed.alias("b")
    pairs = a.join(
        b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    labels = dedup.connected_components(pairs)
    ranked = labels.join(d.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        ranked.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("canonical_id"),
            F.col("n_chars").cast("long").alias("canonical_chars"),
        )
    )


@register(
    "q_ext_hybrid_search",
    oracle="""
WITH qv AS (
  SELECT CAST(embedding AS DOUBLE[]) AS q FROM embeddings WHERE vec_id = 0
), hits AS (
  SELECT d.doc_id, d.lang,
         ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), qv.q) /
               (SQRT(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
                * SQRT(list_dot_product(qv.q, qv.q))), 6) AS cos_sim
  FROM documents d
  JOIN embeddings e ON d.doc_id = e.vec_id
  CROSS JOIN qv
  WHERE d.text LIKE '%window%' AND d.doc_id <> 0
)
SELECT doc_id, lang, cos_sim, rn FROM (
  SELECT hits.*, ROW_NUMBER() OVER (ORDER BY cos_sim DESC, doc_id) AS rn FROM hits
) WHERE rn <= 10
""",
)
def q_ext_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval (RAG-style): keyword prefilter on text, then
    exact cosine ranking against a fixed query vector (doc 0's
    embedding), top-10 with deterministic tie-break. The query vector
    rides a broadcast 1-row cross join (same sanctioned pattern as the
    surprisal grand-total); scoring is the JVM higher-order dot fold.
    At scale the keyword filter prunes before any vector math — the
    plan a retrieval pipeline wants: cheap predicate first, vector
    scoring on survivors only."""
    from pyspark.sql.window import Window

    from octopufs_spark.llm.similarity import dot

    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    qv = e.where(F.col("vec_id") == 0).select(F.col("emb").alias("q"))
    hits = (
        d.where(F.col("text").like("%window%") & (F.col("doc_id") != 0))
        .join(e, d.doc_id == e.vec_id)
        .crossJoin(F.broadcast(qv))
        .select(
            "doc_id",
            "lang",
            F.round(
                dot(F.col("emb"), F.col("q"))
                / (
                    F.sqrt(dot(F.col("emb"), F.col("emb")))
                    * F.sqrt(dot(F.col("q"), F.col("q")))
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.orderBy(F.desc("cos_sim"), F.asc("doc_id"))
    return (
        hits.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 10)
    )


@register(
    "q_ext_table_diff",
    oracle="""
WITH t2 AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 11 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
         o_totalprice
  FROM orders WHERE o_orderkey % 13 <> 0
  UNION ALL
  SELECT o_orderkey + 2000000000, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 17 = 0
), a AS (
  SELECT o_orderkey AS k, md5(o_orderstatus || '|' || CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)) AS h
  FROM orders
), b AS (
  SELECT o_orderkey AS k, md5(o_orderstatus || '|' || CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)) AS h
  FROM t2
)
SELECT
  CAST(SUM(CASE WHEN b.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
  CAST(SUM(CASE WHEN a.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
  CAST(SUM(CASE WHEN a.k IS NOT NULL AND b.k IS NOT NULL AND a.h <> b.h THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
  CAST(SUM(CASE WHEN a.h = b.h THEN 1 ELSE 0 END) AS BIGINT) AS n_same
FROM a FULL OUTER JOIN b ON a.k = b.k
""",
)
def q_ext_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level table reconciliation — the relational generalization
    of the reference's file-level getDelta (Delta.scala:40-50: set
    difference on (rel_path, size) becomes full outer join on key +
    row-hash compare). A deterministic mutant of orders (every 13th
    removed, every 11th surviving status-changed, every 17th re-added
    under a shifted key) is diffed against the original: counts of
    removed/added/changed/same. One shuffle per side on the key; row
    hashes are md5 of a canonical decimal rendering, computed map-side
    so the exchange carries (key, hash), not whole rows."""
    o = load(spark, sf_dir, "orders")

    def hashed(df: DataFrame, k: str = "o_orderkey") -> DataFrame:
        h = F.md5(
            F.concat_ws(
                "|",
                F.col("o_orderstatus"),
                F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
            )
        )
        return df.select(F.col(k).alias("k"), h.alias("h"))

    mutated = (
        o.where(F.col("o_orderkey") % 13 != 0)
        .withColumn(
            "o_orderstatus",
            F.when(F.col("o_orderkey") % 11 == 0, F.lit("X")).otherwise(
                F.col("o_orderstatus")
            ),
        )
        .unionByName(
            o.where(F.col("o_orderkey") % 17 == 0).withColumn(
                "o_orderkey", F.col("o_orderkey") + 2000000000
            )
        )
    )
    a, b = hashed(o).alias("a"), hashed(mutated).alias("b")
    j = a.join(b, F.col("a.k") == F.col("b.k"), "full_outer")
    return j.agg(
        F.sum(F.when(F.col("b.k").isNull(), 1).otherwise(0)).alias("n_removed"),
        F.sum(F.when(F.col("a.k").isNull(), 1).otherwise(0)).alias("n_added"),
        F.sum(
            F.when(
                F.col("a.k").isNotNull()
                & F.col("b.k").isNotNull()
                & (F.col("a.h") != F.col("b.h")),
                1,
            ).otherwise(0)
        ).alias("n_changed"),
        F.sum(F.when(F.col("a.h") == F.col("b.h"), 1).otherwise(0)).alias("n_same"),
    )


@register(
    "q_ext_scd2",
    oracle="""
WITH base AS (
  SELECT c_custkey, c_mktsegment, c_acctbal,
         TIMESTAMP '2020-01-01 00:00:00' AS valid_from,
         CAST(NULL AS TIMESTAMP) AS valid_to
  FROM customer
), changes AS (
  SELECT c_custkey, c_mktsegment, c_acctbal + 100.0 AS c_acctbal,
         TIMESTAMP '2021-06-01 00:00:00' AS valid_from
  FROM customer WHERE c_custkey % 5 = 0
), change_at AS (
  SELECT c_custkey, valid_from AS change_at FROM changes
), closed AS (
  SELECT b.c_custkey, b.c_mktsegment, b.c_acctbal, b.valid_from,
         CASE WHEN ca.change_at IS NOT NULL AND b.valid_to IS NULL
              THEN ca.change_at ELSE b.valid_to END AS valid_to
  FROM base b LEFT JOIN change_at ca ON b.c_custkey = ca.c_custkey
)
SELECT * FROM closed
UNION ALL
SELECT c_custkey, c_mktsegment, c_acctbal, valid_from,
       CAST(NULL AS TIMESTAMP) AS valid_to
FROM changes
""",
)
def q_ext_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 MERGE (merge.merge_scd2): every 5th customer gets a
    balance change at a later effective time; the current version is
    closed (valid_to set) and the new version appended open, history
    untouched. One key-shuffle of the dimension, changeset broadcast.
    No float arithmetic beyond an exact +100.0, so values hash across
    engines."""
    from octopufs_spark.merge import merge_scd2

    c = load(spark, sf_dir, "customer")
    t0 = F.lit("2020-01-01 00:00:00").cast("timestamp")
    t1 = F.lit("2021-06-01 00:00:00").cast("timestamp")
    base = c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        t0.alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    changes = (
        c.where(F.col("c_custkey") % 5 == 0)
        .select(
            "c_custkey",
            "c_mktsegment",
            (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
            t1.alias("valid_from"),
        )
    )
    return merge_scd2(base, changes, keys=["c_custkey"])


@register(
    "q_ext_length_hist",
    oracle="""
SELECT LEAST(CAST(FLOOR(n_chars / 100) AS BIGINT), 9) AS bucket,
       COUNT(*) AS n_docs,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM documents GROUP BY 1
""",
)
def q_ext_length_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length histogram (100-char buckets, top-coded at 9) —
    the first corpus-analysis op run on any new crawl. Single
    map-side-combinable aggregate on a derived key; no skew risk
    (bucket count is fixed)."""
    d = load(spark, sf_dir, "documents")
    bucket = F.least(F.floor(F.col("n_chars") / 100), F.lit(9)).cast("long")
    return (
        d.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
    )


@register(
    "q_udaf_grouped_agg",
    oracle="""
SELECT l_returnflag,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4) AS weighted_avg_price
FROM lineitem GROUP BY l_returnflag
""",
)
def q_udaf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined aggregate as a GROUPED_AGG pandas UDF: quantity-
    weighted average price per returnflag. Arrow ships each group's
    columns as numpy-backed Series; the UDAF returns one scalar per
    group. Rounded to 4 digits — the UDF accumulates in float64 while
    the oracle is decimal-exact, so last-ulp drift is absorbed."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def weighted_avg(price: pd.Series, qty: pd.Series) -> float:
        return float(round((price * qty).sum() / qty.sum(), 4))

    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        weighted_avg("l_extendedprice", "l_quantity").alias("weighted_avg_price")
    )


@register(
    "q_udaf_weighted_median",
    oracle="""
WITH o AS (
  SELECT l_returnflag AS rf, l_extendedprice AS v,
         CAST(l_quantity AS DECIMAL(18,2)) AS w
  FROM lineitem
), c AS (
  SELECT rf, v,
         SUM(w) OVER (PARTITION BY rf ORDER BY v) AS cum,
         SUM(w) OVER (PARTITION BY rf) AS tot
  FROM o
)
SELECT rf AS l_returnflag, MIN(v) AS weighted_median
FROM c WHERE 2 * cum >= tot GROUP BY rf
""",
)
def q_udaf_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per returnflag (lower weighted
    median: smallest value whose cumulative weight — peers included —
    reaches half the total), registered on the pure-window plan (r5
    verdict #2): the GROUPED_AGG pandas-UDAF formulation
    (``weighted_median_udaf`` below, pytest-covered as the declared
    UDAF surface) funnels the whole table through one Python worker per
    group — 3 groups here, a measured 7.5×-on-10×-data bottleneck.

    Plan shape, 100 TB lens: (1) groupBy (rf, value) pre-collapses peer
    rows — a HIGH-cardinality, map-side-combinable shuffle that does the
    heavy lifting in parallel; (2) the cumulative-weight window then runs
    over the collapsed distinct values only (per-group row count =
    distinct prices, not lineitems); (3) group totals come from a tiny
    groupBy + broadcast join rather than a second full-frame window.
    Everything stays in whole-stage codegen; weights sum in DECIMAL so
    the half-total comparison is exact, matching the oracle bit-for-bit.
    """
    li = load(spark, sf_dir, "lineitem")
    o = li.select(
        F.col("l_returnflag").alias("rf"),
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").cast("decimal(18,2)").alias("w"),
    )
    # collapse peers first: cum at value x includes all weight <= x either way
    per_value = o.groupBy("rf", "v").agg(F.sum("w").alias("w"))
    cum_w = Window.partitionBy("rf").orderBy("v").rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = per_value.select("rf", "v", F.sum("w").over(cum_w).alias("cum"))
    tot = o.groupBy("rf").agg(F.sum("w").alias("tot"))
    return (
        c.join(F.broadcast(tot), "rf")
        .where(F.lit(2) * F.col("cum") >= F.col("tot"))
        .groupBy("rf")
        .agg(F.min("v").alias("weighted_median"))
        .select(F.col("rf").alias("l_returnflag"), "weighted_median")
    )


def weighted_median_udaf(li: DataFrame) -> DataFrame:
    """The GROUPED_AGG pandas-UDAF formulation of the same statistic —
    the declared UDAF surface (SURVEY §2C), kept out of the registered
    hot path for plan-shape reasons (see q_udaf_weighted_median) and
    exercised by tests/test_tsq.py
    (test_weighted_median_udaf_surface_matches_window_plan) against the
    window plan's answer.

    The UDF accumulates weights in integer cents (exact), so the
    half-total comparison is bit-identical to DECIMAL arithmetic — no
    float tie-breaking at the boundary."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def wmedian(v: pd.Series, w: pd.Series) -> float:
        cents = np.round(w.to_numpy() * 100).astype(np.int64)
        order = np.argsort(v.to_numpy(), kind="stable")
        vs = v.to_numpy()[order]
        cs = cents[order]
        # collapse peer groups so cum at value x includes all weight <= x
        uniq, idx = np.unique(vs, return_index=True)
        per = np.add.reduceat(cs, idx)
        cum = np.cumsum(per)
        tot = cum[-1]
        return float(uniq[np.searchsorted(2 * cum, tot, side="left")])

    return li.groupBy(F.col("l_returnflag")).agg(
        wmedian("l_extendedprice", "l_quantity").alias("weighted_median")
    )


@register(
    "q_ext_multimodal_resize",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
       CAST(224 AS BIGINT) AS width, CAST(224 AS BIGINT) AS height,
       'text/plain' AS media_type
FROM documents
""",
)
def q_ext_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media resize plumbing: binary payloads through the Arrow-batched
    mapInPandas resize operator (codec faked — payload passes through,
    metadata reflects the target; see llm/multimodal.py). The oracle
    pins the metadata contract: payload byte-length preserved, target
    dimensions stamped, schema stable."""
    media = multimodal.documents_as_media(load(spark, sf_dir, "documents"))
    out = multimodal.resize_media(media, 224, 224, fake=True)
    return out.select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("payload_bytes"),
        F.col("width"),
        F.col("height"),
        "media_type",
    )


def _resize_real_oracle(src: int = 8, dst: int = 4) -> str:
    """DuckDB replay of the REAL PNG resize pipeline: the source image
    is deterministic (pixel byte k = text byte k mod len), the
    nearest-neighbor map is integer floor arithmetic, and the decoded
    channel means are integer-exact — so the whole
    encode→resize→re-encode→decode chain is value-verifiable without
    any image library on the oracle side."""
    step = src // dst
    exprs = []
    for c, name in enumerate(("mean_r", "mean_g", "mean_b")):
        terms = []
        for y in range(dst):
            for x in range(dst):
                p = (y * step * src) + (x * step)
                idx = p * 3 + c
                terms.append(f"ascii(substr(text, ({idx} % length(text)) + 1, 1))")
        s = " + ".join(terms)
        exprs.append(
            f"CAST(FLOOR(CAST({s} AS DOUBLE) / {dst * dst}) AS BIGINT) AS {name}"
        )
    cols = ",\n       ".join(exprs)
    return f"""
SELECT doc_id, CAST({dst} AS BIGINT) AS width, CAST({dst} AS BIGINT) AS height,
       CAST(3 AS BIGINT) AS channels,
       {cols}
FROM documents
"""


@register("q_ext_multimodal_resize_real", oracle=_resize_real_oracle())
def q_ext_multimodal_resize_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize end-to-end, fully hash-verified (round-4; the
    plumbing-only fake-codec contract remains q_ext_multimodal_resize):
    each document becomes a deterministic 8x8 RGB PNG (pixel byte k =
    text byte k mod len) via the in-repo pure-stdlib encoder, goes
    through the Arrow-batched resize operator with ``fake=False``
    (decode → nearest-neighbor floor sampling → re-encode,
    llm/multimodal.py::resize_png), and the resized 4x4 payload is
    re-DECODED to integer channel means. The oracle recomputes the
    sampled byte positions and the floor-divided means directly from
    the text — every stage of encode/unfilter/sample/re-encode must be
    bit-correct for the hash to match."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")

    def build(batches):
        from octopufs_spark.llm.multimodal import encode_png

        w = h = 8
        stride = w * 3
        for pdf in batches:
            rows = []
            for doc_id, txt in zip(pdf["doc_id"], pdf["text"]):
                tb = txt.encode("utf-8")
                n = len(tb)
                img = bytes(tb[k % n] for k in range(w * h * 3))
                rgb_rows = [img[y * stride : (y + 1) * stride] for y in range(h)]
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "payload": encode_png(w, h, rgb_rows),
                        "media_type": "image/png",
                    }
                )
            yield pd.DataFrame(rows)

    media = docs.mapInPandas(build, "doc_id long, payload binary, media_type string")
    resized = multimodal.resize_media(media, 4, 4, fake=False)
    return multimodal.decode_images_png(resized.select("doc_id", "payload")).select(
        "doc_id", "width", "height", "channels", "mean_r", "mean_g", "mean_b"
    )


@register(
    "q_ext_multimodal_frames",
    oracle="""
WITH m AS (
  SELECT doc_id, octet_length(encode(text)) AS n FROM documents
)
SELECT doc_id, CAST(unnest(range(0, CAST(greatest(ceil(n / 128.0), 1) AS BIGINT))) AS BIGINT) AS frame_no,
       CAST(least(128, n - CAST(unnest(range(0, CAST(greatest(ceil(n / 128.0), 1) AS BIGINT))) AS BIGINT) * 128) AS BIGINT) AS frame_bytes
FROM m
""",
)
def q_ext_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plumbing: one payload row → N frame rows through
    the cardinality-expanding mapInPandas operator (every 128 bytes
    stands in for a decoded frame). The oracle reproduces the slicing
    arithmetic exactly — frame numbering and per-frame byte counts —
    so the expansion shape is hash-checked even with the codec faked."""
    media = multimodal.documents_as_media(load(spark, sf_dir, "documents"))
    frames = multimodal.sample_frames(media, every_n_bytes=128, fake=True)
    return frames.select(
        "doc_id",
        "frame_no",
        F.octet_length("payload").cast("long").alias("frame_bytes"),
    )


@register(
    "q_ext_embed_stats",
    oracle="""
SELECT label,
       COUNT(*) AS n_vecs,
       ROUND(AVG(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                              x -> x * x)))), 6) AS avg_norm,
       ROUND(MIN(list_aggregate(CAST(embedding AS DOUBLE[]), 'min')), 6) AS min_component,
       ROUND(MAX(list_aggregate(CAST(embedding AS DOUBLE[]), 'max')), 6) AS max_component
FROM embeddings GROUP BY label
""",
)
def q_ext_embed_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-column health stats per label: vector counts, mean L2
    norm, extreme components — the sanity pass run before any
    similarity work (catches unnormalized batches, NaN explosions,
    truncated vectors).

    Norms via JVM higher-order fold (identical sequential accumulation
    to DuckDB's list_sum), rounded 6 to absorb float->double cast
    noise. One narrow aggregation; no Python."""
    from octopufs_spark.llm.similarity import dot

    v = load(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("emb")
    )
    return v.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.round(F.avg(F.sqrt(dot(F.col("emb"), F.col("emb")))), 6).alias("avg_norm"),
        F.round(F.min(F.array_min("emb")), 6).alias("min_component"),
        F.round(F.max(F.array_max("emb")), 6).alias("max_component"),
    )


@register(
    "q_ext_vocab",
    oracle="""
WITH tok AS (
  SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents
), freq AS (
  SELECT lang, w, COUNT(*) AS c FROM tok GROUP BY lang, w
)
SELECT lang,
       CAST(COUNT(*) FILTER (WHERE c >= 5) AS BIGINT) AS vocab_size,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COALESCE(SUM(c) FILTER (WHERE c < 5), 0) AS BIGINT) AS oov_tokens
FROM freq GROUP BY lang
""",
)
def q_ext_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary statistics per language: type counts, a
    min-frequency-5 vocabulary size, and the OOV token mass a tokenizer
    trained at that cutoff would map to UNK — the sizing pass before
    training a vocab. One explode + two hash aggregations, map-side
    combinable, corpus-linear."""
    toks = load(spark, sf_dir, "documents").select(
        "lang", F.explode(F.split("text", " ")).alias("w")
    )
    freq = toks.groupBy("lang", "w").agg(F.count("*").alias("c"))
    return freq.groupBy("lang").agg(
        F.count(F.when(F.col("c") >= 5, 1)).alias("vocab_size"),
        F.count("*").alias("n_types"),
        F.sum("c").cast("long").alias("n_tokens"),
        F.coalesce(F.sum(F.when(F.col("c") < 5, F.col("c"))), F.lit(0))
        .cast("long")
        .alias("oov_tokens"),
    )


@register(
    "q_ext_dataset_card",
    oracle="""
WITH d AS (
  SELECT source, lang, len(string_split(text, ' ')) AS n_tok, n_chars FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(MIN(n_tok) AS BIGINT) AS min_tok,
       CAST(MAX(n_tok) AS BIGINT) AS max_tok
FROM d GROUP BY source
""",
)
def q_ext_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card generator: the per-source summary block (docs,
    token/char mass, language coverage, length range) that documents a
    training mixture — one pass, one aggregation."""
    d = load(spark, sf_dir, "documents").select(
        "source", "lang", F.size(F.split("text", " ")).alias("n_tok"), "n_chars"
    )
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.countDistinct("lang").alias("n_langs"),
        F.min("n_tok").cast("long").alias("min_tok"),
        F.max("n_tok").cast("long").alias("max_tok"),
    )


@register(
    "q_ext_embed_pq",
    oracle="""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(ROUND(x * 1000) AS BIGINT)) AS v
  FROM embeddings
), pos AS (
  SELECT vec_id, unnest(generate_series(1, 64)) AS p, unnest(v) AS val FROM q
), e AS (
  SELECT vec_id, CAST(FLOOR((p - 1) / 8) AS BIGINT) AS subspace, p, val FROM pos
), cent AS (
  SELECT vec_id AS code, subspace, p, val AS cval
  FROM e WHERE vec_id < 4
), dist AS (
  SELECT e.vec_id, e.subspace, c.code,
         SUM((e.val - c.cval) * (e.val - c.cval)) AS d
  FROM e JOIN cent c ON c.subspace = e.subspace AND c.p = e.p
  GROUP BY e.vec_id, e.subspace, c.code
)
SELECT vec_id, subspace, code, CAST(d AS BIGINT) AS sq_err FROM (
  SELECT vec_id, subspace, code, d,
         ROW_NUMBER() OVER (PARTITION BY vec_id, subspace ORDER BY d, code) AS rn
  FROM dist
) WHERE rn = 1
""",
)
def q_ext_embed_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization: 64-dim embeddings split into 8 subspaces,
    each encoded as the nearest of 4 fixed sub-codebook entries (the
    sub-vectors of the 4 lowest vec_ids) with its exact integer
    residual — the 8-byte-per-vector compression IVF-PQ indexes use at
    billion scale. Deterministic integer arithmetic end-to-end, so
    codes AND residuals hash-verify. Plan: one posexplode, a broadcast
    join on (subspace, position) against the 2048-row codebook, one
    aggregation, one argmin window — corpus-linear."""
    q = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: F.round(x * 1000).cast("long")).alias("v"),
    )
    e = q.select(
        "vec_id", F.posexplode("v").alias("p0", "val")
    ).select(
        "vec_id",
        (F.col("p0") + 1).alias("p"),
        F.floor(F.col("p0") / 8).cast("long").alias("subspace"),
        "val",
    )
    cent = (
        e.where(F.col("vec_id") < 4)
        .select(F.col("vec_id").alias("code"), "subspace", "p", F.col("val").alias("cval"))
    )
    dist = (
        e.join(F.broadcast(cent), ["subspace", "p"])
        .groupBy("vec_id", "subspace", "code")
        .agg(F.sum((F.col("val") - F.col("cval")) * (F.col("val") - F.col("cval"))).alias("d"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("vec_id", "subspace").orderBy("d", "code")
    return (
        dist.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "subspace", "code", F.col("d").cast("long").alias("sq_err"))
    )


@register(
    "q_ext_ann_pq_adc",
    oracle="""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(ROUND(x * 1000) AS BIGINT)) AS v
  FROM embeddings
), pos AS (
  SELECT vec_id, unnest(generate_series(1, 64)) AS p, unnest(v) AS val FROM q
), e AS (
  SELECT vec_id, CAST(FLOOR((p - 1) / 8) AS BIGINT) AS subspace, p, val FROM pos
), cent AS (
  SELECT vec_id AS code, subspace, p, val AS cval FROM e WHERE vec_id < 4
), codes AS (
  SELECT vec_id, subspace, code FROM (
    SELECT e.vec_id, e.subspace, c.code,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id, e.subspace
                              ORDER BY SUM((e.val - c.cval) * (e.val - c.cval)), c.code) AS rn
    FROM e JOIN cent c ON c.subspace = e.subspace AND c.p = e.p
    GROUP BY e.vec_id, e.subspace, c.code
  ) WHERE rn = 1
), lut AS (
  SELECT e.vec_id AS qid, e.subspace, c.code,
         SUM((e.val - c.cval) * (e.val - c.cval)) AS d
  FROM e JOIN cent c ON c.subspace = e.subspace AND c.p = e.p
  WHERE e.vec_id < 50
  GROUP BY e.vec_id, e.subspace, c.code
), adc AS (
  SELECT l.qid, x.vec_id AS xid, SUM(l.d) AS adist
  FROM codes x JOIN lut l ON l.subspace = x.subspace AND l.code = x.code
  WHERE l.qid <> x.vec_id
  GROUP BY l.qid, x.vec_id
)
SELECT qid, xid, CAST(adist AS BIGINT) AS adist, rn FROM (
  SELECT qid, xid, adist,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adist, xid) AS BIGINT) AS rn
  FROM adc
) WHERE rn <= 5
""",
)
def q_ext_ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance ANN search: each query builds an 8x4
    lookup table of exact integer distances to the sub-codebooks, and
    every database vector is scored by summing 8 table lookups selected
    by its PQ codes — never touching the raw vectors. This is the
    IVF-PQ scoring kernel at billion scale (8 adds per candidate vs 64
    multiplies); all-integer arithmetic makes codes, LUT, and ranks
    hash-verifiable. Plan: codes and LUT are two bounded aggregations;
    scoring is an equi-join on (subspace, code) + per-query top-5."""
    from pyspark.sql.window import Window

    qv = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: F.round(x * 1000).cast("long")).alias("v"),
    )
    e = qv.select("vec_id", F.posexplode("v").alias("p0", "val")).select(
        "vec_id",
        (F.col("p0") + 1).alias("p"),
        F.floor(F.col("p0") / 8).cast("long").alias("subspace"),
        "val",
    ).localCheckpoint()  # feeds codes AND the query LUT
    cent = e.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("code"), "subspace", "p", F.col("val").alias("cval")
    )
    sq = F.sum((F.col("val") - F.col("cval")) * (F.col("val") - F.col("cval")))
    ranked = (
        e.join(F.broadcast(cent), ["subspace", "p"])
        .groupBy("vec_id", "subspace", "code")
        .agg(sq.alias("d"))
    )
    w_code = Window.partitionBy("vec_id", "subspace").orderBy("d", "code")
    codes = (
        ranked.withColumn("rn", F.row_number().over(w_code))
        .where(F.col("rn") == 1)
        .select("vec_id", "subspace", "code")
    )
    lut = ranked.where(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("qid"), "subspace", "code", "d"
    )
    adc = (
        codes.withColumnRenamed("vec_id", "xid")
        .join(lut, ["subspace", "code"])
        .where(F.col("qid") != F.col("xid"))
        .groupBy("qid", "xid")
        .agg(F.sum("d").alias("adist"))
    )
    w_top = Window.partitionBy("qid").orderBy("adist", "xid")
    return (
        adc.withColumn("rn", F.row_number().over(w_top).cast("long"))
        .where(F.col("rn") <= 5)
        .select("qid", "xid", F.col("adist").cast("long").alias("adist"), "rn")
    )


_OPQ_ORACLE = """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(ROUND(x * 1000) AS BIGINT)) AS v
  FROM embeddings
), pos AS (
  SELECT vec_id, unnest(generate_series(1, 64)) AS p, unnest(v) AS val FROM q
), sp AS (
  SELECT vec_id, ((p - 1) * 37) % 64 + 1 AS q_pos,
         CASE WHEN (p * 2654435761) % 4 < 2 THEN val ELSE -val END AS sval
  FROM pos
), prs AS (
  SELECT vec_id, CAST(FLOOR((q_pos - 1) / 2) AS BIGINT) + 1 AS pk,
         SUM(CASE WHEN (q_pos - 1) % 2 = 0 THEN sval ELSE 0 END) AS a,
         SUM(CASE WHEN (q_pos - 1) % 2 = 1 THEN sval ELSE 0 END) AS b
  FROM sp GROUP BY vec_id, pk
), rot AS (
  SELECT vec_id, 2 * pk - 1 AS p, 3 * a + 4 * b AS val FROM prs
  UNION ALL
  SELECT vec_id, 2 * pk AS p, 3 * b - 4 * a AS val FROM prs
), e AS (
  SELECT vec_id, CAST(FLOOR((p - 1) / 8) AS BIGINT) AS subspace, p, val FROM rot
), cent AS (
  SELECT vec_id AS code, subspace, p, val AS cval FROM e WHERE vec_id < 4
), codes AS (
  SELECT vec_id, subspace, code FROM (
    SELECT e.vec_id, e.subspace, c.code,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id, e.subspace
                              ORDER BY SUM((e.val - c.cval) * (e.val - c.cval)), c.code) AS rn
    FROM e JOIN cent c ON c.subspace = e.subspace AND c.p = e.p
    GROUP BY e.vec_id, e.subspace, c.code
  ) WHERE rn = 1
), lut AS (
  SELECT e.vec_id AS qid, e.subspace, c.code,
         SUM((e.val - c.cval) * (e.val - c.cval)) AS d
  FROM e JOIN cent c ON c.subspace = e.subspace AND c.p = e.p
  WHERE e.vec_id < 50
  GROUP BY e.vec_id, e.subspace, c.code
), adc AS (
  SELECT l.qid, x.vec_id AS xid, SUM(l.d) AS adist
  FROM codes x JOIN lut l ON l.subspace = x.subspace AND l.code = x.code
  WHERE l.qid <> x.vec_id
  GROUP BY l.qid, x.vec_id
)
SELECT qid, xid, CAST(adist AS BIGINT) AS adist, rn FROM (
  SELECT qid, xid, adist,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adist, xid) AS BIGINT) AS rn
  FROM adc
) WHERE rn <= 5
"""


def _bpe_oracle(rounds: int = 4) -> str:
    """DuckDB replay of the distributed BPE merge training: identical
    word-frequency table, identical pair counts, identical
    (count DESC, left, right) argmax per round, identical greedy merge
    via iterated leftmost space-delimited replace."""
    ctes = [
        """w0 AS (
  SELECT ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS s, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY 1
)"""
    ]
    for r in range(1, rounds + 1):
        prev = f"w{r - 1}"
        ctes.append(
            f"""p{r} AS (
  SELECT syms[i] AS l, syms[i + 1] AS r, SUM(freq) AS cnt
  FROM (
    SELECT list_filter(string_split(s, ' '), x -> x <> '') AS syms, freq FROM {prev}
  ), unnest(generate_series(1, len(syms) - 1)) AS t(i)
  WHERE len(syms) > 1
  GROUP BY 1, 2
)"""
        )
        ctes.append(
            f"""b{r} AS (
  SELECT l, r, cnt FROM p{r} ORDER BY cnt DESC, l, r LIMIT 1
)"""
        )
        ctes.append(
            f"""w{r} AS (
  SELECT replace(replace(replace(s,
           ' ' || b.l || ' ' || b.r || ' ', ' ' || b.l || b.r || ' '),
           ' ' || b.l || ' ' || b.r || ' ', ' ' || b.l || b.r || ' '),
           ' ' || b.l || ' ' || b.r || ' ', ' ' || b.l || b.r || ' ') AS s,
         freq
  FROM {prev} CROSS JOIN b{r} b
)"""
        )
    unions = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS round, l AS left_sym, r AS right_sym, CAST(cnt AS BIGINT) AS pair_count FROM b{r}"
        for r in range(1, rounds + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + unions


def _bpe_train_frames(spark: SparkSession, sf_dir: str, rounds: int = 4):
    """Shared BPE training loop: returns (per-round best-rule frames,
    final word -> merged-symbol-string mapping). Per round: one
    vocab-sized aggregation + a broadcast of the single best-pair row;
    the corpus is touched exactly once (the initial word-freq pass)."""
    tokens = load(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("w")
    )
    words = tokens.groupBy("w").agg(F.count("*").alias("freq")).select(
        "w",
        F.concat(F.lit(" "), F.expr(r"regexp_replace(w, '(.)', '$1 ')")).alias("s"),
        "freq",
    ).localCheckpoint()

    bests = []
    for r in range(1, rounds + 1):
        syms = F.expr("filter(split(s, ' '), x -> x <> '')")
        pairs = (
            words.select(syms.alias("syms"), "freq")
            .where(F.size("syms") > 1)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), "
                        "i -> struct(syms[i - 1] AS l, syms[i] AS r))"
                    )
                ).alias("pr"),
                "freq",
            )
            .groupBy("pr.l", "pr.r")
            .agg(F.sum("freq").alias("cnt"))
        )
        best = (
            pairs.orderBy(F.desc("cnt"), "l", "r").limit(1).localCheckpoint()
        )  # 1 row; eager so each round's rule is fixed before the next
        bests.append(
            best.select(
                F.lit(r).cast("long").alias("round"),
                F.col("l").alias("left_sym"),
                F.col("r").alias("right_sym"),
                F.col("cnt").cast("long").alias("pair_count"),
            )
        )
        pat = F.concat(F.lit(" "), F.col("l"), F.lit(" "), F.col("r"), F.lit(" "))
        rep = F.concat(F.lit(" "), F.col("l"), F.col("r"), F.lit(" "))
        merged = words.crossJoin(F.broadcast(best)).select(
            "w",
            F.replace(F.replace(F.replace(F.col("s"), pat, rep), pat, rep), pat, rep).alias("s"),
            "freq",
        )
        words = merged.localCheckpoint()
    return bests, words.select("w", "s")


@register("q_ext_bpe_train", oracle=_bpe_oracle())
def q_ext_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer TRAINING (4 unrolled merge rounds,
    hash-verified): build the word-frequency table (one corpus pass —
    after this everything is vocabulary-bounded, the property that
    makes BPE training tractable at 100 TB), then per round (a) count
    adjacent symbol pairs weighted by word frequency, (b) take the
    argmax pair (count DESC, then lexicographic — the standard
    deterministic tie-break), (c) apply the merge to every word with a
    greedy leftmost left-to-right replace (space-delimited symbol
    strings; the replace is iterated 3x because a consumed separator
    can hide an immediately-adjacent following occurrence — the
    fixpoint equals the greedy merge). The output is the trained
    artifact itself: the merge-rule table (round, left, right, count),
    which the oracle re-derives end-to-end."""
    bests, _ = _bpe_train_frames(spark, sf_dir, rounds=4)
    out = bests[0]
    for b in bests[1:]:
        out = out.unionByName(b)
    return out


def _bpe_encode_oracle(rounds: int = 4) -> str:
    """DuckDB replay of tokenize-with-the-trained-tokenizer: rerun the
    training CTE chain (with the word key carried through), then join
    each document's words against the final word -> symbols mapping and
    count BPE tokens per document."""
    base = _bpe_oracle(rounds)
    # reuse the training CTE chain but carry `w` through every stage
    body = base[len("WITH ") : base.index("\nSELECT CAST(1")]
    body = body.replace(
        "w0 AS (\n  SELECT ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS s,",
        "w0 AS (\n  SELECT w, ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS s,",
    )
    for r in range(1, rounds + 1):
        body = body.replace(
            f"w{r} AS (\n  SELECT replace(replace(replace(s,",
            f"w{r} AS (\n  SELECT w, replace(replace(replace(s,",
        )
    return f"""WITH {body},
dw AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
)
SELECT dw.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(len(list_filter(string_split(m.s, ' '), x -> x <> ''))) AS BIGINT) AS n_bpe_tokens
FROM dw JOIN w{rounds} m ON dw.w = m.w
GROUP BY dw.doc_id
"""


@register("q_ext_bpe_encode", oracle=_bpe_encode_oracle())
def q_ext_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus WITH the trained BPE tokenizer (companion to
    q_ext_bpe_train): after the 4 merge rounds, every distinct word has
    a final symbol decomposition; each document's BPE token count is a
    broadcast join of its words against that vocabulary-sized mapping —
    the exact shape production tokenization has at 100 TB (corpus
    streams once; the trained vocab table broadcasts). Output
    (doc_id, n_words, n_bpe_tokens), hash-verified via a full SQL
    re-derivation of training + encoding."""
    _, mapping = _bpe_train_frames(spark, sf_dir, rounds=4)
    n_syms = F.size(F.expr("filter(split(s, ' '), x -> x <> '')"))
    dw = load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    return (
        dw.join(F.broadcast(mapping), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum(n_syms).cast("long").alias("n_bpe_tokens"),
        )
    )


_OPQ_MULTS = (37, 21, 45, 29)  # odd => each is a bijection mod 64


def _opq_src_sgn(dim: int = 64) -> tuple[list[list[int]], list[list[int]]]:
    """0-based source index + sign per (candidate j, target coord q) of
    the signed permutation: q_pos-1 = ((p-1)*mult) % dim inverted with
    mult^-1 mod dim; the sign formula is keyed by the 1-based SOURCE
    position exactly as the oracles render it."""
    inv = [pow(m, -1, dim) for m in _OPQ_MULTS]
    src_idx = [[(q * inv[j]) % dim for q in range(dim)] for j in range(4)]
    sgn = [
        [1 if ((src_idx[j][q] + 1) * 2654435761 + j * 97) % 4 < 2 else -1 for q in range(dim)]
        for j in range(4)
    ]
    return src_idx, sgn


def _opq_rot_col(j: int, src_idx, sgn, dim: int = 64) -> F.Column:
    """Rotated coordinate array for candidate ``j`` as ONE ``transform``
    over literal coefficient/index arrays (constant-size expression
    tree — the unrolled 4x64 two-term projection breached Janino's
    64 KB codegen limit and ran interpreted). rot[t] = c1*v[i1] +
    c2*v[i2]: the Pythagorean (3,4,5) block mix of the signed
    permutation — even t pairs (t, t+1) as 3a+4b, odd t pairs (t-1, t)
    as 3b-4a. Same integer arithmetic as the exploded-row formulation.

    Rendered as one SQL string => ONE gateway call: building the same
    tree through the Column API cost ~230 ms of py4j round-trips per
    candidate (F.lit materializes 64-int lists one Literal at a time),
    ~2.8 s per build across both OPQ queries (guide §1: plan
    CONSTRUCTION was the cost, not execution)."""
    c1, i1, c2, i2 = [], [], [], []
    for t in range(dim):
        if t % 2 == 0:
            c1.append(3 * sgn[j][t]), i1.append(src_idx[j][t] + 1)
            c2.append(4 * sgn[j][t + 1]), i2.append(src_idx[j][t + 1] + 1)
        else:
            c1.append(3 * sgn[j][t]), i1.append(src_idx[j][t] + 1)
            c2.append(-4 * sgn[j][t - 1]), i2.append(src_idx[j][t - 1] + 1)

    def arr(xs: list[int]) -> str:
        # plain INT literals: element_at(v, idx) requires an INT index,
        # and int coefficients * bigint v widen to bigint exactly as
        # the Column-API formulation did
        return "array(" + ",".join(str(x) for x in xs) + ")"

    return F.expr(
        f"transform(sequence(1, {dim}), t -> "
        f"element_at({arr(c1)}, t) * element_at(v, element_at({arr(i1)}, t)) + "
        f"element_at({arr(c2)}, t) * element_at(v, element_at({arr(i2)}, t)))"
    )


def _opq_sub_slices(rot: DataFrame, nsub: int = 8, sw: int = 8) -> DataFrame:
    """(vec_id, j, subspace, sl): the 4 x nsub subspace slices of the
    rotated arrays, one explode rendered as one SQL string (the
    32-struct Column-API build cost ~0.8 s of py4j round-trips)."""
    structs = ",".join(
        f"struct(cast({j} as bigint) as j, cast({s} as bigint) as subspace, "
        f"slice(_r{j}, {sw * s + 1}, {sw}) as sl)"
        for j in range(4)
        for s in range(nsub)
    )
    return rot.select(
        "vec_id", F.expr(f"explode(array({structs})) as e")
    ).select("vec_id", "e.j", "e.subspace", "e.sl")


def _opq_dists_col(cents_name: str) -> F.Column:
    """Per-code squared distances of this row's ``sl`` slice to each
    centroid slice of array column ``cents_name``, as (d, code)
    structs — array_min gives the (d, code)-ordered argmin, matching
    the oracles' ROW_NUMBER tie-break. One rendered expression."""
    return F.expr(
        f"transform({cents_name}, c -> struct("
        "aggregate(zip_with(sl, c.cs, (x, y) -> (x - y) * (x - y)), "
        "cast(0 as bigint), (acc, x) -> acc + x) as d, "
        "c.code as code))"
    )


_OPQ_TRAINED_ORACLE = f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(ROUND(x * 1000) AS BIGINT)) AS v
  FROM embeddings
), pos AS (
  SELECT vec_id, unnest(generate_series(1, 64)) AS p, unnest(v) AS val FROM q
), cand AS (
  SELECT unnest([0, 1, 2, 3]) AS j, unnest([{", ".join(map(str, _OPQ_MULTS))}]) AS mult
), sp AS (
  SELECT c.j, vec_id, ((p - 1) * c.mult) % 64 + 1 AS q_pos,
         CASE WHEN (p * 2654435761 + c.j * 97) % 4 < 2 THEN val ELSE -val END AS sval
  FROM pos CROSS JOIN cand c
), prs AS (
  SELECT j, vec_id, CAST(FLOOR((q_pos - 1) / 2) AS BIGINT) + 1 AS pk,
         SUM(CASE WHEN (q_pos - 1) % 2 = 0 THEN sval ELSE 0 END) AS a,
         SUM(CASE WHEN (q_pos - 1) % 2 = 1 THEN sval ELSE 0 END) AS b
  FROM sp GROUP BY j, vec_id, pk
), rot AS (
  SELECT j, vec_id, 2 * pk - 1 AS p, 3 * a + 4 * b AS val FROM prs
  UNION ALL
  SELECT j, vec_id, 2 * pk AS p, 3 * b - 4 * a AS val FROM prs
), e AS (
  SELECT j, vec_id, CAST(FLOOR((p - 1) / 8) AS BIGINT) AS subspace, p, val FROM rot
), cent AS (
  SELECT j, vec_id AS code, subspace, p, val AS cval FROM e WHERE vec_id < 4
), dist AS (
  SELECT e.j, e.vec_id, e.subspace, c.code,
         SUM((e.val - c.cval) * (e.val - c.cval)) AS d
  FROM e JOIN cent c ON c.j = e.j AND c.subspace = e.subspace AND c.p = e.p
  GROUP BY e.j, e.vec_id, e.subspace, c.code
), best AS (
  SELECT j, vec_id, subspace, MIN(d) AS bd FROM dist GROUP BY j, vec_id, subspace
), errs AS (
  SELECT j, SUM(bd) AS total_err FROM best GROUP BY j
), chosen AS (
  SELECT j FROM (
    SELECT j, ROW_NUMBER() OVER (ORDER BY total_err, j) AS rn FROM errs
  ) WHERE rn = 1
), codes AS (
  SELECT d.vec_id, d.subspace, d.code FROM (
    SELECT dist.*, ROW_NUMBER() OVER (PARTITION BY j, vec_id, subspace
                                      ORDER BY d, code) AS rn
    FROM dist
  ) d JOIN chosen ch ON d.j = ch.j WHERE d.rn = 1
), lut AS (
  SELECT d.vec_id AS qid, d.subspace, d.code, d.d
  FROM dist d JOIN chosen ch ON d.j = ch.j
  WHERE d.vec_id < 50
), adc AS (
  SELECT l.qid, x.vec_id AS xid, SUM(l.d) AS adist
  FROM codes x JOIN lut l ON l.subspace = x.subspace AND l.code = x.code
  WHERE l.qid <> x.vec_id
  GROUP BY l.qid, x.vec_id
)
SELECT qid, xid, CAST(adist AS BIGINT) AS adist, rn,
       CAST((SELECT j FROM chosen) AS BIGINT) AS rot
FROM (
  SELECT qid, xid, adist,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adist, xid) AS BIGINT) AS rn
  FROM adc
) WHERE rn <= 5
"""


@register("q_ext_ann_opq_trained", oracle=_OPQ_TRAINED_ORACLE)
def q_ext_ann_opq_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINED OPQ: the rotation is OPTIMIZED, not fixed — coordinate
    descent over a discrete family of 4 exactly-orthogonal integer
    rotations (signed permutations with multipliers 37/21/45/29
    composed with the Pythagorean block mix; the family is closed
    under composition, so every candidate is a true orthogonal
    transform). Training = pick the candidate minimizing TOTAL PQ
    quantization error over the corpus (OPQ's objective, restricted to
    a discrete search space so the argmin — and therefore the trained
    index — replays exactly in SQL); then encode and ADC-search under
    the winner. The chosen rotation id is exposed in the output
    (`rot`), so the training outcome itself is hash-verified, not just
    the search results. Plan: the candidate dimension rides the same
    narrow exploded rows (4x a bounded pipeline, corpus-linear); the
    err->argmin table is 4 rows; everything downstream joins against
    it lazily — no driver-side collect of the training result."""
    from pyspark.sql.window import Window

    # r10: array-native formulation (the shape q_ext_ann_opq_alt already
    # used) — rotation as one transform per candidate over literal
    # coefficient arrays, subspace slices in one explode, per-code
    # distances as an array fold against the broadcast seed codebook.
    # Replaces posexplode (64 rows/vector) x broadcast-crossJoin (x4
    # candidates) x two row-stream aggregations; identical integer
    # arithmetic, same (d, code)/(total_err, j) tie-breaks.
    src_idx, sgn = _opq_src_sgn(64)
    qv = (
        load(spark, sf_dir, "embeddings")
        .repartition(spark.sparkContext.defaultParallelism, "vec_id")
        .select(
            "vec_id",
            F.transform("embedding", lambda x: F.round(x * 1000).cast("long")).alias("v"),
        )
    )
    rot = qv.select(
        "vec_id", *[_opq_rot_col(j, src_idx, sgn).alias(f"_r{j}") for j in range(4)]
    )
    sub = _opq_sub_slices(rot)
    cent_g = (
        sub.where(F.col("vec_id") < 4)
        .groupBy("j", "subspace")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("vec_id").alias("code"), F.col("sl").alias("cs")))
            ).alias("cents")
        )
    )
    scored = (
        sub.join(F.broadcast(cent_g), ["j", "subspace"])
        .select("j", "vec_id", "subspace", _opq_dists_col("cents").alias("ds"))
        .localCheckpoint()  # feeds training errs, codes, AND the LUT
    )
    errs = (
        scored.select("j", F.array_min("ds")["d"].alias("bd"))
        .groupBy("j")
        .agg(F.sum("bd").alias("total_err"))
    )
    w_err = Window.orderBy("total_err", "j")
    chosen = (
        errs.withColumn("rn", F.row_number().over(w_err))
        .where(F.col("rn") == 1)
        .select("j")
    )
    picked = scored.join(F.broadcast(chosen), "j")
    codes = picked.select(
        F.col("vec_id").alias("xid"), "subspace", F.array_min("ds")["code"].alias("code")
    )
    lut = (
        picked.where(F.col("vec_id") < 50)
        .select(F.col("vec_id").alias("qid"), "subspace", F.explode("ds").alias("dc"))
        .select("qid", "subspace", F.col("dc.code").alias("code"), F.col("dc.d").alias("d"))
    )
    adc = (
        codes.join(F.broadcast(lut), ["subspace", "code"])
        .where(F.col("qid") != F.col("xid"))
        .groupBy("qid", "xid")
        .agg(F.sum("d").alias("adist"))
    )
    w_top = Window.partitionBy("qid").orderBy("adist", "xid")
    return (
        adc.withColumn("rn", F.row_number().over(w_top).cast("long"))
        .where(F.col("rn") <= 5)
        .select("qid", "xid", F.col("adist").cast("long").alias("adist"), "rn")
        .crossJoin(F.broadcast(chosen.select(F.col("j").cast("long").alias("rot"))))
    )


@register("q_ext_ann_opq", oracle=_OPQ_ORACLE)
def q_ext_ann_opq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPQ-style rotated product quantization (the RR baseline of OPQ:
    apply an orthogonal transform before PQ so subspace energy
    balances; Ge et al.'s alternating optimization replaces the fixed
    rotation with a learned one, same pipeline shape). The rotation is
    a composition of two exactly-orthogonal integer pieces — a
    hash-derived signed permutation (p -> ((p-1)*37) mod 64, sign from
    an index hash) and a blockwise Pythagorean 2x2 rotation
    [[3,4],[-4,3]]/5 applied scaled (distances scale uniformly by 25,
    so code assignment and ADC ranking are EXACTLY those of the true
    rotation while staying in int64) — making rotate -> PQ-encode ->
    ADC-search hash-verifiable end-to-end in SQL. Plan shape is the PQ
    kernel's: the rotation adds one narrow groupBy (pair-mixing) before
    the same broadcast codebook join + (subspace, code) equi-join —
    corpus-linear, no pair product."""
    from pyspark.sql.window import Window

    qv = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: F.round(x * 1000).cast("long")).alias("v"),
    )
    pos = qv.select("vec_id", F.posexplode("v").alias("p0", "val")).select(
        "vec_id", (F.col("p0") + 1).alias("p"), "val"
    )
    sp = pos.select(
        "vec_id",
        (((F.col("p") - 1) * 37) % 64 + 1).alias("q_pos"),
        F.when((F.col("p") * F.lit(2654435761)) % 4 < 2, F.col("val"))
        .otherwise(-F.col("val"))
        .alias("sval"),
    )
    prs = sp.groupBy(
        "vec_id", (F.floor((F.col("q_pos") - 1) / 2) + 1).alias("pk")
    ).agg(
        F.sum(F.when((F.col("q_pos") - 1) % 2 == 0, F.col("sval")).otherwise(0)).alias("a"),
        F.sum(F.when((F.col("q_pos") - 1) % 2 == 1, F.col("sval")).otherwise(0)).alias("b"),
    )
    rot = prs.select(
        "vec_id",
        (2 * F.col("pk") - 1).alias("p"),
        (3 * F.col("a") + 4 * F.col("b")).alias("val"),
    ).unionAll(
        prs.select(
            "vec_id",
            (2 * F.col("pk")).alias("p"),
            (3 * F.col("b") - 4 * F.col("a")).alias("val"),
        )
    )
    e = rot.select(
        "vec_id",
        F.floor((F.col("p") - 1) / 8).cast("long").alias("subspace"),
        "p",
        "val",
    ).localCheckpoint()  # feeds codes AND the query LUT
    cent = e.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("code"), "subspace", "p", F.col("val").alias("cval")
    )
    sq = F.sum((F.col("val") - F.col("cval")) * (F.col("val") - F.col("cval")))
    ranked = (
        e.join(F.broadcast(cent), ["subspace", "p"])
        .groupBy("vec_id", "subspace", "code")
        .agg(sq.alias("d"))
    )
    w_code = Window.partitionBy("vec_id", "subspace").orderBy("d", "code")
    codes = (
        ranked.withColumn("rn", F.row_number().over(w_code))
        .where(F.col("rn") == 1)
        .select("vec_id", "subspace", "code")
    )
    lut = ranked.where(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("qid"), "subspace", "code", "d"
    )
    adc = (
        codes.withColumnRenamed("vec_id", "xid")
        .join(lut, ["subspace", "code"])
        .where(F.col("qid") != F.col("xid"))
        .groupBy("qid", "xid")
        .agg(F.sum("d").alias("adist"))
    )
    w_top = Window.partitionBy("qid").orderBy("adist", "xid")
    return (
        adc.withColumn("rn", F.row_number().over(w_top).cast("long"))
        .where(F.col("rn") <= 5)
        .select("qid", "xid", F.col("adist").cast("long").alias("adist"), "rn")
    )


def _index_quality_oracle(k: int = 5, qlimit: int = 50) -> str:
    """DuckDB replay of the index-quality harness: exact integer-dot
    cosine top-k as ground truth, then PQ-ADC and OPQ-ADC top-k (same
    CTE pipelines as q_ext_ann_pq_adc / q_ext_ann_opq) evaluated with
    recall@k hit counts and lcm-scaled integral MRR, one row per
    index."""
    cos = (
        "CAST(list_sum(list_transform(generate_series(1, 64), i -> a.v[i] * b.v[i])) AS DOUBLE)"
        " / (sqrt(a.nn) * sqrt(b.nn))"
    )
    return f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(ROUND(x * 1000) AS BIGINT)) AS v
  FROM embeddings
), qn AS (
  SELECT vec_id, v, CAST(list_sum(list_transform(v, x -> x * x)) AS DOUBLE) AS nn FROM q
), exact AS (
  SELECT qid, xid, rn FROM (
    SELECT a.vec_id AS qid, b.vec_id AS xid,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY {cos} DESC, b.vec_id) AS rn
    FROM qn a JOIN qn b ON b.vec_id <> a.vec_id
    WHERE a.vec_id < {qlimit}
  ) WHERE rn <= {k}
), pos AS (
  SELECT vec_id, unnest(generate_series(1, 64)) AS p, unnest(v) AS val FROM q
), epq AS (
  SELECT vec_id, CAST(FLOOR((p - 1) / 8) AS BIGINT) AS subspace, p, val FROM pos
), cpq AS (
  SELECT vec_id AS code, subspace, p, val AS cval FROM epq WHERE vec_id < 4
), dpq AS (
  SELECT e.vec_id, e.subspace, c.code, SUM((e.val - c.cval) * (e.val - c.cval)) AS d
  FROM epq e JOIN cpq c ON c.subspace = e.subspace AND c.p = e.p
  GROUP BY e.vec_id, e.subspace, c.code
), xpq AS (
  SELECT vec_id, subspace, code FROM (
    SELECT dpq.*, ROW_NUMBER() OVER (PARTITION BY vec_id, subspace ORDER BY d, code) AS rn
    FROM dpq
  ) WHERE rn = 1
), tpq AS (
  SELECT qid, xid, rn FROM (
    SELECT l.vec_id AS qid, x.vec_id AS xid,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id ORDER BY SUM(l.d), x.vec_id) AS rn
    FROM xpq x JOIN dpq l ON l.subspace = x.subspace AND l.code = x.code
    WHERE l.vec_id < {qlimit} AND l.vec_id <> x.vec_id
    GROUP BY l.vec_id, x.vec_id
  ) WHERE rn <= {k}
), sp AS (
  SELECT vec_id, ((p - 1) * 37) % 64 + 1 AS q_pos,
         CASE WHEN (p * 2654435761) % 4 < 2 THEN val ELSE -val END AS sval
  FROM pos
), prs AS (
  SELECT vec_id, CAST(FLOOR((q_pos - 1) / 2) AS BIGINT) + 1 AS pk,
         SUM(CASE WHEN (q_pos - 1) % 2 = 0 THEN sval ELSE 0 END) AS a,
         SUM(CASE WHEN (q_pos - 1) % 2 = 1 THEN sval ELSE 0 END) AS b
  FROM sp GROUP BY vec_id, pk
), rotc AS (
  SELECT vec_id, 2 * pk - 1 AS p, 3 * a + 4 * b AS val FROM prs
  UNION ALL
  SELECT vec_id, 2 * pk AS p, 3 * b - 4 * a AS val FROM prs
), eo AS (
  SELECT vec_id, CAST(FLOOR((p - 1) / 8) AS BIGINT) AS subspace, p, val FROM rotc
), co AS (
  SELECT vec_id AS code, subspace, p, val AS cval FROM eo WHERE vec_id < 4
), do_ AS (
  SELECT e.vec_id, e.subspace, c.code, SUM((e.val - c.cval) * (e.val - c.cval)) AS d
  FROM eo e JOIN co c ON c.subspace = e.subspace AND c.p = e.p
  GROUP BY e.vec_id, e.subspace, c.code
), xo AS (
  SELECT vec_id, subspace, code FROM (
    SELECT do_.*, ROW_NUMBER() OVER (PARTITION BY vec_id, subspace ORDER BY d, code) AS rn
    FROM do_
  ) WHERE rn = 1
), topq AS (
  SELECT qid, xid, rn FROM (
    SELECT l.vec_id AS qid, x.vec_id AS xid,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id ORDER BY SUM(l.d), x.vec_id) AS rn
    FROM xo x JOIN do_ l ON l.subspace = x.subspace AND l.code = x.code
    WHERE l.vec_id < {qlimit} AND l.vec_id <> x.vec_id
    GROUP BY l.vec_id, x.vec_id
  ) WHERE rn <= {k}
)
SELECT 'pq' AS index_name,
       CAST((SELECT COUNT(DISTINCT qid) FROM exact) AS BIGINT) AS n_queries,
       CAST((SELECT COUNT(*) FROM exact e JOIN tpq a ON e.qid = a.qid AND e.xid = a.xid) AS BIGINT) AS hits_at_5,
       CAST((SELECT COALESCE(SUM(CAST(60 AS BIGINT) // a.rn), 0)
             FROM exact e JOIN tpq a ON e.qid = a.qid AND e.xid = a.xid WHERE e.rn = 1) AS BIGINT) AS mrr_x60
UNION ALL
SELECT 'opq',
       CAST((SELECT COUNT(DISTINCT qid) FROM exact) AS BIGINT),
       CAST((SELECT COUNT(*) FROM exact e JOIN topq a ON e.qid = a.qid AND e.xid = a.xid) AS BIGINT),
       CAST((SELECT COALESCE(SUM(CAST(60 AS BIGINT) // a.rn), 0)
             FROM exact e JOIN topq a ON e.qid = a.qid AND e.xid = a.xid WHERE e.rn = 1) AS BIGINT)
"""


@register("q_ext_ann_index_quality", oracle=_index_quality_oracle())
def q_ext_ann_index_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-quality harness over the compressed-index family: PQ-ADC
    and OPQ-ADC retrieval evaluated against exact integer-dot cosine
    ground truth for a 50-query block — one report row per index with
    recall@5 hit count and lcm-scaled integral MRR, entirely in-engine
    and hash-verified (the comparison a vector-store deployment runs
    before choosing an index layout). Exact side is a broadcast
    50-row query block against the corpus (never n-squared); each
    index side is its production (subspace, code) equi-join pipeline.
    On this fixture's isotropic random embeddings the rotation is
    expected to be ~neutral (there is no subspace-energy imbalance for
    OPQ to fix, and the 4-entry codebooks dominate the error) — the
    harness is the measuring instrument, and its verdict is itself
    hash-verified."""
    from pyspark.sql.window import Window

    k, qlimit = 5, 50
    qv = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: F.round(x * 1000).cast("long")).alias("v"),
    )
    qn = qv.select(
        "vec_id",
        "v",
        F.aggregate(
            F.transform("v", lambda x: x * x), F.lit(0).cast("long"), lambda a, x: a + x
        )
        .cast("double")
        .alias("nn"),
    ).localCheckpoint()

    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    cos = dot.cast("double") / (F.sqrt(F.col("a.nn")) * F.sqrt(F.col("b.nn")))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("xid"))
    exact = (
        F.broadcast(qn.where(F.col("vec_id") < qlimit)).alias("a")
        .join(qn.alias("b"), F.col("b.vec_id") != F.col("a.vec_id"))
        .select(F.col("a.vec_id").alias("qid"), F.col("b.vec_id").alias("xid"), cos.alias("score"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qid", "xid", "rn")
        .localCheckpoint()
    )

    # r10 (guide §2.3/§2.4): BOTH index pipelines fused into ONE
    # array-native pass with an `idx` dimension (0 = pq on the raw
    # array, 1 = opq on the j=0 rotation — _opq_rot_col(0) reproduces
    # the oracle's mult=37 signed permutation + Pythagorean mix
    # exactly). Replaces, PER INDEX, the exploded-row shape: posexplode
    # to 64 rows/vector, a broadcast (subspace, p) join with 4x fanout,
    # a 32-key-per-vector groupBy, its own localCheckpoint, and a
    # row_number argmin window. Now: one 16-struct explode, one
    # broadcast codebook join, one checkpoint, array_min argmins, one
    # ADC aggregate, one report aggregate grouped by index.
    src_idx, sgn = _opq_src_sgn(64)
    rot = qn.select(
        "vec_id", F.col("v").alias("_r0"), _opq_rot_col(0, src_idx, sgn).alias("_r1")
    )
    structs = ",".join(
        f"struct(cast({i} as bigint) as idx, cast({s} as bigint) as subspace, "
        f"slice(_r{i}, {8 * s + 1}, 8) as sl)"
        for i in range(2)
        for s in range(8)
    )
    sub = rot.select("vec_id", F.expr(f"explode(array({structs})) as e")).select(
        "vec_id", "e.idx", "e.subspace", "e.sl"
    )
    cent_g = (
        sub.where(F.col("vec_id") < 4)
        .groupBy("idx", "subspace")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("vec_id").alias("code"), F.col("sl").alias("cs")))
            ).alias("cents")
        )
    )
    scored = (
        sub.join(F.broadcast(cent_g), ["idx", "subspace"])
        .select("idx", "vec_id", "subspace", _opq_dists_col("cents").alias("ds"))
        .localCheckpoint()  # feeds codes AND the LUT
    )
    codes = scored.select(
        "idx", F.col("vec_id").alias("xid"), "subspace", F.array_min("ds")["code"].alias("code")
    )
    lut = (
        scored.where(F.col("vec_id") < qlimit)
        .select("idx", F.col("vec_id").alias("qid"), "subspace", F.explode("ds").alias("dc"))
        .select("idx", "qid", "subspace", F.col("dc.code").alias("code"), F.col("dc.d").alias("d"))
    )
    w_top = Window.partitionBy("idx", "qid").orderBy(F.asc("adist"), F.asc("xid"))
    top = (
        codes.join(F.broadcast(lut), ["idx", "subspace", "code"])
        .where(F.col("qid") != F.col("xid"))
        .groupBy("idx", "qid", "xid")
        .agg(F.sum("d").alias("adist"))
        .withColumn("nrn", F.row_number().over(w_top))
        .where(F.col("nrn") <= k)
        .select("idx", "qid", "xid", "nrn")
    )
    # ONE left join + ONE aggregate produce both report rows (the
    # pre-r10 shape ran three aggregates + two crossJoins per index,
    # executing the un-checkpointed ADC pipeline twice): a left join
    # keeps every (exact x index) row, countDistinct(qid) is nq,
    # count(nrn) the inner-matched pairs, and the rank-1
    # reciprocal-rank sum skips unmatched rows (60 div NULL is NULL).
    names = spark.createDataFrame([(0, "pq"), (1, "opq")], "idx long, index_name string")
    return (
        exact.crossJoin(F.broadcast(names))
        .join(top, ["idx", "qid", "xid"], "left")
        .groupBy("index_name")
        .agg(
            F.countDistinct("qid").cast("long").alias("n_queries"),
            F.count("nrn").cast("long").alias("hits_at_5"),
            F.coalesce(
                F.sum(F.when(F.col("rn") == 1, F.expr("60 div nrn"))), F.lit(0)
            )
            .cast("long")
            .alias("mrr_x60"),
        )
        .select("index_name", "n_queries", "hits_at_5", "mrr_x60")
    )


@register(
    "q_ext_ann_binary",
    oracle="""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(ROUND(x * 1000) AS BIGINT)) AS v
  FROM embeddings
), pos AS (
  SELECT vec_id, unnest(generate_series(1, 64)) AS p, unnest(v) AS val FROM q
), code AS (
  SELECT vec_id,
         SUM(CASE WHEN val > 0 AND p <= 32 THEN CAST(1 AS BIGINT) << (p - 1) ELSE 0 END) AS lo,
         SUM(CASE WHEN val > 0 AND p > 32 THEN CAST(1 AS BIGINT) << (p - 33) ELSE 0 END) AS hi
  FROM pos GROUP BY vec_id
)
SELECT qid, xid, hd, rn FROM (
  SELECT a.vec_id AS qid, b.vec_id AS xid,
         CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS BIGINT) AS hd,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY a.vec_id
           ORDER BY bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)), b.vec_id
         ) AS BIGINT) AS rn
  FROM code a JOIN code b ON a.vec_id < 50 AND b.vec_id <> a.vec_id
) WHERE rn <= 5
""",
)
def q_ext_ann_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary quantization search: each 64-dim embedding collapses to a
    single 64-bit sign code (32× smaller than float32), and neighbors
    rank by Hamming distance — ONE xor + popcount per candidate, the
    cheapest rerank-stage filter modern vector stores run before exact
    rescoring. Codes and distances are pure integer ops, so the top-5
    hash-verifies. Plan: one explode+agg builds codes; the 50-query
    block broadcasts against the code table (8 bytes/vector — a
    billion vectors is 8 GB, broadcastable shard-wise)."""
    from pyspark.sql.window import Window

    q = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: F.round(x * 1000).cast("long")).alias("v"),
    )
    code = (
        q.select("vec_id", F.posexplode("v").alias("p0", "val"))
        .groupBy("vec_id")
        .agg(
            # two 32-bit words: DuckDB's bigint << errors at bit 63, so
            # the shared code layout stays within shift-by-31 per word
            F.sum(
                F.when(
                    (F.col("val") > 0) & (F.col("p0") < 32), F.expr("shiftleft(1L, p0)")
                ).otherwise(F.lit(0).cast("long"))
            ).alias("lo"),
            F.sum(
                F.when(
                    (F.col("val") > 0) & (F.col("p0") >= 32),
                    F.expr("shiftleft(1L, p0 - 32)"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("hi"),
        )
        .localCheckpoint()
    )
    hd = (
        F.bit_count(F.col("a.lo").bitwiseXOR(F.col("b.lo")))
        + F.bit_count(F.col("a.hi").bitwiseXOR(F.col("b.hi")))
    ).cast("long")
    pairs = (
        F.broadcast(code.where(F.col("vec_id") < 50)).alias("a")
        .join(code.alias("b"), F.col("b.vec_id") != F.col("a.vec_id"))
        .select(
            F.col("a.vec_id").alias("qid"),
            F.col("b.vec_id").alias("xid"),
            hd.alias("hd"),
        )
    )
    w = Window.partitionBy("qid").orderBy("hd", "xid")
    return (
        pairs.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 5)
    )


@register(
    "q_ext_simhash_pairs",
    oracle="""
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), h AS (
  SELECT doc_id, CAST(CONCAT('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h FROM t
), v AS (
  SELECT doc_id,
         {votes}
  FROM h GROUP BY doc_id
), s AS (
  SELECT doc_id, {sig} AS simhash FROM v
), stacked AS (
  {bands}
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM stacked a JOIN stacked b
    ON a.band_no = b.band_no AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(bit_count(xor(sa.simhash, sb.simhash)) AS BIGINT) AS hamming
FROM cand c
JOIN s sa ON sa.doc_id = c.doc_a
JOIN s sb ON sb.doc_id = c.doc_b
WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3
""".format(
        votes=",\n         ".join(
            f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
            for b in range(48)
        ),
        sig=" + ".join(
            f"(CASE WHEN v{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
            for b in range(48)
        ),
        bands="\n  UNION ALL ".join(
            f"SELECT doc_id, {n} AS band_no, CAST("
            f"((simhash >> {i * 8}) & 255)"
            f" + (((simhash >> {j * 8}) & 255) * 256)"
            f" + (((simhash >> {k * 8}) & 255) * 65536)"
            f" AS BIGINT) AS key FROM s"
            for n, (i, j, k) in enumerate(_SIMHASH_BLOCK_COMBOS)
        ),
    ),
)
def q_ext_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup PAIRS (completing SimHash as a dedup operator,
    not just a fingerprinter): all pairs at exact Hamming distance
    <= 3 over the deterministic 48-bit signatures, found via
    COMPLETE multi-block banding (Manku/Jain/Sarma, WWW'07): the
    signature splits into 6 byte blocks, and every C(6,3) = 20 choice
    of 3 blocks becomes one 24-bit band key — 3 flips touch at most 3
    blocks, so some untouched 3-subset always matches, making the
    candidate set provably complete at the radius and the OUTPUT
    banding-independent (exactly the hamming <= 3 pair set). The
    r10 sf10 probe retired the old fixed 4x12-bit banding: its 4096-
    key band space gave ~n/4096 docs PER BUCKET, i.e. candidate
    volume ~n^2/4096 (measured 20x on 10x data at 500k docs) —
    24-bit keys hold occupancy near zero so candidates track true
    near-dups, and widening to 4-of-7 blocks at the next corpus
    decade keeps that invariant. One xor+popcount per candidate;
    fully hash-verified."""
    from octopufs_spark.llm import dedup

    sig = dedup.simhash_bands_deterministic(load(spark, sf_dir, "documents")).localCheckpoint()
    block = [
        F.shiftright(F.col("simhash"), 8 * t).bitwiseAND(F.lit(255)) for t in range(6)
    ]
    stacked = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(n).cast("long").alias("band_no"),
                        (block[i] + block[j] * 256 + block[k] * 65536)
                        .cast("long")
                        .alias("key"),
                    )
                    for n, (i, j, k) in enumerate(_SIMHASH_BLOCK_COMBOS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band_no", "bk.key")
    a, b = stacked.alias("a"), stacked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sigs = sig.select("doc_id", "simhash")
    return (
        cand.join(sigs.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha")), "doc_a")
        .join(sigs.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= 3)
    )


_OPQ_ALT_ORACLE = f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(ROUND(x * 1000) AS BIGINT)) AS v
  FROM embeddings
), pos AS (
  SELECT vec_id, unnest(generate_series(1, 64)) AS p, unnest(v) AS val FROM q
), cand AS (
  SELECT unnest([0, 1, 2, 3]) AS j, unnest([{", ".join(map(str, _OPQ_MULTS))}]) AS mult
), sp AS (
  SELECT c.j, vec_id, ((p - 1) * c.mult) % 64 + 1 AS q_pos,
         CASE WHEN (p * 2654435761 + c.j * 97) % 4 < 2 THEN val ELSE -val END AS sval
  FROM pos CROSS JOIN cand c
), prs AS (
  SELECT j, vec_id, CAST(FLOOR((q_pos - 1) / 2) AS BIGINT) + 1 AS pk,
         SUM(CASE WHEN (q_pos - 1) % 2 = 0 THEN sval ELSE 0 END) AS a,
         SUM(CASE WHEN (q_pos - 1) % 2 = 1 THEN sval ELSE 0 END) AS b
  FROM sp GROUP BY j, vec_id, pk
), rot AS (
  SELECT j, vec_id, 2 * pk - 1 AS p, 3 * a + 4 * b AS val FROM prs
  UNION ALL
  SELECT j, vec_id, 2 * pk AS p, 3 * b - 4 * a AS val FROM prs
), e AS (
  SELECT j, vec_id, CAST(FLOOR((p - 1) / 8) AS BIGINT) AS subspace, p, val FROM rot
), cent AS (
  SELECT j, vec_id AS code, subspace, p, val AS cval FROM e WHERE vec_id < 4
), dist AS (
  SELECT e.j, e.vec_id, e.subspace, c.code,
         SUM((e.val - c.cval) * (e.val - c.cval)) AS d
  FROM e JOIN cent c ON c.j = e.j AND c.subspace = e.subspace AND c.p = e.p
  GROUP BY e.j, e.vec_id, e.subspace, c.code
), codes0 AS (
  SELECT j, vec_id, subspace, code FROM (
    SELECT dist.*, ROW_NUMBER() OVER (PARTITION BY j, vec_id, subspace
                                      ORDER BY d, code) AS rn
    FROM dist
  ) WHERE rn = 1
), cent2 AS (
  SELECT e.j, a.code, e.subspace, e.p,
         CAST(FLOOR(CAST(SUM(e.val) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cval
  FROM e JOIN codes0 a
    ON a.j = e.j AND a.vec_id = e.vec_id AND a.subspace = e.subspace
  GROUP BY e.j, a.code, e.subspace, e.p
), dist2 AS (
  SELECT e.j, e.vec_id, e.subspace, c.code,
         SUM((e.val - c.cval) * (e.val - c.cval)) AS d
  FROM e JOIN cent2 c ON c.j = e.j AND c.subspace = e.subspace AND c.p = e.p
  GROUP BY e.j, e.vec_id, e.subspace, c.code
), best2 AS (
  SELECT j, vec_id, subspace, MIN(d) AS bd FROM dist2 GROUP BY j, vec_id, subspace
), errs2 AS (
  SELECT j, SUM(bd) AS total_err FROM best2 GROUP BY j
), chosen AS (
  SELECT j, total_err FROM (
    SELECT j, total_err, ROW_NUMBER() OVER (ORDER BY total_err, j) AS rn FROM errs2
  ) WHERE rn = 1
), codes2 AS (
  SELECT d.vec_id, d.subspace, d.code FROM (
    SELECT dist2.*, ROW_NUMBER() OVER (PARTITION BY j, vec_id, subspace
                                       ORDER BY d, code) AS rn
    FROM dist2
  ) d JOIN chosen ch ON d.j = ch.j WHERE d.rn = 1
), lut AS (
  SELECT d.vec_id AS qid, d.subspace, d.code, d.d
  FROM dist2 d JOIN chosen ch ON d.j = ch.j
  WHERE d.vec_id < 50
), adc AS (
  SELECT l.qid, x.vec_id AS xid, SUM(l.d) AS adist
  FROM codes2 x JOIN lut l ON l.subspace = x.subspace AND l.code = x.code
  WHERE l.qid <> x.vec_id
  GROUP BY l.qid, x.vec_id
)
SELECT qid, xid, CAST(adist AS BIGINT) AS adist, rn,
       CAST((SELECT j FROM chosen) AS BIGINT) AS rot,
       CAST((SELECT total_err FROM chosen) AS BIGINT) AS trained_err
FROM (
  SELECT qid, xid, adist,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adist, xid) AS BIGINT) AS rn
  FROM adc
) WHERE rn <= 5
"""


@register("q_ext_ann_opq_alt", oracle=_OPQ_ALT_ORACLE)
def q_ext_ann_opq_alt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL ALTERNATING OPQ round (Ge et al.'s loop, discretized to
    stay hash-verifiable; completes q_ext_ann_opq_trained, whose
    training step only picked a rotation against the SEED codebook):

    1. rotate the corpus under each of 4 exactly-orthogonal integer
       candidates (signed permutation + Pythagorean block mix);
    2. ASSIGN: per-subspace nearest seed centroid (first 4 vectors);
    3. UPDATE: true k-means centroid refresh — per (candidate, code,
       subspace, coordinate) FLOOR-mean of assigned vectors (exact
       integer arithmetic: sums < 2^53, a single IEEE divide, floor —
       replays bit-identically in DuckDB);
    4. RE-ASSIGN against the refreshed codebook and pick the rotation
       minimizing the POST-UPDATE total quantization error — the
       alternation: rotation conditioned on codes, codes conditioned
       on rotation.

    Both the winning rotation id (`rot`) AND its trained objective
    (`trained_err`) are exposed, so the whole training trajectory is
    value-verified, then ADC top-5 search runs under the trained
    index.

    Plan (r5 verdict #3 shuffle diet — was the suite's heaviest shuffle
    at 77 MB / 4.45M records, sf0.1): the rotation is ARRAY-NATIVE.
    Each multiplier is odd, hence a bijection mod 64 with a static
    integer inverse, so the signed permutation + Pythagorean 2x2 mix
    compiles to 64 pure column expressions over the source array — no
    posexplode, no crossJoin against the candidate table, no unionAll.
    ASSIGN/RE-ASSIGN are inline array_min over a code-ordered broadcast
    codebook (no shuffle join, no row_number window), so the only
    shuffles left are the 4096-key centroid UPDATE (map-side partials),
    the 4-key objective sum, and the final ADC groupBy — all key-bounded
    or corpus-linear with combiners."""
    from pyspark.sql.window import Window

    # Array-native rotation/slicing/distance helpers shared with
    # q_ext_ann_opq_trained (r10): _opq_rot_col renders each candidate's
    # rotation as ONE transform over literal coefficient arrays — the
    # unrolled 4x64 projection breached Janino's 64 KB codegen limit and
    # ran interpreted.
    src_idx, sgn = _opq_src_sgn(64)
    dists_col = _opq_dists_col

    # The pipeline below is map-dominated (the rotation/assign stages are
    # pure column expressions), so parallelism equals input splits; a small
    # single-file corpus must be spread first or one core does everything.
    # The repartition moves only the raw vectors — negligible next to the
    # per-row HOF work it parallelizes — and at scale the source is already
    # multi-split, making this a cheap no-op-sized hash exchange.
    qv = (
        load(spark, sf_dir, "embeddings")
        .repartition(spark.sparkContext.defaultParallelism, "vec_id")
        .select(
            "vec_id",
            F.transform("embedding", lambda x: F.round(x * 1000).cast("long")).alias("v"),
        )
    )
    rot = qv.select(
        "vec_id", *[_opq_rot_col(j, src_idx, sgn).alias(f"_r{j}") for j in range(4)]
    )
    sub = _opq_sub_slices(rot)

    # seed codebook: rotated first-4 vectors, code-ordered per (j, subspace)
    cent_g = (
        sub.where(F.col("vec_id") < 4)
        .groupBy("j", "subspace")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("vec_id").alias("code"), F.col("sl").alias("cs")))
            ).alias("cents")
        )
    )
    assigned = (
        sub.join(F.broadcast(cent_g), ["j", "subspace"])
        .withColumn("code", F.array_min(dists_col("cents"))["code"])
        .drop("cents")
        .localCheckpoint()  # reused by the UPDATE and RE-ASSIGN stages
    )
    # UPDATE: floor-mean per (candidate, code, subspace, coordinate).
    # r10: the 8 coordinate sums are 8 agg columns of ONE 128-key
    # groupBy (sum(sl[i]) == the old per-pi sum since sl is always
    # 8 long) instead of posexplode to 8x rows + a 4096-key groupBy +
    # a re-pack groupBy — one exchange and 8x fewer shuffled rows.
    cent2_g = (
        assigned.groupBy("j", "code", "subspace")
        .agg(
            *[F.sum(F.element_at("sl", i)).alias(f"s{i}") for i in range(1, 9)],
            F.count("*").alias("n"),
        )
        .select(
            "j",
            "subspace",
            F.struct(
                F.col("code"),
                F.array(
                    *[
                        F.floor(F.col(f"s{i}").cast("double") / F.col("n")).cast("long")
                        for i in range(1, 9)
                    ]
                ).alias("cs"),
            ).alias("cc"),
        )
        .groupBy("j", "subspace")
        .agg(F.array_sort(F.collect_list("cc")).alias("cents"))
    )
    # RE-ASSIGN: full per-code distance vector per (j, vec_id, subspace) row
    scored = (
        assigned.join(F.broadcast(cent2_g), ["j", "subspace"])
        .select("j", "vec_id", "subspace", dists_col("cents").alias("ds"))
        .localCheckpoint()  # feeds the argmin, final codes, AND the LUT
    )
    errs2 = (
        scored.select("j", F.array_min("ds")["d"].alias("bd"))
        .groupBy("j")
        .agg(F.sum("bd").alias("total_err"))
    )
    w_err = Window.orderBy("total_err", "j")
    chosen = (
        errs2.withColumn("rn", F.row_number().over(w_err))
        .where(F.col("rn") == 1)
        .select("j", "total_err")
    )
    picked = scored.join(F.broadcast(chosen.select("j")), "j")
    codes2 = picked.select(
        F.col("vec_id").alias("xid"), "subspace", F.array_min("ds")["code"].alias("code")
    )
    lut = (
        picked.where(F.col("vec_id") < 50)
        .select(F.col("vec_id").alias("qid"), "subspace", F.explode("ds").alias("dc"))
        .select("qid", "subspace", F.col("dc.code").alias("code"), F.col("dc.d").alias("d"))
    )
    adc = (
        codes2.join(F.broadcast(lut), ["subspace", "code"])
        .where(F.col("qid") != F.col("xid"))
        .groupBy("qid", "xid")
        .agg(F.sum("d").alias("adist"))
    )
    w_top = Window.partitionBy("qid").orderBy("adist", "xid")
    return (
        adc.withColumn("rn", F.row_number().over(w_top).cast("long"))
        .where(F.col("rn") <= 5)
        .select("qid", "xid", F.col("adist").cast("long").alias("adist"), "rn")
        .crossJoin(
            F.broadcast(
                chosen.select(
                    F.col("j").cast("long").alias("rot"),
                    F.col("total_err").cast("long").alias("trained_err"),
                )
            )
        )
    )


@register(
    "q_ext_dedup_cross_source",
    oracle="""
WITH corpus AS (
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text, 'zcopy' AS source
  FROM documents WHERE doc_id % 50 = 0
), ranked AS (
  SELECT source, doc_id,
         row_number() OVER (
           PARTITION BY md5(text)
           ORDER BY COALESCE(
             CAST(NULLIF(regexp_extract(source, '([0-9]+)', 1), '') AS INT),
             999
           ), doc_id
         ) AS rn
  FROM corpus
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM ranked
GROUP BY source ORDER BY source
""",
)
def q_ext_dedup_cross_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source priority dedup ("keep the curated copy, drop the
    crawl's"): every content digest keeps exactly one row, from the
    highest-priority source. The fixture has no cross-source exact
    dupes at small SFs, so the query plants them (the repo's
    planted-clone contract pattern): every 50th doc is cloned under a
    priority-less source 'zcopy' — a correct implementation keeps all
    originals and drops exactly the clones, which the per-source
    kept/dropped rollup pins value-level. One window shuffle on the
    digest (llm/dedup.py::cross_source_dedup); the rollup combines
    map-side."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "source")
    clones = docs.where(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        "text",
        F.lit("zcopy").alias("source"),
    )
    corpus = docs.unionByName(clones)
    # priority = the number in the source name; sources without one
    # (the planted 'zcopy') sink to the back
    pri = F.coalesce(
        F.nullif(F.regexp_extract("source", r"([0-9]+)", 1), F.lit("")).cast("int"),
        F.lit(999),
    )
    marked = dedup.cross_source_dedup(corpus, pri)
    return (
        marked.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("kept").cast("long")).alias("n_kept"),
            F.sum((~F.col("kept")).cast("long")).alias("n_dropped"),
        )
        .orderBy("source")
    )
