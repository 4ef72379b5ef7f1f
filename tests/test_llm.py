"""Property tests for the weak-oracle LLM operators (MinHash, SimHash,
ANN): plant known duplicates/near-duplicates and assert the candidate
generation finds them. These cover what the DuckDB hash-compare can't —
algorithm-specific outputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from octopufs_spark.llm import dedup, similarity
from octopufs_spark.tables import load
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return load(spark, SF_DIR, "documents").limit(100).cache()


def test_simhash_identical_texts_collide(spark, docs):
    """Same text → same simhash; bands derive from the hash."""
    dup = docs.limit(5).withColumn("doc_id", F.col("doc_id") + 100000)
    out = dedup.simhash_bands(docs.limit(5).union(dup))
    rows = out.collect()
    by_text_groups = {}
    for r in rows:
        by_text_groups.setdefault(r.doc_id % 100000, set()).add(r.simhash)
    assert all(len(s) == 1 for s in by_text_groups.values())
    for r in rows:
        assert len(r.simhash) == 16
        assert r.simhash == r.band0 + r.band1 + r.band2 + r.band3


def test_simhash_near_texts_close(spark):
    """One-token edit flips few simhash bits (Hamming locality)."""
    a = "the quick brown fox jumps over the lazy dog " * 5
    b = a.replace("lazy", "sleepy", 1)
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    h1, h2 = [int(r.simhash, 16) for r in dedup.simhash_bands(df).orderBy("doc_id").collect()]
    hamming = bin(h1 ^ h2).count("1")
    assert hamming <= 16  # near-dup texts stay within banding reach


def test_minhash_finds_planted_near_dup(spark, docs):
    """A doc with one word changed is an LSH candidate of its original."""
    base = docs.where(F.size(F.split("text", " ")) > 20).limit(3)
    edited = base.withColumn("doc_id", F.col("doc_id") + 100000).withColumn(
        "text", F.concat(F.col("text"), F.lit(" extrawordatend"))
    )
    pairs = dedup.minhash_near_dup_pairs(
        base.union(edited).select("doc_id", "text"), threshold=0.5
    ).collect()
    found = {(r.doc_a, r.doc_b) for r in pairs}
    for r in base.select("doc_id").collect():
        assert (r.doc_id, r.doc_id + 100000) in found


def test_adaptive_minhash_params_ladder():
    """r climbs with corpus count; b re-tunes to hold ≥0.95 recall at
    the threshold; a given count always maps to the same params."""
    import math

    for count, want_r in [(1_000, 2), (1_000_000, 2), (1_000_001, 3), (100_000_001, 4)]:
        num_perm, b, r = dedup.adaptive_minhash_params(count, threshold=0.5)
        assert r == want_r
        assert num_perm == b * r
        assert 1 - (1 - 0.5**r) ** b >= 0.95
    assert dedup.adaptive_minhash_params(10**12, threshold=0.5)[2] <= 6
    # determinism
    assert dedup.adaptive_minhash_params(12345) == dedup.adaptive_minhash_params(12345)


def test_minhash_banded_df_finds_planted_near_dup(spark, docs):
    """The pure-DataFrame adaptive-banding path finds planted edits and
    never reports a pair below the exact-Jaccard threshold."""
    base = docs.where(F.size(F.split("text", " ")) > 20).limit(3)
    edited = base.withColumn("doc_id", F.col("doc_id") + 100000).withColumn(
        "text", F.concat(F.col("text"), F.lit(" extrawordatend"))
    )
    pairs = dedup.minhash_near_dup_pairs_df(
        base.union(edited).select("doc_id", "text"),
        threshold=0.5,
        num_perm=None,
        bands=None,
    ).collect()
    found = {(r.doc_a, r.doc_b) for r in pairs}
    for r in base.select("doc_id").collect():
        assert (r.doc_id, r.doc_id + 100000) in found
    assert all(r.jaccard >= 0.5 for r in pairs)  # exact verification holds


def test_ann_lsh_finds_identical_vectors(spark):
    """Duplicated vectors land in the same bucket and rank first."""
    vecs = load(spark, SF_DIR, "embeddings").where(F.col("vec_id") < 20)
    dup = vecs.withColumn("vec_id", F.col("vec_id") + 100000)
    out = similarity.cosine_topk_ann(vecs.union(dup), dim=64, k=1, n_planes=4, seed=42)
    top1 = {r.vec_a: (r.vec_b, r.cos_sim) for r in out.collect()}
    for vid in range(20):
        assert top1[vid][0] == vid + 100000
        assert top1[vid][1] == pytest.approx(1.0, abs=1e-5)


def test_cosine_near_dup_exact_pairs(spark):
    vecs = load(spark, SF_DIR, "embeddings").where(F.col("vec_id") < 10)
    dup = vecs.where(F.col("vec_id") == 3).withColumn("vec_id", F.lit(100003).cast("long"))
    pairs = similarity.cosine_near_dup_pairs(vecs.union(dup), threshold=0.99).collect()
    assert [(r.vec_a, r.vec_b) for r in pairs] == [(3, 100003)]


def test_exact_dedup_counts(spark, docs):
    dup = docs.limit(10).withColumn("doc_id", F.col("doc_id") + 100000)
    groups = dedup.exact_dedup_groups(docs.union(dup))
    assert groups.where(F.col("dup_cnt") == 2).count() == 10
    # survivor is the min id — the original
    survivors = groups.where(F.col("dup_cnt") == 2).select("doc_id").collect()
    assert all(r.doc_id < 100000 for r in survivors)


def test_connected_components_transitive(spark):
    """A~B, B~C, D~E → {A,B,C} and {D,E} with min-id labels."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    got = {r.doc_id: r.cluster_id for r in dedup.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_connected_components_long_chain(spark):
    """Chain of 8 vertices converges within max_iter (diameter rounds)."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "doc_a long, doc_b long"
    )
    got = {r.doc_id: r.cluster_id for r in dedup.connected_components(pairs).collect()}
    assert set(got.values()) == {0}
    assert len(got) == 9


def test_ivf_finds_identical_vectors(spark):
    """Duplicated vectors share a k-means cell and rank first."""
    vecs = load(spark, SF_DIR, "embeddings").where(F.col("vec_id") < 20)
    dup = vecs.withColumn("vec_id", F.col("vec_id") + 100000)
    out = similarity.cosine_topk_ivf(vecs.union(dup), k=1, n_clusters=4, n_probe=2)
    top1 = {r.vec_a: (r.vec_b, r.cos_sim) for r in out.collect()}
    for vid in range(20):
        assert top1[vid][0] == vid + 100000
        assert top1[vid][1] == pytest.approx(1.0, abs=1e-5)


def test_ivf_recall_vs_exact(spark):
    """IVF with generous probes recovers most exact top-1 neighbors."""
    vecs = load(spark, SF_DIR, "embeddings").where(F.col("vec_id") < 60)
    exact = {
        r.vec_a: r.vec_b
        for r in similarity.cosine_topk_exact(vecs, k=1).collect()
    }
    ivf = {
        r.vec_a: r.vec_b
        for r in similarity.cosine_topk_ivf(vecs, k=1, n_clusters=4, n_probe=3).collect()
    }
    hits = sum(1 for a, b in exact.items() if ivf.get(a) == b)
    assert hits / len(exact) >= 0.6  # synthetic uniform vectors: modest recall floor


def test_ngram_jaccard_df_cap(spark):
    """A ubiquitous n-gram (present in every doc) must not create a
    quadratic candidate bucket, and capping it must not change reported
    similarity values: docs pairing through rare n-grams keep their
    exact Jaccard; docs sharing ONLY the ubiquitous phrase drop out."""
    common = "the quick brown fox"  # 4 tokens → ubiquitous 3-grams
    rows = []
    # 30 docs all starting with the common phrase; docs 2i/2i+1 also
    # share a rare distinctive tail.
    for i in range(15):
        tail = f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i}"
        rows.append((2 * i, f"{common} {tail}"))
        rows.append((2 * i + 1, f"{common} {tail} zeta{i}"))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(df, threshold=0.1, max_doc_freq=10**9).collect()
    }
    capped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(df, threshold=0.1, max_doc_freq=5).collect()
    }
    # The planted twin pairs survive the cap (they share rare tail
    # n-grams) with IDENTICAL exact scores.
    for i in range(15):
        pair = (2 * i, 2 * i + 1)
        assert pair in capped
        assert capped[pair] == pytest.approx(uncapped[pair])
    # Cross pairs shared only the ubiquitous phrase: discoverable
    # without the cap, gone with it.
    assert all(a // 2 == b // 2 for (a, b) in capped)
    assert any(a // 2 != b // 2 for (a, b) in uncapped)


def _planted_near_dup_vectors(spark, n_base: int = 60, dim: int = 64, seed: int = 7):
    """n_base random unit-ish vectors plus one noisy near-copy each
    (cos ≥ ~0.99) — the ground-truth near-dup pairs are
    (i, i + 100000)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_base, dim))
    noisy = base + 0.05 * rng.standard_normal((n_base, dim))
    rows = [(i, base[i].tolist()) for i in range(n_base)] + [
        (i + 100000, noisy[i].tolist()) for i in range(n_base)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.mark.slow  # >15 s; excluded from the default driver-window run
def test_semantic_ann_recall(spark):
    """The LSH-candidate near-dup path recovers ≥0.9 of the exact
    composition's planted near-dup pairs at threshold 0.9 — the check
    that licenses q_ext_dedup_semantic_ann as the scale path with the
    exact query as its verifier."""
    vecs = _planted_near_dup_vectors(spark)
    exact = {
        (r.vec_a, r.vec_b)
        for r in similarity.cosine_near_dup_pairs(vecs, threshold=0.9).collect()
    }
    ann = {
        (r.vec_a, r.vec_b)
        for r in similarity.cosine_near_dup_pairs_ann(
            vecs, dim=64, threshold=0.9, n_planes=8, n_tables=8
        ).collect()
    }
    assert exact, "planting failed: no exact near-dup pairs"
    assert ann <= exact  # candidates are scored exactly: no false positives
    assert len(ann & exact) / len(exact) >= 0.9


@pytest.mark.slow  # >50 s; excluded from the default driver-window run
def test_semantic_ann_clusters_match_exact(spark):
    """On planted data the full ANN composition (candidates → connected
    components) yields the same canonical survivors as exact pairing."""
    vecs = _planted_near_dup_vectors(spark, n_base=30)
    exact_pairs = similarity.cosine_near_dup_pairs(vecs, threshold=0.9).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    ann_pairs = similarity.cosine_near_dup_pairs_ann(
        vecs, dim=64, threshold=0.9, n_planes=6, n_tables=12
    ).select(F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b"))
    exact_cl = {
        r.cluster_id for r in dedup.connected_components(exact_pairs, partitions=4).collect()
    }
    ann_cl = {
        r.cluster_id for r in dedup.connected_components(ann_pairs, partitions=4).collect()
    }
    assert len(ann_cl & exact_cl) / len(exact_cl) >= 0.9


def test_scrub_pii_counts_and_redaction(spark):
    """Each PII class is counted and redacted; a digit run inside a URL
    is consumed by the URL pass (counted once); short digit runs stay."""
    from octopufs_spark.llm import text

    df = spark.createDataFrame(
        [(1, "mail a.b-c@mail.ex.com or https://x.y/z?id=9999999 code 1234567 short 123")],
        "doc_id long, text string",
    )
    r = text.scrub_pii(df).collect()[0]
    assert (r.n_email, r.n_url, r.n_id_number) == (1, 1, 1)
    assert r.scrubbed == "mail <EMAIL> or <URL> code <ID_NUMBER> short 123"


def test_broadcast_topk_equals_all_pairs(spark):
    """The broadcast-block exact scorer (registered plan shape: no
    pair-product join) returns exactly the all-pairs self-join's top-k,
    including rounded scores and vec_b tie-breaks."""
    vecs = load(spark, SF_DIR, "embeddings").where(F.col("vec_id") < 40)
    exact = sorted(
        (r.vec_a, r.rn, r.vec_b, r.cos_sim)
        for r in similarity.cosine_topk_exact(vecs, k=5).collect()
    )
    bcast = sorted(
        (r.vec_a, r.rn, r.vec_b, r.cos_sim)
        for r in similarity.cosine_topk_broadcast(vecs, k=5).collect()
    )
    assert bcast == exact


def test_broadcast_pairs_equal_all_pairs(spark):
    """Broadcast-block threshold pairs == all-pairs self-join pairs."""
    vecs = load(spark, SF_DIR, "embeddings").where(F.col("vec_id") < 80)
    exact = {
        (r.vec_a, r.vec_b, r.cos_sim)
        for r in similarity.cosine_near_dup_pairs(vecs, threshold=0.3).collect()
    }
    bcast = {
        (r.vec_a, r.vec_b, r.cos_sim)
        for r in similarity.cosine_near_dup_pairs_broadcast(vecs, threshold=0.3).collect()
    }
    assert exact  # threshold chosen inside the observed sim range
    assert bcast == exact


def test_broadcast_block_cap_enforced(spark):
    """The broadcast side is contractually bounded: exceeding the cap
    raises instead of silently collecting a corpus to the driver."""
    vecs = load(spark, SF_DIR, "embeddings").where(F.col("vec_id") < 40)
    with pytest.raises(ValueError, match="cap"):
        similarity.cosine_topk_broadcast(vecs, k=3, query_cap=10)


def test_chunk_tokens_reassembly(spark):
    """Chunks cover every token; consecutive chunks overlap by exactly
    `overlap` tokens; stride positions are correct."""
    from octopufs_spark.llm import text as llm_text

    toks = [f"t{i}" for i in range(100)]
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    chunks = {
        r.chunk_id: r.chunk_text.split(" ")
        for r in llm_text.chunk_tokens(df, chunk_size=32, overlap=8).collect()
    }
    stride = 32 - 8
    for cid, ctoks in chunks.items():
        start = cid * stride
        assert ctoks == toks[start : start + 32]
    covered = {t for ctoks in chunks.values() for t in ctoks}
    assert covered == set(toks)


def test_compression_ratio_separates_repetitive_text(spark):
    """The zlib repetitiveness signal: pure repetition compresses far
    below unique-ish text; empty text is defined as 1.0."""
    from octopufs_spark.llm import text as llm_text

    rows = [
        (1, "spam " * 400),
        (2, " ".join(f"w{i}x{i * 7 % 113}" for i in range(400))),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.ratio
        for r in df.select(
            "doc_id", llm_text.compression_ratio_udf()("text").alias("ratio")
        ).collect()
    }
    assert got[1] < 0.05          # pure repetition
    assert 0.2 < got[2] <= 1.1    # varied tokens
    assert got[3] == 1.0
    assert got[1] < got[2] / 4    # clear separation


def test_minhash_det_recall_vs_exact(spark):
    """The deterministic MinHash pair set must cover >=90% of the exact
    5-gram Jaccard >= 0.2 pairs (banding can miss boundary pairs, but a
    hash-family regression would crater recall), and every emitted pair
    must BE an exact pair (precision 1.0 by construction: candidates
    are rescored with exact Jaccard)."""
    docs = load(spark, SF_DIR, "documents")
    det = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_near_dup_pairs_deterministic(docs).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_pairs(
            docs, n=5, threshold=0.2, max_doc_freq=1 << 30
        ).select("doc_a", "doc_b").collect()
    }
    assert det <= exact
    assert len(det) >= 0.9 * len(exact)


def test_adaptive_bucket_modulus_ladder(spark):
    """The corpus-count ladder doubles the bucket modulus each time the
    corpus doubles past target density, capping at 2^max_planes —
    exact integers, matching the SQL rendering's semantics."""
    from octopufs_spark.llm.similarity import adaptive_bucket_modulus

    def mod_for(n):
        df = spark.range(n).withColumn("embedding", F.array(F.lit(1.0)))
        return adaptive_bucket_modulus(df, target_bucket=16, max_planes=16).collect()[0][0]

    assert mod_for(10) == 2
    assert mod_for(33) == 4       # > 16*2
    assert mod_for(200) == 16     # sf0.001-ish: the original 4-plane bucketing
    assert mod_for(2000) == 128
    assert mod_for(20000) == 2048  # density 9.8 <= target
    assert mod_for(16 * (1 << 15) + 1) == 65536  # cap at 2^16


def test_det_adaptive_near_dup_honors_id_col(spark):
    """det_lsh_index normalizes any id column to vec_id internally;
    the pair join must keep working — and return the caller's ids —
    for a non-default id_col (regression: a parametrized join column
    broke this, since the index's output name is always vec_id)."""
    v = load(spark, SF_DIR, "embeddings").withColumnRenamed("vec_id", "doc_id")
    pairs = similarity.cosine_near_dup_pairs_det_adaptive(
        v, threshold=0.35, id_col="doc_id"
    ).collect()
    default = similarity.cosine_near_dup_pairs_det_adaptive(
        load(spark, SF_DIR, "embeddings"), threshold=0.35
    ).collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} == {
        (r.doc_a, r.doc_b) for r in default
    }
    assert len(pairs) > 0


def test_cross_source_dedup_priority_and_ties(spark):
    """Cross-source exact dedup keeps the HIGHEST-priority source's
    copy of each content (lowest pri value), breaking ties on min id;
    unique content always survives."""
    rows = spark.createDataFrame(
        [
            (1, "alpha beta", "wiki"),    # pri 0 -> survives
            (2, "alpha beta", "crawl"),   # pri 9 -> dropped
            (3, "alpha beta", "crawl"),   # pri 9 -> dropped
            (4, "gamma", "crawl"),        # unique -> survives
            (5, "delta", "crawl"),        # tie on (pri, ...) vs id 6
            (6, "delta", "crawl"),        # same source: min id wins
        ],
        "doc_id long, text string, source string",
    )
    pri = F.when(F.col("source") == "wiki", F.lit(0)).otherwise(F.lit(9))
    got = {r.doc_id: r.kept for r in dedup.cross_source_dedup(rows, pri).collect()}
    assert got == {1: True, 2: False, 3: False, 4: True, 5: True, 6: False}


def test_cross_source_dedup_null_priority_sinks(spark):
    """A NULL priority must LOSE to any explicit priority (asc would
    otherwise put NULLS FIRST and invert the documented lowest-wins
    rule — r9 ADVICE)."""
    rows = spark.createDataFrame(
        [
            (1, "alpha", "ranked"),    # pri 5 -> survives
            (2, "alpha", "unranked"),  # pri NULL -> dropped
            (3, "beta", "unranked"),   # unique, NULL pri -> survives
        ],
        "doc_id long, text string, source string",
    )
    pri = F.when(F.col("source") == "ranked", F.lit(5)).otherwise(
        F.lit(None).cast("int")
    )
    got = {r.doc_id: r.kept for r in dedup.cross_source_dedup(rows, pri).collect()}
    assert got == {1: True, 2: False, 3: True}


def test_cross_source_dedup_null_text_rows_each_survive(spark):
    """md5(NULL) is NULL; without a per-row digest every missing-text
    row across all sources would collapse into ONE window group and a
    single survivor — silent row drops (r9 ADVICE). Each NULL-text row
    must keep itself, and NULL-text must never dedup against real text."""
    rows = spark.createDataFrame(
        [
            (1, None, "wiki"),
            (2, None, "crawl"),
            (3, None, "crawl"),
            (4, "real text", "wiki"),
            (5, "real text", "crawl"),
        ],
        "doc_id long, text string, source string",
    )
    pri = F.when(F.col("source") == "wiki", F.lit(0)).otherwise(F.lit(9))
    out = dedup.cross_source_dedup(rows, pri).collect()
    got = {r.doc_id: r.kept for r in out}
    assert got == {1: True, 2: True, 3: True, 4: True, 5: False}
    # per-row digests stay distinct across NULL-text rows
    null_digests = {r.h for r in out if r.doc_id in (1, 2, 3)}
    assert len(null_digests) == 3


def test_shared_shingle_sets_preserve_pair_outputs(spark):
    """r10: hashed_ngram_sets is the shared shingle pass for operators
    that need both the exact-Jaccard and DF-MinHash views of a corpus.
    Feeding it via ``sets=`` must reproduce (a) the exact pair set the
    in-house shingling produces BYTE-IDENTICALLY (same hashes, same
    jaccard values — the recall contract's n_exact_pairs depends on
    it), and (b) a MinHash pair set that still satisfies the >=90%
    recall / precision-1.0 contract (the LSH side's shingles change
    from token-filtered to raw-split, which may only move boundary
    candidates)."""
    docs = load(spark, SF_DIR, "documents")
    g = dedup.hashed_ngram_sets(docs, n=5).localCheckpoint()

    own = {
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in dedup.ngram_jaccard_pairs(
            docs, n=5, threshold=0.2, max_doc_freq=1 << 30
        ).collect()
    }
    shared = {
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in dedup.ngram_jaccard_pairs(
            docs, n=5, threshold=0.2, max_doc_freq=1 << 30, sets=g
        ).collect()
    }
    assert shared == own

    exact_pairs = {(a, b) for a, b, _ in own}
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_near_dup_pairs_df(
            docs, threshold=0.2, num_perm=24, bands=24, sets=g
        ).select("doc_a", "doc_b").collect()
    }
    assert lsh <= exact_pairs
    assert len(lsh) >= 0.9 * len(exact_pairs)


def test_hashed_ngram_sets_null_text_yields_empty_set(spark):
    """r10-ADVICE: NGram's Scala UDF aborts on a NULL token array, so
    hashed_ngram_sets must coalesce NULL text to '' — matching
    ngram_sets' empty-set semantics for NULL — before the transform.
    NULL-text rows are supported corpus input (cf. cross_source_dedup)."""
    rows = spark.createDataFrame(
        [(1, None), (2, "a b c d e f"), (3, "")],
        "doc_id int, text string",
    )
    got = {r.doc_id: r.ngrams for r in dedup.hashed_ngram_sets(rows, n=5).collect()}
    ref = {r.doc_id: r.ngrams for r in dedup.ngram_sets(rows, n=5).collect()}
    assert got[1] == [] and got[3] == []
    assert len(got[2]) == len(ref[2]) == 2
