"""Training-data curation operators over the documents table.

The pieces a 100 TB pretraining pipeline runs between raw crawl and
tokenization, each with an exact DuckDB oracle: benchmark
decontamination (n-gram overlap against an eval set), deterministic
hash / stratified sampling, unigram-LM surprisal scoring, repetition
metrics, and the composed quality-filter chain. All JVM-side column
ops — no Python UDFs anywhere in this module.

Scale notes are per-query; the common pattern is one narrow projection
off the parquet scan, array ops inside whole-stage codegen, and a
single aggregation or broadcast join per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from octopufs_spark.registry import register
from octopufs_spark.tables import load

# Shared tokenization: split on single spaces, drop empties. DuckDB
# twin: list_filter(string_split(text, ' '), x -> x <> '').
def _words(col: str = "text"):
    return F.filter(F.split(F.col(col), " "), lambda x: x != "")


SQL_WORDS = "list_filter(string_split(text, ' '), x -> x <> '')"


@register(
    "q_ext_decontaminate",
    oracle=f"""
WITH d AS (
  SELECT doc_id, source, {SQL_WORDS} AS words FROM documents
), n AS (
  SELECT doc_id, source,
         list_distinct([array_to_string(words[i:i+7], ' ')
                        FOR i IN range(1, greatest(len(words) - 6, 1))]) AS ngs
  FROM d
), e AS (
  SELECT DISTINCT unnest(ngs) AS ng FROM n WHERE source = 'src0'
), t AS (
  SELECT doc_id, unnest(ngs) AS ng FROM n WHERE source <> 'src0'
)
SELECT t.doc_id, COUNT(*) AS shared_ngrams
FROM t JOIN e USING (ng)
GROUP BY t.doc_id
""",
)
def q_ext_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any word
    8-gram with the eval set (source='src0' stands in for a benchmark).

    The standard n-gram-overlap decontamination used on pretraining
    corpora. Scale shape: the eval side is distinct 8-grams of the
    *benchmark* (bounded — benchmarks are MBs, not TBs), so it
    broadcasts; the training side streams through one explode + one
    broadcast hash join + one groupBy on doc_id. No shuffle touches
    the full 8-gram stream except the final per-doc count.
    """
    from pyspark.ml.feature import NGram

    docs = load(spark, sf_dir, "documents")
    # compiled-Scala sliding window (space-joined, empty under 8 words)
    # — 5x faster than an interpreted transform/slice lambda per
    # position, identical output
    w = docs.select("doc_id", "source", _words().alias("words"))
    grams = NGram(n=8, inputCol="words", outputCol="raw_ngs").transform(w)
    d = grams.select("doc_id", "source", F.array_distinct("raw_ngs").alias("ngs"))
    eval_ngs = (
        d.where(F.col("source") == "src0").select(F.explode("ngs").alias("ng")).distinct()
    )
    train = d.where(F.col("source") != "src0").select("doc_id", F.explode("ngs").alias("ng"))
    return (
        train.join(F.broadcast(eval_ngs), "ng")
        .groupBy("doc_id")
        .agg(F.count("*").alias("shared_ngrams"))
    )


@register(
    "q_ext_sample_hash",
    oracle="""
SELECT doc_id, lang, source FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '34'
""",
)
def q_ext_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~20% corpus sample: keep docs whose md5(doc_id)
    hex prefix falls under 0x34/0x100.

    The reproducible alternative to rand()-sampling: stable across
    engines, runs, and partitionings, so downstream stages can re-derive
    the same subset. Pure per-row predicate — no shuffle, no state;
    at 100 TB this is a filter pushed against the scan."""
    docs = load(spark, sf_dir, "documents")
    digest = F.md5(F.col("doc_id").cast("string"))
    return docs.where(F.substring(digest, 1, 2) < "34").select("doc_id", "lang", "source")


@register(
    "q_ext_sample_stratified",
    oracle="""
WITH r AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
)
SELECT doc_id, lang, rn FROM r WHERE rn <= 50
""",
)
def q_ext_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sample: 50 docs per language, chosen by
    md5 order (a seeded shuffle both engines reproduce bit-identically).

    One shuffle on the stratum key. At 100 TB: strata counts are
    bounded (languages, sources), per-stratum top-k via window is the
    right shape; for heavy skew (one lang = 90% of corpus) switch the
    rank to a pre-filter on the md5 prefix (q_ext_sample_hash shape)
    sized per stratum, which needs no global window at all."""
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 50)
    )


@register(
    "q_ext_surprisal",
    oracle=f"""
WITH w AS (
  SELECT doc_id, unnest({SQL_WORDS}) AS word FROM documents
), f AS (
  SELECT word, COUNT(*) AS cnt FROM w GROUP BY word
), t AS (
  SELECT SUM(cnt) AS total FROM f
), s AS (
  SELECT w.doc_id,
         CAST(ROUND(-LN(CAST(f.cnt AS DOUBLE) / t.total), 6) AS DECIMAL(28,6)) AS sp
  FROM w JOIN f USING (word) CROSS JOIN t
)
SELECT doc_id,
       ROUND(CAST(SUM(sp) AS DOUBLE) / COUNT(*), 6) AS avg_surprisal,
       COUNT(*) AS n_words
FROM s GROUP BY doc_id
""",
)
def q_ext_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality score: mean per-word surprisal −ln p(word)
    under the corpus's own unigram distribution (the cheap stand-in for
    perplexity filtering when no external LM is available).

    Two aggregations: corpus word counts, then a join back to the word
    stream. The frequency table is vocabulary-sized — bounded and
    broadcast here; at 100 TB raw-token vocabularies get heavy-hitter
    capped (min count) first, or the join falls back to a hash shuffle
    on word, which is still linear. Per-word surprisal is quantized to
    6 decimals and summed as DECIMAL so the cross-engine result is
    order-independent and bit-identical (9-decimal quantization sat
    within libm's ln() ulp spread — a boundary word at sf0.1 rounded
    differently per engine; 6 decimals puts the boundary 1000× further
    than any cross-engine ln/division drift)."""
    docs = load(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.explode(_words()).alias("word"))
    freq = words.groupBy("word").agg(F.count("*").alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("total"))
    sp = F.round(
        -F.log(F.col("cnt").cast("double") / F.col("total")), 6
    ).cast("decimal(28,6)")
    scored = (
        words.join(F.broadcast(freq), "word")
        .crossJoin(F.broadcast(total))
        .select("doc_id", sp.alias("sp"))
    )
    return scored.groupBy("doc_id").agg(
        F.round(F.sum("sp").cast("double") / F.count("*"), 6).alias("avg_surprisal"),
        F.count("*").alias("n_words"),
    )


@register(
    "q_ext_surprisal_bigram",
    oracle=f"""
WITH w AS (
  SELECT doc_id,
         unnest({SQL_WORDS}) AS word,
         unnest(range(len({SQL_WORDS}))) AS pos
  FROM documents
), lagged AS (
  SELECT doc_id, word,
         LAG(word) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM w
), b AS (
  SELECT prev, word, COUNT(*) AS c2 FROM lagged WHERE prev IS NOT NULL GROUP BY 1, 2
), ctx AS (
  SELECT prev, SUM(c2) AS c1 FROM b GROUP BY prev
), s AS (
  SELECT l.doc_id,
         CAST(ROUND(-LN(CAST(b.c2 AS DOUBLE) / ctx.c1), 6) AS DECIMAL(28,6)) AS sp
  FROM lagged l
  JOIN b ON l.prev = b.prev AND l.word = b.word
  JOIN ctx ON l.prev = ctx.prev
)
SELECT doc_id,
       ROUND(CAST(SUM(sp) AS DOUBLE) / COUNT(*), 6) AS avg_bigram_surprisal,
       COUNT(*) AS n_bigrams
FROM s GROUP BY doc_id
""",
)
def q_ext_surprisal_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM surprisal: mean −ln P(wᵢ | wᵢ₋₁) per document under
    the corpus's own bigram model — one order deeper than
    q_ext_surprisal's unigram stand-in, the closest SQL-expressible
    approximation of LM perplexity filtering. Token stream (one
    posexplode, no shuffle) → per-doc lag window (one doc_id shuffle)
    → corpus bigram/context counts (map-side combinable) → join back.
    The bigram table broadcasts at fixture scale; at raw-crawl scale
    it hash-joins on the context word, still linear. Same 6-decimal
    decimal quantization as the unigram version (libm-boundary-safe)."""
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    w = docs.select("doc_id", F.posexplode(_words()).alias("pos", "word"))
    lagged = w.select(
        "doc_id",
        "word",
        F.lag("word").over(Window.partitionBy("doc_id").orderBy("pos")).alias("prev"),
    ).where(F.col("prev").isNotNull())
    b = lagged.groupBy("prev", "word").agg(F.count("*").alias("c2"))
    ctx = b.groupBy("prev").agg(F.sum("c2").alias("c1"))
    sp = F.round(-F.log(F.col("c2").cast("double") / F.col("c1")), 6).cast(
        "decimal(28,6)"
    )
    scored = (
        lagged.join(F.broadcast(b), ["prev", "word"])
        .join(F.broadcast(ctx), "prev")
        .select("doc_id", sp.alias("sp"))
    )
    return scored.groupBy("doc_id").agg(
        F.round(F.sum("sp").cast("double") / F.count("*"), 6).alias(
            "avg_bigram_surprisal"
        ),
        F.count("*").alias("n_bigrams"),
    )


@register(
    "q_ext_repetition",
    oracle=f"""
WITH w AS (
  SELECT doc_id, unnest({SQL_WORDS}) AS word FROM documents
), c AS (
  SELECT doc_id, word, COUNT(*) AS c FROM w GROUP BY doc_id, word
)
SELECT doc_id,
       CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_word_ratio,
       1 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS dup_ratio,
       CAST(SUM(c) AS BIGINT) AS n_words
FROM c GROUP BY doc_id
""",
)
def q_ext_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality metrics (Gopher-style filters): most-frequent
    word's share of the doc, and the duplicate-word fraction.

    Shuffle on (doc_id, word) then doc_id — both linear in corpus size
    and map-side combinable. Exact long/long→double divisions, no
    rounding needed for cross-engine identity."""
    docs = load(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.explode(_words()).alias("word"))
    c = words.groupBy("doc_id", "word").agg(F.count("*").alias("c"))
    return c.groupBy("doc_id").agg(
        (F.max("c").cast("double") / F.sum("c").cast("double")).alias("top_word_ratio"),
        (F.lit(1) - F.count("*").cast("double") / F.sum("c").cast("double")).alias("dup_ratio"),
        F.sum("c").cast("long").alias("n_words"),
    )


@register(
    "q_ext_filter_chain",
    oracle=f"""
WITH s AS (
  SELECT doc_id, lang, {SQL_WORDS} AS words FROM documents
), m AS (
  SELECT doc_id, lang, len(words) AS n_words,
         1 - CAST(len(list_distinct(words)) AS DOUBLE) / len(words) AS dup_ratio
  FROM s WHERE len(words) > 0
)
SELECT doc_id, n_words, dup_ratio FROM m
WHERE lang = 'en' AND n_words BETWEEN 30 AND 120 AND dup_ratio < 0.6
""",
)
def q_ext_filter_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed quality-filter chain: language gate + length bounds +
    repetition cap, returning survivors with their stats — the single
    fused pass a curation pipeline actually runs (each metric computed
    once, all predicates in one codegen stage, no intermediate
    materialization).

    Entirely per-row array math over one scan; the lang equality and
    length bounds are plain predicates Catalyst pushes toward the
    scan."""
    docs = load(spark, sf_dir, "documents")
    words = _words()
    m = docs.select(
        "doc_id",
        "lang",
        F.size(words).alias("n_words"),
        (
            F.lit(1)
            - F.size(F.array_distinct(words)).cast("double") / F.size(words)
        ).alias("dup_ratio"),
    ).where(F.size(words) > 0)
    return m.where(
        (F.col("lang") == "en")
        & F.col("n_words").between(30, 120)
        & (F.col("dup_ratio") < 0.6)
    ).select("doc_id", "n_words", "dup_ratio")


@register(
    "q_ext_fuzzy_levenshtein",
    oracle="""
WITH d AS (
  SELECT doc_id, lang, substr(text, 1, 40) AS prefix,
         n_chars // 100 AS len_bucket
  FROM documents WHERE doc_id < 150
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.prefix, b.prefix) AS BIGINT) AS edit_dist
FROM d a JOIN d b
  ON a.lang = b.lang AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id
WHERE levenshtein(a.prefix, b.prefix) <= 20
""",
)
def q_ext_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy matching: Levenshtein distance on 40-char prefixes,
    candidates restricted to (lang, length-bucket) blocks — the classic
    blocking+edit-distance near-dup pass for short fields (titles,
    names, URLs).

    Blocking is what makes this scale: the quadratic edit-distance
    work happens only inside blocks (equi-join keys → hash join), never
    across the corpus. Edit distance itself is exact and
    engine-portable. At 100 TB block keys need cardinality tuning
    (add a prefix-hash char to split hot blocks) — same skew playbook
    as the n-gram inverted index."""
    d = (
        load(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 150)
        .select(
            "doc_id",
            "lang",
            F.substring("text", 1, 40).alias("prefix"),
            # integer floor division on BOTH sides — a double divide +
            # cast truncates in Spark but rounds in DuckDB
            F.floor(F.col("n_chars") / 100).cast("long").alias("len_bucket"),
        )
    )
    a, b = d.alias("a"), d.alias("b")
    pairs = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.len_bucket") == F.col("b.len_bucket"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.levenshtein(F.col("a.prefix"), F.col("b.prefix")).cast("long").alias("edit_dist"),
    )
    return pairs.where(F.col("edit_dist") <= 20)


@register(
    "q_ext_dedup_lines",
    oracle="""
WITH d AS (
  SELECT doc_id, string_split(text, '. ') AS parts FROM documents WHERE doc_id < 300
), l AS (
  SELECT doc_id,
         unnest(generate_series(1, len(parts))) AS pos,
         unnest(parts) AS line
  FROM d
), f AS (
  SELECT line, MIN(ROW(doc_id, pos)) AS first_occ FROM l GROUP BY line
), kept AS (
  SELECT l.doc_id, l.pos, l.line
  FROM l JOIN f ON l.line = f.line
  WHERE ROW(l.doc_id, l.pos) = f.first_occ
)
SELECT d.doc_id,
       COALESCE(string_agg(kept.line, '. ' ORDER BY kept.pos), '') AS clean_text,
       CAST(COUNT(kept.pos) AS BIGINT) AS n_kept,
       CAST(len(d.parts) - COUNT(kept.pos) AS BIGINT) AS n_dropped
FROM d LEFT JOIN kept ON d.doc_id = kept.doc_id
GROUP BY d.doc_id, len(d.parts)
""",
)
def q_ext_dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level dedup: split documents into sentences, drop
    every sentence already seen earlier in the corpus (first occurrence
    = lowest (doc_id, pos) wins — deterministic), and reassemble the
    surviving text in original order. Unlike whole-document dedup this
    kills boilerplate (headers, navigation, license blurbs) embedded in
    otherwise-unique pages — the C4/RefinedWeb recipe. One explode +
    one line-hash aggregation + one re-group: every step shuffles on
    bounded keys, corpus-linear at 100 TB."""
    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    lines = docs.select(
        "doc_id",
        F.posexplode(F.split("text", "\\. ")).alias("pos0", "line"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "line")
    firsts = lines.groupBy("line").agg(F.min(F.struct("doc_id", "pos")).alias("first_occ"))
    kept = (
        lines.join(firsts, "line")
        .where(F.struct("doc_id", "pos") == F.col("first_occ"))
        .select("doc_id", "pos", "line")
    )
    n_parts = docs.select("doc_id", F.size(F.split("text", "\\. ")).alias("n_parts"))
    reassembled = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))), lambda s: s["line"]
            ),
            ". ",
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )
    return (
        n_parts.join(reassembled, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            (F.col("n_parts") - F.coalesce("n_kept", F.lit(0))).cast("long").alias("n_dropped"),
        )
    )


@register(
    "q_ext_seq_pack",
    oracle="""
WITH t AS (
  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tok FROM documents
), c AS (
  SELECT doc_id, lang, n_tok,
         SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS before_tok
  FROM t
)
SELECT lang,
       CAST(FLOOR(COALESCE(before_tok, 0) / 512) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS bin_tokens
FROM c GROUP BY 1, 2
""",
)
def q_ext_seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training batches: documents are packed
    contiguously (per language, in doc_id order) into 512-token bins —
    bin id = floor(cumulative tokens before doc / 512), the
    deterministic contiguous-fill strategy. Output is the per-bin
    manifest (doc count, token load) a dataloader consumes. The window
    partitions by lang, so no global sort: each language packs
    independently — at 100 TB the partition key becomes (lang, shard)
    with identical semantics per shard."""
    docs = load(spark, sf_dir, "documents")
    t = docs.select("doc_id", "lang", F.size(F.split("text", " ")).alias("n_tok"))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = t.withColumn("before_tok", F.sum("n_tok").over(w))
    return (
        c.groupBy(
            "lang",
            F.floor(F.coalesce(F.col("before_tok"), F.lit(0)) / 512).cast("long").alias("bin"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("bin_tokens"),
        )
    )
