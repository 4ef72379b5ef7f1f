"""Text-analysis operators for training-data pipelines.

All hot-path logic uses JVM-side built-ins (split / filter / transform
/ md5) so it stays inside whole-stage codegen; the only Python is the
clean_text Pandas UDF which exists to exercise the vectorized UDF
surface.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# Tiny embedded stopword list for the language-ID heuristic. At real
# scale this would be a broadcast per-language table; the heuristic
# structure (token-set membership ratio) is the same.
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in")


def tokens_col(text_col: str = "text") -> Column:
    """Whitespace tokenization (keeps empty tokens, like SQL split)."""
    return F.split(F.col(text_col), " ")


def stopword_ratio(text_col: str = "text") -> Column:
    """Fraction of tokens that are English stopwords — language-ID signal."""
    toks = tokens_col(text_col)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
    return n_stop.cast("double") / F.size(toks)


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram-free heuristic language ID: stopword-ratio thresholding.

    Adds ``en_ratio`` (double) and ``lang_pred`` ('en' | 'other').
    """
    ratio = stopword_ratio(text_col)
    return df.withColumn("en_ratio", ratio).withColumn(
        "lang_pred", F.when(F.col("en_ratio") > 0.05, "en").otherwise("other")
    )


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_tokens, n_unique_tokens, type-token ratio (all exact)."""
    toks = tokens_col(text_col)
    return (
        df.withColumn("n_tokens", F.size(toks).cast("long"))
        .withColumn("n_unique_tokens", F.size(F.array_distinct(toks)).cast("long"))
        .withColumn(
            "ttr", F.col("n_unique_tokens").cast("double") / F.col("n_tokens")
        )
    )


def punct_ratio(text_col: str = "text") -> Column:
    """Punctuation density: punctuation chars / total chars. High
    values flag boilerplate/markup-heavy documents."""
    total = F.length(F.col(text_col))
    no_punct = F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    return (total - no_punct).cast("double") / total


def quality_score(df: DataFrame, text_col: str = "text", chars_col: str = "n_chars") -> DataFrame:
    """Deterministic quality score from length / token / punctuation /
    stopword signals (the standard pre-classifier quality gates):

    score = 0.4·min(n_chars/400, 1) + 0.4·min(n_tokens/80, 1)
          + 0.1·(1 - punct_ratio) + 0.1·min(stop_ratio/0.05, 1)

    Exact double arithmetic so it is oracle-checkable; a learned
    classifier would slot in behind the same column contract.
    """
    n_tokens = F.size(tokens_col(text_col)).cast("long")
    len_score = F.least(F.col(chars_col).cast("double") / 400.0, F.lit(1.0))
    tok_score = F.least(n_tokens.cast("double") / 80.0, F.lit(1.0))
    p_ratio = punct_ratio(text_col)
    s_ratio = stopword_ratio(text_col)
    return (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("len_score", len_score)
        .withColumn("punct_ratio", p_ratio)
        .withColumn("stop_ratio", s_ratio)
        .withColumn(
            "quality",
            0.4 * len_score
            + 0.4 * tok_score
            + 0.1 * (F.lit(1.0) - p_ratio)
            + 0.1 * F.least(s_ratio / 0.05, F.lit(1.0)),
        )
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-insensitive content fingerprint: md5 of sorted distinct tokens.

    Robust to token reordering; the basis for near-dup canonicalization.
    Adds ``fp`` (hex string).
    """
    toks = tokens_col(text_col)
    return df.withColumn(
        "fp", F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))))
    )


PII_PATTERNS = {
    # ASCII-only patterns chosen to mean the same thing under Java
    # regex (Spark) and RE2 (DuckDB): no lookaround, no backrefs.
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^ ]+",
    "id_number": r"[0-9]{6,}",
}


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails, URLs and long digit runs from a text column —
    the standard pre-training privacy pass (C4/Dolma-style rules as
    regex classes). Adds ``scrubbed`` plus an ``n_<class>`` count per
    class, all JVM-side (regexp_extract_all / regexp_replace in one
    codegen stage, no Python).

    Order matters: URLs are redacted before id_numbers so a digit run
    inside a URL counts once as URL, not again as an id; counts are
    taken on the same partially-scrubbed intermediate the replacement
    sees, keeping counts and redactions consistent.
    """
    out = df
    scrubbed = F.col(text_col)
    for name, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{name}", F.size(F.regexp_extract_all(scrubbed, F.lit(pat), F.lit(0))).cast("long")
        )
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{name.upper()}>")
    return out.withColumn("scrubbed", scrubbed)


def compression_ratio_udf(level: int = 6):
    """Arrow-batched zlib compression ratio (compressed/raw bytes) —
    the RefinedWeb/Dolma-style repetitiveness signal: highly templated
    or repeated text compresses far below ~0.4 while natural prose
    sits around 0.5-0.7. Stdlib zlib, no external deps; Pandas UDF
    because the codec is Python-side by nature (one C call per doc,
    not per char — cheap relative to Arrow transfer).

    Built lazily like ``clean_text_udf`` (module-scope ``@pandas_udf``
    needs an active session at import time).
    """

    @pandas_udf("double")
    def udf(s: pd.Series) -> pd.Series:
        import zlib

        def ratio(t: str) -> float:
            raw = t.encode()
            if not raw:
                return 1.0
            return len(zlib.compress(raw, level)) / len(raw)

        return s.map(ratio)

    return udf


def clean_text_udf():
    """Arrow-batched text normalization: lowercase + strip non-[a-z0-9 ].

    Kept as a Pandas UDF deliberately (the UDF-surface contract);
    equivalent SQL: regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g').
    Built lazily — module-scope ``@pandas_udf`` needs an active session
    at import time.
    """

    @pandas_udf("string")
    def udf(s: pd.Series) -> pd.Series:
        return s.str.lower().str.replace(r"[^a-z0-9 ]", "", regex=True)

    return udf


def chunk_tokens(
    df: DataFrame,
    chunk_size: int = 32,
    overlap: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping token windows — the context-
    window chunking every training/RAG pipeline runs before embedding.

    One row per chunk: [id, chunk_id, chunk_text, n_chunk_tokens].
    Stride = chunk_size - overlap; the final partial window is kept.
    Pure JVM (split + sequence + slice + concat_ws), cardinality grows
    ~n_tokens/stride per doc, partitioning follows the input so the
    explode never shuffles.
    """
    stride = chunk_size - overlap
    toks = F.split(F.col(text_col), " ")
    starts = F.sequence(F.lit(1), F.greatest(F.size(toks) - overlap, F.lit(1)), F.lit(stride))
    chunks = F.transform(starts, lambda s: F.slice(toks, s, chunk_size))
    exploded = df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_id", "_chunk_toks")
    )
    return exploded.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.concat_ws(" ", "_chunk_toks").alias("chunk_text"),
        F.size("_chunk_toks").cast("long").alias("n_chunk_tokens"),
    )
