"""Corpus-curation audits and the graph closure a dedup pipeline ends
with: quality-ruleset gating (Gopher-style), cross-source shingle
contamination, train/serve embedding drift, character-entropy bands,
epoch-schedule planning, and connected components over a derived graph.

Everything is exact cross-engine arithmetic: rule thresholds are
rational inequalities kept in integers (``30*nw <= 10*wlen`` instead of
``wlen/nw >= 3.0``), shingles shuffle as 60-bit md5-prefix digests (the
established cross-engine hash trick), entropy terms are quantized at
6 dp before DECIMAL-summing (the transcendental-ulp pattern from
q_ext_dp_release), and drift is reported as the cross-multiplied
integer ``|sum_a*n_b - sum_b*n_a|`` so no division ever happens.

This module registers AFTER trainprep (see queries/__init__.py): the
registry's fresh-first ordering must keep previously unsampled queries
ahead of brand-new ones so the driver's bounded per-round sample drains
the verification ledger before reaching these.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from octopufs_spark.llm import dedup
from octopufs_spark.queries.graph import _EDGES_SQL, _edges
from octopufs_spark.registry import register
from octopufs_spark.tables import load


def _words():
    return F.filter(F.split(F.col("text"), " "), lambda w: w != F.lit(""))


@register(
    "q_ext_gopher_rules",
    oracle="""
WITH w AS (
  SELECT text, list_filter(string_split(text, ' '), x -> x <> '') AS words
  FROM documents
), f AS (
  SELECT CAST(len(words) AS BIGINT) AS nw,
         CAST(list_aggregate(list_transform(words, x -> len(x)), 'sum') AS BIGINT) AS wlen,
         CAST(len(list_filter(words, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS n_alpha,
         (list_contains(words, 'the') AND list_contains(words, 'a')) AS ok_stop,
         NOT contains(text, '...') AS ok_ell
  FROM w
), g AS (
  SELECT nw,
         (nw BETWEEN 20 AND 10000) AS ok_len,
         (30 * nw <= 10 * wlen AND 10 * wlen <= 44 * nw) AS ok_wlen,
         (10 * n_alpha >= 9 * nw) AS ok_alpha,
         ok_stop, ok_ell
  FROM f
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN NOT ok_len THEN 1 ELSE 0 END) AS BIGINT) AS fail_len,
       CAST(SUM(CASE WHEN NOT ok_wlen THEN 1 ELSE 0 END) AS BIGINT) AS fail_wlen,
       CAST(SUM(CASE WHEN NOT ok_alpha THEN 1 ELSE 0 END) AS BIGINT) AS fail_alpha,
       CAST(SUM(CASE WHEN NOT ok_stop THEN 1 ELSE 0 END) AS BIGINT) AS fail_stop,
       CAST(SUM(CASE WHEN NOT ok_ell THEN 1 ELSE 0 END) AS BIGINT) AS fail_ellipsis,
       CAST(SUM(CASE WHEN ok_len AND ok_wlen AND ok_alpha AND ok_stop AND ok_ell
                THEN 1 ELSE 0 END) AS BIGINT) AS pass_all,
       CAST(SUM(CASE WHEN ok_len AND ok_wlen AND ok_alpha AND ok_stop AND ok_ell
                THEN nw ELSE 0 END) AS BIGINT) AS retained_tokens
FROM g
""",
)
def q_ext_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality ruleset (Rae et al. 2021 §A1.1, adapted to
    the fixture corpus): word-count bounds, mean-word-length band,
    alphabetic-word fraction, stopword presence, ellipsis screen — with
    per-rule failure counts, the pass-all survivor count, and the token
    mass the gate retains. Every threshold is an integer rational
    inequality (``3 <= wlen/nw <= 4.4`` becomes ``30*nw <= 10*wlen <=
    44*nw``), so the report is bit-identical across engines and the
    whole audit is one scan + one 1-row aggregate — the cheapest
    possible shape at 100 TB (no shuffle wider than the 8 counters)."""
    docs = load(spark, sf_dir, "documents")
    words = _words()
    nw = F.size(words).cast("long")
    # bigint accumulator: an int one would wrap past 2^31 total chars.
    wlen = F.aggregate(words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w))
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[a-z]"))).cast("long")
    f = docs.select(
        nw.alias("nw"),
        ((nw >= 20) & (nw <= 10000)).alias("ok_len"),
        ((30 * nw <= 10 * wlen) & (10 * wlen <= 44 * nw)).alias("ok_wlen"),
        (10 * n_alpha >= 9 * nw).alias("ok_alpha"),
        (F.array_contains(words, "the") & F.array_contains(words, "a")).alias("ok_stop"),
        (~F.col("text").contains("...")).alias("ok_ell"),
    )
    ok_all = (
        F.col("ok_len") & F.col("ok_wlen") & F.col("ok_alpha") & F.col("ok_stop") & F.col("ok_ell")
    )

    def fails(c: str, alias: str):
        return F.sum(F.when(~F.col(c), 1).otherwise(0)).cast("long").alias(alias)

    return f.agg(
        F.count("*").alias("n_docs"),
        fails("ok_len", "fail_len"),
        fails("ok_wlen", "fail_wlen"),
        fails("ok_alpha", "fail_alpha"),
        fails("ok_stop", "fail_stop"),
        fails("ok_ell", "fail_ellipsis"),
        F.sum(F.when(ok_all, 1).otherwise(0)).cast("long").alias("pass_all"),
        F.sum(F.when(ok_all, F.col("nw")).otherwise(0)).cast("long").alias("retained_tokens"),
    )


@register(
    "q_ext_source_contamination",
    oracle="""
WITH d AS (
  SELECT source, doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
), g AS (
  SELECT source, doc_id,
         list_distinct(CASE WHEN len(toks) >= 5
           THEN list_transform(generate_series(1, len(toks) - 4),
                               i -> array_to_string(toks[i:i+4], ' '))
           ELSE [] END) AS ngrams
  FROM d
), e AS (
  SELECT DISTINCT source,
         CAST(('0x' || substr(md5(unnest(ngrams)), 1, 15)) AS BIGINT) AS ngd
  FROM g
), df AS (
  SELECT ngd, COUNT(*) AS n_src FROM e GROUP BY ngd
), per AS (
  SELECT e.source, COUNT(*) AS n_shingles,
         SUM(CASE WHEN df.n_src >= 2 THEN 1 ELSE 0 END) AS n_shared
  FROM e JOIN df ON e.ngd = df.ngd GROUP BY e.source
), nd AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
)
SELECT per.source, CAST(nd.n_docs AS BIGINT) AS n_docs,
       CAST(per.n_shingles AS BIGINT) AS n_shingles,
       CAST(per.n_shared AS BIGINT) AS n_shared,
       CAST(FLOOR(per.n_shared * 1000.0 / per.n_shingles) AS BIGINT) AS shared_milli
FROM per JOIN nd ON per.source = nd.source
""",
)
def q_ext_source_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination report: for every source, how many of
    its distinct 5-gram shingles also occur in ANOTHER source (the
    signal behind train/eval decontamination and source-exclusivity
    audits). Shingles collapse to 60-bit md5-prefix digests immediately
    after construction, so everything downstream shuffles 8-byte keys
    instead of 40-byte strings — the same thin-shuffle move the banded
    MinHash uses. The corpus is tokenized and shingled exactly ONCE:
    the per-shingle source list (bounded by source count, not corpus
    size) is folded back out with one explode instead of re-joining the
    shingle stream against its own document-frequency aggregate, which
    would rebuild the shingles a second time. Both aggregates are
    hash-partitioned with map-side combine; nothing here is pairwise,
    so cost stays linear in corpus shingle count at 100 TB."""
    docs = load(spark, sf_dir, "documents")
    # Shingle with `source` carried from the ONE scan (r10, guide
    # §2.4/§6): ngram_sets drops source, and the old re-join of a
    # second documents scan on doc_id existed only to re-attach it —
    # one scan + one broadcast join removed, and the scan no longer
    # reads doc_id at all. The per-(source, shingle) distinct is fused
    # into the groupBy as collect_set — one exchange of the digest
    # stream instead of two (partial collect_set dedups map-side, so
    # shuffle bytes match the old distinct's); set-vs-list only changes
    # element order, which size() and explode() don't observe.
    g = dedup.ngram_sets(docs, n=5, id_col="source")
    ngd = F.conv(F.substring(F.md5(F.col("ng")), 1, 15), 16, 10).cast("long")
    # explode_OUTER + isnotnull instead of explode (r11, guide §7.2):
    # on a plain explode, InferFiltersFromGenerate copies the full
    # tokenize→shingle expression into a `size(ngrams) > 0` filter
    # below the Generate, so the most expensive expression in the
    # query ran TWICE per row (seen in plans/r11/..._before.txt op 2-3).
    # The rule skips outer generates; empty-set docs now emit one NULL
    # shingle row that the cheap post-Generate filter drops — identical
    # rows out, one shingle pass instead of two.
    e = (
        g.select("source", F.explode_outer("ngrams").alias("ng"))
        .where(F.col("ng").isNotNull())
        .select("source", ngd.alias("ngd"))
    )
    per_ng = e.groupBy("ngd").agg(F.collect_set("source").alias("srcs"))
    per = (
        per_ng.select(
            F.explode("srcs").alias("source"), (F.size("srcs") >= 2).alias("shared")
        )
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum(F.when(F.col("shared"), 1).otherwise(0)).cast("long").alias("n_shared"),
        )
    )
    nd = docs.groupBy("source").agg(F.count("*").cast("long").alias("n_docs"))
    return per.join(nd, "source").select(
        "source",
        "n_docs",
        "n_shingles",
        "n_shared",
        F.floor(F.col("n_shared") * 1000.0 / F.col("n_shingles")).cast("long").alias("shared_milli"),
    )


@register(
    "q_ext_embedding_drift",
    oracle="""
WITH e AS (
  SELECT vec_id % 2 AS g,
         unnest(generate_series(0, len(embedding) - 1)) AS dim,
         unnest(embedding) AS v
  FROM embeddings
), q AS (
  SELECT g, dim, CAST(ROUND(v * 1000) AS BIGINT) AS milli FROM e
)
SELECT CAST(dim AS BIGINT) AS dim,
       CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       CAST(SUM(CASE WHEN g = 0 THEN milli ELSE 0 END) AS BIGINT) AS sum_a_milli,
       CAST(SUM(CASE WHEN g = 1 THEN milli ELSE 0 END) AS BIGINT) AS sum_b_milli,
       CAST(ABS(SUM(CASE WHEN g = 0 THEN milli ELSE 0 END)
                * SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END)
              - SUM(CASE WHEN g = 1 THEN milli ELSE 0 END)
                * SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END)) AS BIGINT) AS drift_x
FROM q GROUP BY dim
""",
)
def q_ext_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding drift between two corpus halves (id
    parity stands in for the before/after snapshots a drift monitor
    compares). Vectors quantize to milli-units (the established
    integer-exact trick), and the drift statistic is the
    cross-multiplied |sum_a*n_b - sum_b*n_a| — the sign-exact numerator
    of the mean difference with NO division, so the report hashes
    identically across engines. Plan: one posexplode + one 64-key
    hash aggregate with map-side combine; at 100 TB this is a single
    narrow shuffle of (dim, partial sums), the cheapest drift monitor
    a vector pipeline can run."""
    em = load(spark, sf_dir, "embeddings")
    q = em.select(
        (F.col("vec_id") % 2).alias("g"),
        F.posexplode("embedding").alias("dim", "v"),
    ).select("g", "dim", F.round(F.col("v") * 1000).cast("long").alias("milli"))
    sum_a = F.sum(F.when(F.col("g") == 0, F.col("milli")).otherwise(0))
    sum_b = F.sum(F.when(F.col("g") == 1, F.col("milli")).otherwise(0))
    n_a = F.sum(F.when(F.col("g") == 0, 1).otherwise(0))
    n_b = F.sum(F.when(F.col("g") == 1, 1).otherwise(0))
    return q.groupBy(F.col("dim").cast("long").alias("dim")).agg(
        n_a.cast("long").alias("n_a"),
        n_b.cast("long").alias("n_b"),
        sum_a.cast("long").alias("sum_a_milli"),
        sum_b.cast("long").alias("sum_b_milli"),
        F.abs(sum_a * n_b - sum_b * n_a).cast("long").alias("drift_x"),
    )


_ALPHABET = "abcdefghijklmnopqrstuvwxyz "


def _entropy_sql_terms() -> str:
    """DuckDB expression list: per-char counts via the replace trick."""
    cnts = []
    for ch in _ALPHABET:
        lit = "' '" if ch == " " else f"'{ch}'"
        cnts.append(f"len(text) - len(replace(text, {lit}, ''))")
    return ", ".join(f"CAST({c} AS BIGINT) AS c{i}" for i, c in enumerate(cnts))


def _entropy_sql() -> str:
    n = len(_ALPHABET)
    known = " + ".join(f"c{i}" for i in range(n))
    terms = " + ".join(
        f"(CASE WHEN c{i} > 0 THEN CAST(ROUND(CAST(c{i} AS DOUBLE) / known "
        f"* log2(CAST(known AS DOUBLE) / c{i}), 6) AS DECIMAL(18,6)) "
        f"ELSE CAST(0 AS DECIMAL(18,6)) END)"
        for i in range(n)
    )
    return f"""
WITH c AS (
  SELECT {_entropy_sql_terms()} FROM documents
), k AS (
  SELECT *, {known} AS known FROM c
), ent AS (
  SELECT {terms} AS ent FROM k
)
SELECT CAST(FLOOR(ent * 10) AS BIGINT) AS band, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM ent GROUP BY 1
"""


def entropy_bands(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """[band, n_docs]: decibit character-entropy histogram over the
    a-z+space alphabet. Factored out of the registered query so a
    property test can drive it with arbitrary generated strings against
    a pure-Python entropy reference."""
    cnts = [
        (
            F.length(text_col) - F.length(F.replace(F.col(text_col), F.lit(ch), F.lit("")))
        ).cast("long")
        for ch in _ALPHABET
    ]
    known = cnts[0]
    for c in cnts[1:]:
        known = known + c
    k = docs.select(*[c.alias(f"c{i}") for i, c in enumerate(cnts)], known.alias("known"))
    term = None
    for i in range(len(_ALPHABET)):
        ci = F.col(f"c{i}")
        t = F.when(
            ci > 0,
            F.round(
                ci.cast("double") / F.col("known") * F.log2(F.col("known").cast("double") / ci),
                6,
            ).cast("decimal(18,6)"),
        ).otherwise(F.lit(0).cast("decimal(18,6)"))
        term = t if term is None else term + t
    ent = k.select(term.alias("ent"))
    return ent.groupBy(F.floor(F.col("ent") * 10).cast("long").alias("band")).agg(
        F.count("*").cast("long").alias("n_docs")
    )


@register("q_ext_char_entropy", oracle=_entropy_sql())
def q_ext_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-entropy quality bands over the a-z+space alphabet: a
    low-entropy document is boilerplate/repetition, a filter every
    curation stack runs. Per-char counts come from the
    ``len - len(replace)`` trick — 27 fused JVM expressions per row, NO
    explode, so the scan stays one pass with whole-stage codegen and
    the only shuffle is the ~40-key band histogram. Each entropy term
    is quantized at 6 dp before DECIMAL-summing (single log2 calls are
    ulp-stable across engines at that precision — the q_ext_dp_release
    pattern), making the per-doc entropy, its decibit band, and the
    histogram bit-identical in Spark and DuckDB."""
    return entropy_bands(load(spark, sf_dir, "documents"))


@register(
    "q_ext_token_budget_plan",
    oracle="""
WITH per AS (
  SELECT source,
         CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT) AS tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(SUM(tokens) AS BIGINT) AS total, CAST(COUNT(*) AS BIGINT) AS n_src FROM per
), plan AS (
  SELECT source, tokens, (2 * total) // n_src AS share FROM per CROSS JOIN tot
)
SELECT source, tokens,
       CAST(LEAST(4000, (share * 1000) // GREATEST(tokens, 1)) AS BIGINT) AS epochs_milli,
       CAST((tokens * LEAST(4000, (share * 1000) // GREATEST(tokens, 1))) // 1000 AS BIGINT)
         AS effective_tokens
FROM plan
""",
)
def q_ext_token_budget_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-schedule plan for a fixed token budget (2x the corpus,
    split uniformly across sources): each source repeats for
    ``min(4, share/tokens)`` epochs — small sources upsample toward
    their budget share but never past 4 epochs (the repetition cliff
    reported by Muennighoff et al. 2023). All arithmetic is BIGINT
    floor division (milli-epochs), so the plan replays exactly in any
    engine. Shape: per-source aggregate + 1-row broadcast — the
    per-source table is bounded (thousands of sources, not corpus
    rows), so the plan costs one scan at any corpus size."""
    docs = load(spark, sf_dir, "documents")
    ntok = F.size(_words()).cast("long")
    per = docs.groupBy("source").agg(F.sum(ntok).cast("long").alias("tokens"))
    tot = per.agg(
        F.sum("tokens").cast("long").alias("total"), F.count("*").cast("long").alias("n_src")
    )
    # greatest(tokens, 1): a zero-token source must not hit engine-
    # divergent division-by-zero semantics (Spark NULL vs DuckDB error).
    plan = per.crossJoin(F.broadcast(tot)).withColumn(
        "share", F.expr("(2 * total) div n_src")
    )
    epochs = F.least(F.lit(4000), F.expr("(share * 1000) div greatest(tokens, 1)"))
    return plan.select(
        "source",
        "tokens",
        epochs.cast("long").alias("epochs_milli"),
        F.expr("(tokens * least(4000, (share * 1000) div greatest(tokens, 1))) div 1000")
        .cast("long")
        .alias("effective_tokens"),
    )


@register(
    "q_graph_components",
    oracle="WITH RECURSIVE "
    + _EDGES_SQL
    + """,
 sym AS (
   SELECT src, dst FROM edges
   UNION
   SELECT dst AS src, src AS dst FROM edges
 ),
 walk(id, reach) AS (
   SELECT src, src FROM sym
   UNION
   SELECT w.id, s.dst FROM walk w JOIN sym s ON s.src = w.reach
 ),
 comp AS (
   SELECT id, MIN(reach) AS component FROM walk GROUP BY id
 )
SELECT CAST(component AS BIGINT) AS component, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM comp GROUP BY component
""",
)
def q_graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the thresholded nation trade graph
    (the third graph primitive next to PageRank and triangles, and the
    closure step every dedup pipeline ends with). Spark side runs the
    production min-label-propagation loop with pointer doubling
    (llm/dedup.py::connected_components — O(log diameter) rounds, each
    a bounded shuffle on the edge list); the oracle recomputes
    components as MIN(reachable id) via a recursive CTE over the
    symmetric closure. Component ids are min node ids on both sides,
    so the (component, size) histogram hash-compares exactly. The
    expensive part — deriving edges from lineitem⋈orders⋈customer⋈
    supplier — is the distributed join pipeline; the iteration runs on
    the bounded derived graph."""
    edges = _edges(spark, sf_dir)
    pairs = edges.select(F.col("src").alias("doc_a"), F.col("dst").alias("doc_b"))
    cc = dedup.connected_components(pairs)
    return cc.groupBy(F.col("cluster_id").cast("long").alias("component")).agg(
        F.count("*").cast("long").alias("n_nodes")
    )
