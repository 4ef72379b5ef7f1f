"""Write-audit-publish and tag-pinned retention queries: the manifest
table's staged-snapshot workflow (Iceberg WAP model) and immutable
named tags that vacuum must respect.

Both register with full DuckDB oracles recomputing every phase's
expected aggregate from the base ``orders`` table, so the metadata
machinery — staged invisibility, parent-chain skipping, publish
re-application onto an advanced head, tag-protected vacuum — is
value-verified: a staged row leaking into main, a publish dropping the
racing append, or vacuum breaking the tagged snapshot flips the hash.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from octopufs_spark.registry import register
from octopufs_spark.tables import load


def _phase_agg(df: DataFrame, phase: str) -> DataFrame:
    return df.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
    ).select(F.lit(phase).alias("phase"), "o_orderpriority", "n_orders", "total")


_WAP_ORACLE_PHASE = """
SELECT '{phase}' AS phase, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders WHERE {cond} GROUP BY o_orderpriority
"""

_WAP_ORACLE = " UNION ALL ".join(
    _WAP_ORACLE_PHASE.format(phase=phase, cond=cond)
    for phase, cond in [
        ("audit", "o_orderkey % 5 <> 0 OR o_orderkey % 10 = 0"),
        ("pre_publish", "o_orderkey % 5 <> 0 OR o_orderkey % 10 = 5"),
        ("published", "TRUE"),
    ]
)


@register("q_ext_wap_publish", oracle=_WAP_ORACLE)
def q_ext_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish on a manifest table (the Iceberg WAP /
    Delta-on-branch pattern): a pipeline stages a batch that LANDS in
    the table's version log but is invisible to main — readers, the
    stream, and later commits all skip it — audits it by explicit
    version, and only then publishes it as a normal commit. At 100 TB
    this is how bad data is kept out of a production table without a
    staging copy: staging is one manifest write, audit reads the real
    files in place, publish is metadata-only.

    The scenario exercises the hard part — CONCURRENCY during the
    audit: base (keys not divisible by 5) seeds main; the staged WAP
    batch (keys = 0 mod 10) commits with ``wap_id``; a RACING normal
    append (keys = 5 mod 10) lands while the audit is in flight and
    must chain to main's head, not the staged snapshot; publish then
    RE-APPLIES the staged pure-append onto the advanced head
    (``ManifestTable.publish_wap``, octopufs_spark/manifest.py).
    Three phases hash-verify against the oracle's recomputation:
    'audit' (staged read = base ∪ staged), 'pre_publish' (main after
    the racer = base ∪ racer — any staged leak flips this), and
    'published' (everything, exactly once — a double-applied or
    dropped batch flips this)."""
    from octopufs_spark.manifest import ManifestTable, write_and_commit

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    root = tempfile.mkdtemp(prefix="octopufs_wap_")
    table = ManifestTable(root)
    write_and_commit(o.where(F.col("o_orderkey") % 5 != 0), table)
    staged_v = write_and_commit(
        o.where(F.col("o_orderkey") % 10 == 0),
        table,
        mode="append",
        wap_id="quality-audit",
    )
    audit = _phase_agg(table.read(spark, version=staged_v), "audit")
    # racing append lands mid-audit; must build on MAIN's head
    write_and_commit(o.where(F.col("o_orderkey") % 10 == 5), table, mode="append")
    pre = _phase_agg(table.read(spark), "pre_publish")
    table.publish_wap(wap_id="quality-audit")
    published = _phase_agg(table.read(spark), "published")
    return audit.unionByName(pre).unionByName(published)


_BRANCH_ORACLE = " UNION ALL ".join(
    _WAP_ORACLE_PHASE.format(phase=phase, cond=cond)
    for phase, cond in [
        ("main_during", "o_orderkey % 4 <> 0"),
        ("branch_mid", "o_orderkey % 4 <> 0 OR o_orderkey % 8 = 0"),
        ("after_ff", "TRUE"),
    ]
)


@register("q_ext_branch_ff", oracle=_BRANCH_ORACLE)
def q_ext_branch_ff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named branches with fast-forward publish (the Iceberg branch
    model, generalizing WAP from one staged commit to a whole staged
    LINEAGE): commits targeted at a branch chain off the branch's CAS
    ref head, invisible to main, until ``fast_forward`` publishes the
    entire line as one metadata-only main commit. At 100 TB this is
    how a multi-batch backfill or experiment lands atomically: every
    batch is durable and branch-readable as it arrives, main flips
    once.

    The scenario: main seeds 3/4 of orders; a 'features' branch takes
    TWO appends (the remaining quarter, split); reads are phased —
    'main_during' (main mid-branch-work: the seed only; any branch
    leak flips it), 'branch_mid' (the branch after its first commit:
    seed + batch1 — proving the branch chains off its own head), and
    'after_ff' (main after fast-forward: everything, exactly once).
    The oracle recomputes each phase from orders
    (``ManifestTable.create_branch/fast_forward``,
    octopufs_spark/manifest.py)."""
    from octopufs_spark.manifest import ManifestTable, write_and_commit

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    root = tempfile.mkdtemp(prefix="octopufs_branch_")
    table = ManifestTable(root)
    write_and_commit(o.where(F.col("o_orderkey") % 4 != 0), table)
    table.create_branch("features")
    write_and_commit(
        o.where(F.col("o_orderkey") % 8 == 0), table, mode="append", branch="features"
    )
    branch_mid = _phase_agg(table.read(spark, branch="features"), "branch_mid")
    write_and_commit(
        o.where(F.col("o_orderkey") % 8 == 4), table, mode="append", branch="features"
    )
    main_during = _phase_agg(table.read(spark), "main_during")
    table.fast_forward("features")
    after_ff = _phase_agg(table.read(spark), "after_ff")
    return main_during.unionByName(branch_mid).unionByName(after_ff)


_TXN_PHASE = """
SELECT '{phase}' AS phase, CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE {cond}
"""

_TXN_ORACLE = " UNION ALL ".join(
    _TXN_PHASE.format(phase=p, cond=c)
    for p, c in [
        ("pre_txn", "l_orderkey % 5 <> 0 AND o_orderkey % 5 <> 0"),
        ("mid_txn", "l_orderkey % 5 <> 0 AND o_orderkey % 5 <> 0"),
        ("post_txn", "TRUE"),
    ]
)


@register("q_ext_multitable_txn", oracle=_TXN_ORACLE)
def q_ext_multitable_txn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ATOMIC MULTI-TABLE TRANSACTION (octopufs_spark/multitable.py —
    the Nessie/LakeFS catalog-commit model built on this repo's WAP
    machinery): a fact table and its dimension update TOGETHER or not
    at all. Each write stages as a WAP snapshot (durable, invisible to
    the tables' main readers); one catalog commit atomically re-pins
    both tables; the staged snapshots then publish onto each table's
    main. Readers resolving through the catalog can never join new
    facts against old dims — the failure mode per-table logs cannot
    rule out at 100 TB, where the fact append and the dim update land
    seconds apart.

    The phases pin exactly that: 'pre_txn' and 'mid_txn' (read AFTER
    both tables staged, BEFORE the catalog flip) must be IDENTICAL
    80%-joins — any staged leak flips mid_txn — and 'post_txn' is the
    complete join, exactly once. The oracle recomputes each phase from
    the base tables."""
    from octopufs_spark.manifest import ManifestTable, write_and_commit
    from octopufs_spark.multitable import Catalog

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = load(spark, sf_dir, "orders").select("o_orderkey")
    root = tempfile.mkdtemp(prefix="octopufs_txn_")
    facts = ManifestTable(f"{root}/facts")
    dims = ManifestTable(f"{root}/dims")
    write_and_commit(li.where(F.col("l_orderkey") % 5 != 0), facts)
    write_and_commit(o.where(F.col("o_orderkey") % 5 != 0), dims)
    cat = Catalog(f"{root}/catalog")
    cat.register("facts", facts)
    cat.register("dims", dims)

    def phase(name: str) -> DataFrame:
        j = cat.read(spark, "facts").join(
            cat.read(spark, "dims"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        return j.agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        ).select(F.lit(name).alias("phase"), "n_items", "revenue")

    pre = phase("pre_txn")
    txn = cat.transaction()
    txn.write("facts", li.where(F.col("l_orderkey") % 5 == 0), mode="append")
    txn.write("dims", o.where(F.col("o_orderkey") % 5 == 0), mode="append")
    mid = phase("mid_txn")  # staged but unflipped: identical to pre
    txn.commit()
    post = phase("post_txn")
    return pre.unionByName(mid).unionByName(post)


@register(
    "q_ext_materialized_view",
    oracle="""
SELECT 'view' AS phase, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders GROUP BY o_orderpriority
UNION ALL SELECT 'refresh_1', 'full', CAST(0 AS BIGINT), CAST(0 AS DOUBLE)
UNION ALL SELECT 'refresh_2', 'incremental', CAST(0 AS BIGINT), CAST(0 AS DOUBLE)
UNION ALL SELECT 'refresh_3', 'incremental', CAST(0 AS BIGINT), CAST(0 AS DOUBLE)
""",
)
def q_ext_materialized_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance
    (octopufs_spark/mv.py): a grouped rollup of a manifest table is
    materialized once, then each appended commit folds in as a
    partial-aggregate MERGE over ONLY the commit's added files —
    count→sum-of-counts, sum→sum-of-sums — never rescanning the base.
    At 100 TB this is the difference between a daily rollup touching
    one day's commits and recomputing the table; row-changing commits
    (deletes, rewrites) are detected from the log and trigger one full
    recompute before incremental maintenance resumes.

    The scenario seeds half of orders, refreshes (full), then lands
    two appends each followed by an incremental refresh. The emitted
    refresh MODES pin that the incremental path actually ran, and the
    final view content must equal the oracle's from-scratch rollup of
    ALL orders — any partial-merge error (double-fold, missed commit,
    wrong avg decomposition) flips the hash."""
    from octopufs_spark.manifest import ManifestTable, write_and_commit
    from octopufs_spark.mv import MaterializedView

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.col("o_totalprice").cast("decimal(18,2)").alias("price")
    )
    root = tempfile.mkdtemp(prefix="octopufs_mv_")
    src = ManifestTable(f"{root}/src")
    mv = MaterializedView(
        src,
        f"{root}/view",
        ["o_orderpriority"],
        {"n_orders": ("count", "*"), "total": ("sum", "price")},
    )
    modes = []
    for i, cond in enumerate(
        (
            F.col("o_orderkey") % 2 == 1,
            F.col("o_orderkey") % 4 == 2,
            F.col("o_orderkey") % 4 == 0,
        )
    ):
        write_and_commit(o.where(cond), src, mode="overwrite" if i == 0 else "append")
        mv.refresh(spark)
        modes.append(mv.view.read_manifest().meta["mv"]["mode"])
    view = mv.read(spark).select(
        F.lit("view").alias("phase"),
        "o_orderpriority",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.col("total").cast("double").alias("total"),
    )
    mode_rows = spark.createDataFrame(
        [(f"refresh_{i + 1}", m, 0, 0.0) for i, m in enumerate(modes)],
        "phase string, o_orderpriority string, n_orders long, total double",
    )
    return view.unionByName(mode_rows)


@register(
    "q_ext_mv_minmax_rescan",
    oracle="""
WITH base AS (
  SELECT o_custkey % 20 AS g, CAST(o_totalprice AS DECIMAL(18,2)) AS price,
         (CAST(o_totalprice AS DECIMAL(18,2)) >= 499900 OR o_orderkey % 13 = 0) AS del
  FROM orders
), agg AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(price) AS DOUBLE) AS total,
         CAST(MIN(price) AS DOUBLE) AS lo,
         CAST(MAX(price) AS DOUBLE) AS hi
  FROM base WHERE NOT del GROUP BY g
), resc AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rescan FROM (
    SELECT g FROM base GROUP BY g
    HAVING MAX(CASE WHEN del THEN price END) = MAX(price)
        OR MIN(CASE WHEN del THEN price END) = MIN(price)
  )
)
SELECT a.g, a.n_orders, a.total, a.lo, a.hi,
       'incremental' AS mode, r.n_rescan
FROM agg a CROSS JOIN resc r
""",
)
def q_ext_mv_minmax_rescan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extremum-safe subtractive MV maintenance (r10,
    octopufs_spark/mv.py): a MOR delete folds into a min/max view
    subtractively ONLY where it provably cannot move a stored
    extremum; the groups where it ties one are rescanned from the
    head INDIVIDUALLY (a literal group-key predicate pushed into the
    parquet scan, file set bounded via prune_plan) — never a
    full-view recompute. At 100 TB this is the difference between a
    retention delete costing a handful of group-sliced scans and
    rescanning the fact table.

    The scenario builds a 20-group rollup (count/sum/min/max over
    order prices), then lands ONE positional MOR delete that mixes
    both populations: every 13th order (strictly-inside rows — pure
    subtraction) plus all orders priced >= 499900, which clips the
    price MAXIMUM of some groups but not others (4/20 at sf0.001,
    6/20 at sf0.01, 15/20 at sf0.1). The emitted ``mode`` pins that
    the refresh stayed incremental, ``n_rescan`` pins exactly how
    many groups took the rescan path (the oracle recomputes it as
    the groups whose deleted extreme ties the group-wide extreme),
    and the view rows must equal a from-scratch rollup of the kept
    rows — a wrong NULLed-fold, a missed rescan group, or a stale
    stored extremum all flip the hash."""
    from octopufs_spark.manifest import ManifestTable, write_and_commit
    from octopufs_spark.merge import delete_where_mor_positional
    from octopufs_spark.mv import MaterializedView

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 20).alias("g"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    root = tempfile.mkdtemp(prefix="octopufs_mvrescan_")
    src = ManifestTable(f"{root}/src")
    write_and_commit(o, src)
    mv = MaterializedView(
        src,
        f"{root}/view",
        ["g"],
        {
            "n_orders": ("count", "*"),
            "total": ("sum", "price"),
            "lo": ("min", "price"),
            "hi": ("max", "price"),
        },
    )
    mv.refresh(spark)  # full build
    delete_where_mor_positional(
        spark, src, "price >= 499900 or o_orderkey % 13 = 0"
    )
    mv.refresh(spark)  # subtractive fold + extremum-group rescan
    meta = mv.view.read_manifest().meta["mv"]
    return mv.read(spark).select(
        "g",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.col("total").cast("double").alias("total"),
        F.col("lo").cast("double").alias("lo"),
        F.col("hi").cast("double").alias("hi"),
        F.lit(meta["mode"]).alias("mode"),
        F.lit(int(meta.get("minmax_rescan_groups", 0))).cast("long").alias("n_rescan"),
    )


@register(
    "q_ext_wap_quality_gate",
    oracle="""
WITH a AS (SELECT CAST(COUNT(*) AS BIGINT) n,
                  CAST(SUM(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END) AS BIGINT) bad
           FROM documents WHERE doc_id % 8 = 0),
     b AS (SELECT CAST(COUNT(*) AS BIGINT) n,
                  CAST(SUM(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END) AS BIGINT) bad
           FROM documents WHERE doc_id % 8 = 4)
SELECT 'batch_a' AS phase, n AS n_docs, bad AS n_bad, (bad * 100 <= 10 * n) AS published FROM a
UNION ALL
SELECT 'batch_b' AS phase, n AS n_docs, bad AS n_bad, (bad * 100 <= 60 * n) AS published FROM b
UNION ALL
SELECT 'final' AS phase,
       CAST((SELECT COUNT(*) FROM documents WHERE doc_id % 4 <> 0)
            + CASE WHEN (SELECT bad * 100 <= 10 * n FROM a) THEN (SELECT n FROM a) ELSE 0 END
            + CASE WHEN (SELECT bad * 100 <= 60 * n FROM b) THEN (SELECT n FROM b) ELSE 0 END
            AS BIGINT) AS n_docs,
       CAST(0 AS BIGINT) AS n_bad, TRUE AS published
""",
)
def q_ext_wap_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WAP workflow doing its actual job — a QUALITY GATE on a
    training-corpus table: each incoming document batch stages with a
    ``wap_id``, a curation rule audits the STAGED snapshot in place
    (short-document fraction, the Gopher-style length screen), and the
    batch publishes onto main only if it passes — an audit failure
    aborts it with main never having seen a row. Two batches run the
    gate at different strictness (10% vs 60% short-doc budget), so the
    decision logic itself is under the hash: the oracle recomputes
    each batch's bad-fraction verdict AND the final corpus count
    implied by which batches passed, from the base table alone. At
    100 TB this replaces the quarantine-copy pattern: staging is one
    manifest commit, the audit reads the real files, the decision is
    metadata-only either way."""
    from octopufs_spark.manifest import ManifestTable, write_and_commit

    d = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    root = tempfile.mkdtemp(prefix="octopufs_wapgate_")
    table = ManifestTable(root)
    write_and_commit(d.where(F.col("doc_id") % 4 != 0), table)
    rows = []
    for phase, mod8, pct_max in (("batch_a", 0, 10), ("batch_b", 4, 60)):
        batch = d.where(F.col("doc_id") % 8 == mod8)
        sv = write_and_commit(batch, table, mode="append", wap_id=phase)
        audit = (
            table.read(spark, version=sv)
            .where(F.col("doc_id") % 8 == mod8)
            .agg(
                F.count("*").alias("n"),
                F.sum((F.col("n_chars") < 200).cast("long")).alias("bad"),
            )
            .collect()[0]
        )
        published = audit.bad * 100 <= pct_max * audit.n
        if published:
            table.publish_wap(wap_id=phase)
        else:
            table.abort_wap(wap_id=phase)
        rows.append((phase, audit.n, audit.bad, published))
    final_n = table.read(spark).count()
    rows.append(("final", final_n, 0, True))
    return spark.createDataFrame(
        rows, "phase string, n_docs long, n_bad long, published boolean"
    )


@register(
    "q_ext_table_tag",
    oracle="""
SELECT 'tagged' AS phase, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders WHERE o_orderkey % 2 = 1
UNION ALL
SELECT 'current' AS phase, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
UNION ALL
SELECT 'invariants' AS phase, CAST(1 AS BIGINT) AS n_rows, CAST(0 AS DOUBLE) AS total
""",
)
def q_ext_table_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named snapshot tags with vacuum protection (the Iceberg tag
    model): ``create_tag`` pins a version under an immutable name, and
    ``vacuum`` keeps the tagged snapshot's manifest AND files alive
    regardless of its retention policy — the mechanism behind 'the
    exact training set of run X stays reproducible' on a table that
    keeps compacting and vacuuming. A tag is a ref, not a copy: at
    100 TB it costs one JSON file.

    The scenario: v1 (odd keys) is tagged 'baseline'; even keys
    append; a full OPTIMIZE rewrites every live file; an aggressive
    ``vacuum(keep_versions=1, retention_seconds=0)`` then prunes all
    unprotected history. The 'tagged' phase re-reads THROUGH the tag
    after vacuum — if tag protection failed, the files are gone and
    the query dies; if the ref resolved wrong, the aggregate flips the
    hash. 'current' pins that the live table still holds everything,
    and 'invariants' pins that vacuum actually removed the untagged
    middle version (the protection is selective, not a vacuum no-op)
    while only {tag, head} manifests survive."""
    from octopufs_spark.manifest import ManifestTable, compact_and_commit, write_and_commit

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    root = tempfile.mkdtemp(prefix="octopufs_tag_")
    table = ManifestTable(root)
    v1 = write_and_commit(o.where(F.col("o_orderkey") % 2 == 1), table)
    table.create_tag("baseline", version=v1)
    write_and_commit(o.where(F.col("o_orderkey") % 2 == 0), table, mode="append")
    head = compact_and_commit(spark, table)
    removed = table.vacuum(keep_versions=1, retention_seconds=0)

    def one(df: DataFrame, phase: str) -> DataFrame:
        return df.agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
        ).select(F.lit(phase).alias("phase"), "n_rows", "total")

    tagged = one(table.read(spark, tag="baseline"), "tagged")
    current = one(table.read(spark), "current")
    invariants_hold = bool(removed) and set(table.versions()) == {v1, head}
    inv = spark.range(1).select(
        F.lit("invariants").alias("phase"),
        F.lit(1 if invariants_hold else 0).cast("long").alias("n_rows"),
        F.lit(0.0).alias("total"),
    )
    return tagged.unionByName(current).unionByName(inv)
