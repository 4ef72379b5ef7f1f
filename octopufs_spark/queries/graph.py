"""Graph analytics on a relational substrate: PageRank and triangle
counting over the nation-level trade graph.

The graph is DERIVED — an edge src→dst is a supplier nation shipping
to a customer nation with above-average revenue — so the expensive
part (building the edge list from lineitem⋈orders⋈customer⋈supplier)
is exactly the distributed join/agg pipeline that scales; the
iterative part then runs on the bounded nation graph.

Cross-engine determinism: PageRank is computed in SCALED INTEGER
arithmetic (rank × 10¹²) with floor division — BIGINT end-to-end, so
the result is bit-identical regardless of engine float-summation
order (the usual reason iterative PageRank can't be hash-compared).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from octopufs_spark.registry import register
from octopufs_spark.tables import load

# Shared SQL for the thresholded nation->nation trade edge list:
# revenue in exact integer cents; keep edges strictly above the mean.
_EDGES_SQL = """
  raw AS (
    SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(30,2))
                * CAST(100 AS DECIMAL(3,0)) AS BIGINT) AS rev_cents
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    JOIN supplier s ON l.l_suppkey  = s.s_suppkey
    WHERE s.s_nationkey <> c.c_nationkey
    GROUP BY 1, 2
  ),
  edges AS (
    SELECT src, dst FROM (
      SELECT src, dst, rev_cents,
             COUNT(*) OVER () AS n_edges,
             SUM(rev_cents) OVER () AS total_cents
      FROM raw
    ) WHERE rev_cents * n_edges > total_cents
  )
"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation trade edges (src, dst), revenue strictly above the mean.

    Plan: lineitem shuffles once per join key; customer/supplier are
    broadcast. The mean threshold uses exact BIGINT cents so the kept
    edge set matches any other engine exactly. The window over the
    aggregated edge list runs on ≤ n_nations² rows — bounded."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice"
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    raw = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                .cast("decimal(30,2)")
                * F.lit(100).cast("decimal(3,0)")
            )
            .cast("bigint")
            .alias("rev_cents")
        )
    )
    stats = raw.agg(
        F.count("*").alias("n_edges"), F.sum("rev_cents").alias("total_cents")
    )
    return (
        raw.crossJoin(F.broadcast(stats))
        .filter(F.col("rev_cents") * F.col("n_edges") > F.col("total_cents"))
        .select("src", "dst")
    )


_SCALE = 1_000_000_000_000  # rank fixed-point: 10^12
_BASE = 150_000_000_000  # (1 - 0.85) * SCALE


@register(
    "q_graph_pagerank",
    oracle=f"""
WITH {_EDGES_SQL},
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM edges GROUP BY src),
r0 AS (SELECT node, CAST({_SCALE} AS BIGINT) AS r FROM nodes),
r1 AS (
  SELECT n.node, CAST({_BASE} + COALESCE(SUM((85 * r.r) // (100 * d.outdeg)), 0) AS BIGINT) AS r
  FROM nodes n
  LEFT JOIN edges e ON e.dst = n.node
  LEFT JOIN r0 r ON r.node = e.src
  LEFT JOIN deg d ON d.src = e.src
  GROUP BY n.node
),
r2 AS (
  SELECT n.node, CAST({_BASE} + COALESCE(SUM((85 * r.r) // (100 * d.outdeg)), 0) AS BIGINT) AS r
  FROM nodes n
  LEFT JOIN edges e ON e.dst = n.node
  LEFT JOIN r1 r ON r.node = e.src
  LEFT JOIN deg d ON d.src = e.src
  GROUP BY n.node
),
r3 AS (
  SELECT n.node, CAST({_BASE} + COALESCE(SUM((85 * r.r) // (100 * d.outdeg)), 0) AS BIGINT) AS r
  FROM nodes n
  LEFT JOIN edges e ON e.dst = n.node
  LEFT JOIN r1x r ON r.node = e.src
  LEFT JOIN deg d ON d.src = e.src
  GROUP BY n.node
)
SELECT na.n_name, r3.r AS rank_scaled,
       CAST(r3.r AS DOUBLE) / {_SCALE} AS pagerank
FROM r3 JOIN nation na ON na.n_nationkey = r3.node
""".replace("r1x", "r2"),
)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration PageRank (d = 0.85) over the nation trade graph,
    in fixed-point integer arithmetic (rank × 10¹², floor division)
    so every engine produces the identical BIGINT ranks — float
    PageRank cannot be hash-compared because neighbor-sum order
    differs per engine/partitioning.

    Scale shape: each iteration is edges⋈ranks (ranks is one row per
    node — broadcast) followed by groupBy(dst): the classic
    iterate-on-aggregates loop. The rank table never leaves the
    bounded node domain, and the unbounded tables are touched once,
    in :func:`_edges`.

    r11 (guide §7.2, §2.4): ``nodes`` and ``deg`` are static across
    iterations but were lazy, so the unrolled 3-iteration plan
    recomputed nodes 4x and deg 3x — each copy with its own distinct/
    groupBy Exchange — and re-attached dangling nodes with a per-
    iteration SortMergeJoin LeftOuter. Both are node-bounded, so they
    are checkpointed once, and the left join is replaced by a zero-
    contribution union row per node folded into the SAME groupBy that
    sums edge contributions: one small exchange per iteration instead
    of three, no join beyond the fundamental edges⋈ranks propagation.
    Per-edge integer arithmetic is unchanged (same div-then-sum), so
    ranks stay bit-identical."""
    edges = _edges(spark, sf_dir).localCheckpoint()  # reused 3x: pin it
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select("dst"))
        .distinct()
        .localCheckpoint()
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg")).localCheckpoint()
    zero = nodes.select("node", F.lit(0).cast("bigint").alias("c"))
    ranks = nodes.withColumn("r", F.lit(_SCALE).cast("bigint"))
    for _ in range(3):
        contrib = (
            edges.join(F.broadcast(ranks), edges.src == ranks.node)
            .join(F.broadcast(deg), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("(85 * r) div (100 * outdeg)").alias("c"),
            )
        )
        ranks = (
            contrib.unionAll(zero)
            .groupBy("node")
            .agg((F.lit(_BASE) + F.sum("c")).cast("bigint").alias("r"))
        )
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return ranks.join(
        F.broadcast(nation), ranks.node == nation.n_nationkey
    ).select(
        "n_name",
        F.col("r").alias("rank_scaled"),
        (F.col("r").cast("double") / _SCALE).alias("pagerank"),
    )


@register(
    "q_graph_triangles",
    oracle=f"""
WITH {_EDGES_SQL},
und AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM edges
)
SELECT CAST((SELECT COUNT(*) FROM und) AS BIGINT) AS n_edges,
       CAST((SELECT COUNT(DISTINCT x) FROM (SELECT a AS x FROM und UNION ALL SELECT b FROM und)) AS BIGINT) AS n_nodes,
       CAST((SELECT COUNT(*)
             FROM und e1
             JOIN und e2 ON e2.a = e1.b
             JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b) AS BIGINT) AS n_triangles
""",
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count on the undirected nation trade graph via the
    ordered-wedge join: with edges normalized to a < b, each triangle
    a<b<c is counted exactly once by joining wedge (a,b)+(b,c) against
    closing edge (a,c). On a bounded derived graph this is a broadcast
    join chain; on a billion-edge graph the same query shuffles on the
    wedge key — the standard distributed triangle algorithm (node-
    iterator with degree ordering).

    r11 (guide §1.5/§7.2): the three report scalars used to be three
    separate count() ACTIONS plus a driver-side createDataFrame — three
    job launches, each re-deriving ``und`` from the checkpointed edges.
    Now ``und`` is checkpointed once (it is edge-bounded and feeds five
    plan legs) and the scalars are three 1-row aggregates glued with
    crossJoins into ONE plan/action, so the engine computes the whole
    report in a single pass."""
    edges = _edges(spark, sf_dir).localCheckpoint()
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint()
    )
    e1 = und.alias("e1")
    e2 = und.alias("e2")
    e3 = und.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .agg(F.count("*").alias("n_triangles"))
    )
    n_edges = und.agg(F.count("*").alias("n_edges"))
    n_nodes = (
        und.select(F.col("a").alias("x"))
        .unionAll(und.select("b"))
        .agg(F.count_distinct("x").alias("n_nodes"))
    )
    return n_edges.crossJoin(n_nodes).crossJoin(tri)
