"""End-to-end training-data curation demo — the LLM-pipeline surface
in one run, every stage an operator from this repo:

1. quality-gate the raw corpus (length/repetition/lang signals),
2. strip cross-document boilerplate (C4-style line dedup),
3. drop near-duplicate documents (deterministic MinHash-LSH,
   exact-Jaccard rescored),
4. collapse semantic duplicates over embeddings (deterministic LSH
   pairs → connected components → quality-aware canonical),
5. bucket the survivors by embedding cluster (integer k-means),
6. pack per-language token sequences into 512-token training bins,
7. print the funnel: docs in → docs out per stage + bin manifest.

Every stage here is hash-verified against a DuckDB oracle in the
registered query inventory (see queries/spark4.py, queries/pipeline.py);
this script shows them composed the way a pipeline would actually run.

Run: python examples/curation_demo.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from octopufs_spark.llm import clustering, dedup, similarity  # noqa: E402
from octopufs_spark.queries import curation  # noqa: E402
from octopufs_spark.session import get_spark  # noqa: E402
from octopufs_spark.tables import load  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("curation_demo")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load(spark, sf_dir, "documents")
    vecs = load(spark, sf_dir, "embeddings")
    funnel = [("raw corpus", docs.count())]

    # 0. pre-flight audits (report, not filter): Gopher-style rule
    #    failure counts and cross-source shingle contamination — the
    #    numbers a data team reads BEFORE choosing gate thresholds.
    gopher = curation.q_ext_gopher_rules(spark, sf_dir).first()
    contam = curation.q_ext_source_contamination(spark, sf_dir)
    worst_contam = contam.orderBy(F.desc("shared_milli")).first()

    # 1. quality gate: drop docs that are too short or too repetitive
    toks = F.split("text", " ")
    scored = docs.select(
        "*",
        F.size(toks).alias("n_tok"),
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("ttr"),
    )
    quality = scored.where((F.col("n_tok") >= 20) & (F.col("ttr") >= 0.3)).drop(
        "n_tok", "ttr"
    )
    funnel.append(("quality gate", quality.count()))

    # 2. line-level dedup: remove sentences already seen in the corpus
    lines = quality.select(
        "doc_id", F.posexplode(F.split("text", "\\. ")).alias("pos", "line")
    )
    firsts = lines.groupBy("line").agg(F.min(F.struct("doc_id", "pos")).alias("f"))
    kept_lines = lines.join(firsts, "line").where(
        F.struct("doc_id", "pos") == F.col("f")
    )
    cleaned = kept_lines.groupBy("doc_id").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(F.struct("pos", "line"))), lambda s: s["line"]),
            ". ",
        ).alias("text")
    ).join(quality.drop("text"), "doc_id")
    funnel.append(("line dedup (docs retaining text)", cleaned.count()))

    # 3. near-dup removal: deterministic MinHash pairs, min-id survivor
    pairs = dedup.minhash_near_dup_pairs_deterministic(cleaned)
    clusters = dedup.connected_components(pairs, partitions=4)
    losers = clusters.where(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    surviving = cleaned.join(losers, "doc_id", "left_anti")
    funnel.append(("minhash near-dup", surviving.count()))

    # 4. semantic dedup on embeddings (vec_id aligns with doc_id here)
    sem_pairs = similarity.cosine_near_dup_pairs_det_adaptive(vecs, threshold=0.4)
    sem_clusters = dedup.connected_components(sem_pairs, partitions=4)
    sem_losers = sem_clusters.where(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id")
    )
    final_docs = surviving.join(sem_losers, "doc_id", "left_anti").localCheckpoint()
    funnel.append(("semantic dedup", final_docs.count()))

    # 5. cluster the survivors' embeddings for stratified downstream use
    assignment = clustering.kmeans_int(vecs, k=4, iters=3)
    cluster_sizes = (
        final_docs.join(assignment, final_docs.doc_id == assignment.vec_id)
        .groupBy("cluster")
        .count()
        .orderBy("cluster")
        .collect()
    )

    # 6. pack per-language token sequences into 512-token bins
    packed = (
        final_docs.select("doc_id", "lang", F.size(F.split("text", " ")).alias("n_tok"))
        .withColumn(
            "before",
            F.coalesce(
                F.sum("n_tok").over(
                    Window.partitionBy("lang").orderBy("doc_id").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .groupBy("lang", F.floor(F.col("before") / 512).alias("bin"))
        .agg(F.count("*").alias("docs"), F.sum("n_tok").alias("tokens"))
    )
    n_bins = packed.count()

    print("\n=== pre-flight audits ===")
    print(
        f"gopher rules: {gopher['pass_all']}/{gopher['n_docs']} docs pass all "
        f"(fail_len={gopher['fail_len']} fail_wlen={gopher['fail_wlen']} "
        f"fail_stop={gopher['fail_stop']}), retained tokens {gopher['retained_tokens']}"
    )
    print(
        f"most cross-contaminated source: {worst_contam['source']} "
        f"({worst_contam['shared_milli']}‰ of its 5-gram shingles shared)"
    )

    print("\n=== curation funnel ===")
    for stage, n in funnel:
        print(f"{stage:40s} {n:6d}")
    print("\nembedding clusters of survivors:")
    for r in cluster_sizes:
        print(f"  cluster {r['cluster']}: {r['count']} docs")
    print(f"\nsequence bins (512 tokens, per lang): {n_bins}")
    print(packed.orderBy("lang", "bin").limit(8).toPandas().to_string(index=False))


if __name__ == "__main__":
    main()
