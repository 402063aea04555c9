"""Prototype A/B: co-partitioned dup_clusters rounds (r13 batch 2).

Current shape: per round, edges (unpartitioned checkpoint) join labels
on dst — planner broadcasts labels at small scale (2 driver round
trips/round) and would shuffle the E-SIZED edge relation per round at
broadcast-breaking scale; then groupBy(src) + left join back onto
labels (another broadcast / exchange).

Candidate: edges hash-partitioned by dst ONCE (eager localCheckpoint
preserves partitioning); labels pinned to the same width on doc_id;
rounds are shuffle_hash joins that consume the co-partitioning — per
round the only exchanges are node-sized (the groupBy(src) aggregate +
the nbr_min side of the join-back), the edge relation never moves.

Checks: exact output equality on sf0.01 + sf0.1 LSH pairs, plan shape
(edge-side Exchange count), and an interleaved min-of-2 x N timing of
near_dedup_filter over both variants.

    python scripts/opt_clusters_proto_r13.py [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from pgverify_spark.session import get_spark  # noqa: E402

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 4


def dup_clusters_copart(pairs: DataFrame, max_iterations: int = 20) -> DataFrame:
    src = pairs.localCheckpoint(eager=True)
    n_pairs = src.count()
    if n_pairs == 0:
        return src.selectExpr("doc_a AS doc_id", "doc_a AS cluster_id")
    W = max(1, min((2 * n_pairs) // 2_000_000 + 1, 1 << 20))
    edges = (
        src.selectExpr("doc_a AS src", "doc_b AS dst")
        .unionByName(src.selectExpr("doc_b AS src", "doc_a AS dst"))
        .repartition(W, "dst")
        .persist()
    )
    labels = (
        edges.selectExpr("src AS doc_id")
        .distinct()
        .selectExpr("doc_id", "doc_id AS cluster_id")
        .localCheckpoint(eager=True)
    )
    for rnd in range(max_iterations):
        nbr_min = (
            edges.join(
                labels.selectExpr("doc_id AS dst", "cluster_id AS nl").hint(
                    "shuffle_hash"
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nl").alias("nbr_min"))
            .selectExpr("src AS doc_id", "nbr_min")
        )
        joined = (
            labels.join(nbr_min.hint("shuffle_hash"), "doc_id", "left")
            .selectExpr(
                "doc_id",
                "least(cluster_id, coalesce(nbr_min, cluster_id)) AS cluster_id",
                "CAST(coalesce(nbr_min, cluster_id) < cluster_id AS INT) AS moved",
            )
            .localCheckpoint(eager=True)
        )
        labels = joined.select("doc_id", "cluster_id")
        if rnd == 0:
            continue
        changed = joined.selectExpr("sum(moved) AS m").first()[0] or 0
        if changed == 0:
            break
    edges.unpersist()
    return labels


def main() -> None:
    from pgverify_spark.operators import dedup
    from pgverify_spark.registry import ParquetTarget

    spark = get_spark("opt-clusters-proto")
    spark.range(1_000_000).count()

    # --- correctness on both SFs
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        docs = ParquetTarget("t", sf).read(spark, "documents")
        pairs = dedup.minhash_lsh_pairs(docs, 0.3).select("doc_a", "doc_b")
        a = sorted(map(tuple, dedup.dup_clusters(pairs).collect()))
        b = sorted(map(tuple, dup_clusters_copart(pairs).collect()))
        print(f"{sf}: rows {len(a)} equal={a == b}", flush=True)
        assert a == b
        spark.catalog.clearCache()

    # --- plan shape: exchanges in one round's checkpoint-input plan
    # (captured by explain of the joined relation before checkpointing
    # is awkward; instead count jobs + wall below)

    # --- interleaved timing of near_dedup_filter via each variant
    sf = "/root/testdata/sf0.1"
    docs = ParquetTarget("t", sf).read(spark, "documents")
    sc = spark.sparkContext

    def run(variant) -> tuple[float, int]:
        pairs = dedup.minhash_lsh_pairs(docs, 0.3).select("doc_a", "doc_b")
        g = f"v:{id(variant)}:{time.monotonic_ns()}"
        sc.setJobGroup(g, "ab")
        t0 = time.perf_counter()
        losers = (
            variant(pairs).filter("doc_id <> cluster_id").select("doc_id")
        )
        docs.join(losers, "doc_id", "left_anti").collect()
        dt = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        n_jobs = len(sc.statusTracker().getJobIdsForGroup(g))
        spark.catalog.clearCache()
        return dt, n_jobs

    # warm both
    run(dedup.dup_clusters)
    run(dup_clusters_copart)
    olds, news = [], []
    for _ in range(REPS):
        olds.append(run(dedup.dup_clusters))
        news.append(run(dup_clusters_copart))
    print("old:", [f"{t:.3f}s/{j}j" for t, j in olds], flush=True)
    print("new:", [f"{t:.3f}s/{j}j" for t, j in news], flush=True)
    print(
        f"min old {min(t for t, _ in olds):.3f}s vs new "
        f"{min(t for t, _ in news):.3f}s"
    )
    spark.stop()


if __name__ == "__main__":
    main()
