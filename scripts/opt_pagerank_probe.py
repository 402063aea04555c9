"""Phase-labeled cost breakdown of the pagerank_* headline entries
(r12 optimization session 3, guide §1.1/§1.5).

Replays pagerank()'s exact internal sequence over doc_term_edges at
sf0.1, timing each driver-visible phase separately so the 2.3-2.8 s
entry cost decomposes into:

  A. shingle build + explode + eager localCheckpoint (doc_term_edges)
  B. _edge_partitions count (block-stats read)
  C. ed persist materialization (symmetrize + distinct + deg + join),
     forced via noop write
  D. ranks init + 4 rounds + collect (the entry's only real action
     beyond A-C)
  E. the entry end-to-end as the bench runs it (fresh, min of N)

NOTE (r12 ADVICE): phases C/D hand-inline the BALANCED
(deduped_pairs=False) edge build, while the registry entries phase E
times run the deduped single-exchange build since r12 batch 7 — so the
A-D decomposition explains the balanced path's cost structure and no
longer sums to E for the headline entries.

Run AFTER the tree is green, idle host:
    python scripts/opt_pagerank_probe.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2
SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import functions as F

    from pgverify_spark import registry
    from pgverify_spark.operators import graph
    from pgverify_spark.operators.util import release_cached_deps
    from pgverify_spark.session import get_spark
    from pgverify_spark.sources.parquet import ParquetTarget

    spark = get_spark("opt-pagerank-probe")
    sc = spark.sparkContext
    spark.range(1_000_000).select("id").summary().collect()

    queries = registry.spark_queries()
    # codegen warm-up at sf0.001, mirroring bench.py
    for name in (
        "pagerank_term_graph_documents",
        "pagerank_weighted_term_graph_documents",
        "pagerank_personalized_term_graph_documents",
    ):
        queries[name](spark, "/root/testdata/sf0.001").collect()
    spark.catalog.clearCache()

    out: dict[str, list[float]] = {}

    def rec(key: str, sec: float) -> None:
        out.setdefault(key, []).append(round(sec, 4))

    for rep in range(REPS):
        # ---- phased replay of pagerank (plain) over doc_term_edges ----
        df = ParquetTarget("t", SF_DIR).read(spark, "documents")

        sc.setJobDescription("A: doc_term_edges + localCheckpoint")
        t0 = time.perf_counter()
        pairs = graph.doc_term_edges(df)
        src = pairs.selectExpr("doc_a", "doc_b").localCheckpoint(eager=True)
        release_cached_deps(pairs)
        rec("A_edges_checkpoint", time.perf_counter() - t0)

        sc.setJobDescription("B: _edge_partitions count")
        t0 = time.perf_counter()
        nparts = graph._edge_partitions(src)
        rec("B_count", time.perf_counter() - t0)

        sc.setJobDescription("C: ed build+persist materialize")
        t0 = time.perf_counter()
        edges = (
            src.selectExpr("doc_a AS s", "doc_b AS t")
            .unionByName(src.selectExpr("doc_b AS s", "doc_a AS t"))
            .distinct()
        )
        deg = edges.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
        ed = edges.join(deg, "s").repartition(nparts, "s").persist()
        ed.write.format("noop").mode("overwrite").save()
        rec("C_ed_materialize", time.perf_counter() - t0)

        sc.setJobDescription("D: ranks init + 4 rounds + collect")
        t0 = time.perf_counter()
        ranks = (
            ed.select("s")
            .distinct()
            .selectExpr("s AS node", "CAST(1000000 AS BIGINT) AS rank_ppm")
        )
        contrib = "(rank_ppm * 850) div (1000 * d)"
        for _ in range(4):
            r = ranks.hint("shuffle_hash")
            ranks = (
                ed.join(r, ed["s"] == r["node"])
                .groupBy("t")
                .agg(F.expr(f"sum({contrib})").alias("c"))
                .selectExpr("t AS node", "CAST(150000 + c AS BIGINT) AS rank_ppm")
            )
        ranks.collect()
        rec("D_rounds_collect", time.perf_counter() - t0)
        sc.setJobDescription(None)
        spark.catalog.clearCache()

        # ---- end-to-end entries, bench protocol (min of 2 in-rep) ----
        for name in (
            "pagerank_term_graph_documents",
            "pagerank_weighted_term_graph_documents",
            "pagerank_personalized_term_graph_documents",
        ):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                queries[name](spark, SF_DIR).collect()
                best = min(best, time.perf_counter() - t0)
            rec(f"E_{name}", best)
            spark.catalog.clearCache()

    print(json.dumps({k: {"min": min(v), "all": v} for k, v in out.items()}, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
