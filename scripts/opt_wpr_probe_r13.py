"""r13 session-2 probe: in-row gram counting for doc_term_edges_weighted.

Hypothesis (guide §2.4): the weighted doc-term edge build pays an
explode -> groupBy(doc_id, gram_string) exchange that the plain variant
does not; a document's grams all live in ONE array cell, so per-doc
occurrence counts are row-local — array_sort + run-length extraction
via higher-order functions computes the identical (doc_a, doc_b, w)
multiset with ZERO exchange (string grams never shuffle at any scale).

Phase 1: output equality — old vs new edge relation as sorted tuples,
and end-to-end pagerank_weighted ranks old vs new.
Phase 2: interleaved A/B (frozen bench protocol shape: min of 2 runs
per rep, alternating variants, clearCache between) of the full
pagerank_weighted_term_graph_documents entry.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from pgverify_spark import registry  # noqa: E402
from pgverify_spark.functions.canonical import DIALECT_SPARK  # noqa: E402
from pgverify_spark.functions.canonical import hex_prefix_int_sql  # noqa: E402
from pgverify_spark.functions.text_exprs import ngrams_sql, tokens_sql  # noqa: E402
from pgverify_spark.operators.dedup import NGRAM_N  # noqa: E402
from pgverify_spark.operators.graph import TERM_NODE_OFFSET, pagerank_weighted  # noqa: E402
from pgverify_spark.operators.util import barrier, tag_cached_deps  # noqa: E402
from pgverify_spark.session import get_spark  # noqa: E402
from pgverify_spark.sources.parquet import ParquetTarget  # noqa: E402


def edges_old(df: DataFrame) -> DataFrame:
    """The pre-change build: explode + groupBy(doc_id, g) exchange."""
    d = DIALECT_SPARK
    grams = (
        barrier(df.selectExpr("doc_id", f"{tokens_sql('text', d)} AS tokens"))
        .filter(f"size(tokens) >= {NGRAM_N}")
        .selectExpr("doc_id", f"{ngrams_sql('tokens', NGRAM_N, d)} AS grams")
        .persist()
    )
    out = (
        grams.selectExpr("doc_id", "explode(grams) AS g")
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("w"))
        .selectExpr(
            "doc_id AS doc_a",
            f"{TERM_NODE_OFFSET} + {hex_prefix_int_sql('md5(g)', d)} AS doc_b",
            "w",
        )
    )
    return tag_cached_deps(out, grams)


def _gram_counts_expr(grams_col: str) -> str:
    """array<struct<g,w>> of per-distinct-gram occurrence counts,
    computed IN-ROW: sort, find run starts, emit run lengths.  Lambda
    vars act as let-bindings so each layer is evaluated once per row
    (CollapseProject cannot inline through a lambda binding)."""
    starts = (
        "filter(sequence(1, size(sg)), "
        "i -> i = 1 OR element_at(sg, i) <> element_at(sg, i - 1))"
    )
    run = (
        "named_struct('g', element_at(sg, s), 'w', CAST("
        "(CASE WHEN j = size(st) - 1 THEN size(sg) + 1 "
        "ELSE element_at(st, j + 2) END) - s AS BIGINT))"
    )
    return (
        f"flatten(transform(array(array_sort({grams_col})), sg -> "
        f"flatten(transform(array({starts}), st -> "
        f"transform(st, (s, j) -> {run})))))"
    )


def edges_new(df: DataFrame) -> DataFrame:
    """In-row counting: no exchange between the barrier and the edges."""
    d = DIALECT_SPARK
    grams = (
        barrier(df.selectExpr("doc_id", f"{tokens_sql('text', d)} AS tokens"))
        .filter(f"size(tokens) >= {NGRAM_N}")
        .selectExpr("doc_id", f"{ngrams_sql('tokens', NGRAM_N, d)} AS grams")
        .persist()
    )
    out = (
        grams.selectExpr("doc_id", f"inline({_gram_counts_expr('grams')})")
        .selectExpr(
            "doc_id AS doc_a",
            f"{TERM_NODE_OFFSET} + {hex_prefix_int_sql('md5(g)', d)} AS doc_b",
            "w",
        )
    )
    return tag_cached_deps(out, grams)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("opt-wpr-probe-r13")
    spark.range(1_000_000).count()
    docs = ParquetTarget("t", sf_dir).read(spark, "documents")

    # ---- Phase 1: equality ------------------------------------------------
    for probe_sf in ("/root/testdata/sf0.01", sf_dir):
        dd = ParquetTarget("t", probe_sf).read(spark, "documents")
        a = sorted(map(tuple, edges_old(dd).collect()))
        b = sorted(map(tuple, edges_new(dd).collect()))
        assert a == b, f"edge multiset mismatch at {probe_sf}: {len(a)} vs {len(b)}"
        print(f"edges equal at {probe_sf}: {len(a)} rows")
        spark.catalog.clearCache()
    ra = sorted(map(tuple, pagerank_weighted(edges_old(docs), 4, deduped_pairs=True).collect()))
    spark.catalog.clearCache()
    rb = sorted(map(tuple, pagerank_weighted(edges_new(docs), 4, deduped_pairs=True).collect()))
    spark.catalog.clearCache()
    assert ra == rb, "rank mismatch"
    print(f"pagerank_weighted ranks equal: {len(ra)} rows")

    # ---- Phase 2: interleaved A/B -----------------------------------------
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "4"))
    builders = {"old": edges_old, "new": edges_new}
    times: dict[str, list[float]] = {"old": [], "new": []}
    for r in range(reps):
        for name, build in builders.items():
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                pagerank_weighted(build(docs), 4, deduped_pairs=True).collect()
                best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
            times[name].append(round(best, 3))
    print("A/B pagerank_weighted end-to-end (min of 2 per rep):")
    for name, ts in times.items():
        print(f"  {name}: {ts}  min={min(ts):.3f} median={sorted(ts)[len(ts)//2]:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
