"""r13 session-3 probe: doc-level reassembly for cut_repeated_spans.

Hypothesis (guide §2.2): the cut transform's token reassembly pays TWO
corpus-TEXT-sized exchanges (join toks ⋈ cover on (doc_id, t), then
groupBy(doc_id) with an O(T log T) collect_list sort) plus an n-fold
cover explode.  The per-token cut decision is a sliding-window min over
the per-doc dup-flag sequence — computable IN-ROW against the token
array once the P dup flags are collected per doc (ids-only ints), so
the rewritten shape shuffles the token strings exactly ONCE (the
doc-keyed join that delivers flags to the text — the true floor) and
drops the n-fold fanout and the (doc,t)-keyed text exchange.

Phase 1: output equality — old vs new sorted tuples at sf0.01 and
sf0.1, plus hand-built edge-case docs (empty, shorter-than-n, all-dup,
brace/quote tokens) at n=2 and n=5.
Phase 2: interleaved A/B (min of 2 per rep, alternating, clearCache
between) of the full registry-entry shape at sf0.1.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from pgverify_spark.functions.canonical import (  # noqa: E402
    DIALECT_SPARK,
    hex_prefix_int_sql,
)
from pgverify_spark.functions.text_exprs import ngrams_sql, tokens_sql  # noqa: E402
from pgverify_spark.operators import dedup  # noqa: E402
from pgverify_spark.operators.dedup import REPEAT_N, _barrier  # noqa: E402
from pgverify_spark.operators.util import tag_cached_deps  # noqa: E402
from pgverify_spark.session import get_spark  # noqa: E402
from pgverify_spark.sources.parquet import ParquetTarget  # noqa: E402


def cut_old(df: DataFrame, n: int = REPEAT_N) -> DataFrame:
    """The pre-change build (verbatim from dedup.py before this probe)."""
    toks_arr = _barrier(
        df.selectExpr("doc_id", f"{tokens_sql('text', DIALECT_SPARK)} AS tokens")
    ).persist()
    grams = (
        toks_arr.filter(f"size(tokens) >= {n}")
        .selectExpr(
            "doc_id",
            f"posexplode({ngrams_sql('tokens', n, DIALECT_SPARK)}) AS (p0, g)",
        )
        .selectExpr(
            "doc_id",
            "p0 + 1 AS pos",
            f"{hex_prefix_int_sql('md5(g)', DIALECT_SPARK)} AS s",
        )
        .persist()
    )
    ag = grams.groupBy("s").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min(F.expr("doc_id * 1048576 + pos")).alias("own"),
    )
    flagged = grams.join(ag, "s").selectExpr(
        "doc_id",
        "pos",
        "CAST(cnt >= 2 AND doc_id * 1048576 + pos <> own AS INT) AS dup",
    )
    cover = (
        flagged.selectExpr(
            "doc_id", f"explode(sequence(pos, pos + {n - 1})) AS t", "dup"
        )
        .groupBy("doc_id", "t")
        .agg(F.min("dup").alias("all_dup"))
    )
    toks = toks_arr.selectExpr("doc_id", "posexplode(tokens) AS (t0, tok)").selectExpr(
        "doc_id", "t0 + 1 AS t", "tok"
    )
    marked = toks.join(cover, ["doc_id", "t"], "left").selectExpr(
        "doc_id", "t", "tok", "coalesce(all_dup, 0) AS cut"
    )
    out = (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("cut").alias("n_cut"),
            F.expr(
                "array_join(transform(array_sort(collect_list("
                "CASE WHEN cut = 0 THEN named_struct('t', t, 'tok', tok) END"
                ")), x -> x.tok), ' ')"
            ).alias("text_kept"),
        )
        .selectExpr(
            "doc_id",
            "CAST(n_tokens AS BIGINT) AS n_tokens",
            "CAST(n_cut AS BIGINT) AS n_cut",
            "text_kept",
        )
    )
    return tag_cached_deps(out, toks_arr, grams)


def cut_new(df: DataFrame, n: int = REPEAT_N) -> DataFrame:
    """In-row reassembly: token strings shuffle exactly once (doc join)."""
    toks_arr = _barrier(
        df.selectExpr("doc_id", f"{tokens_sql('text', DIALECT_SPARK)} AS tokens")
    ).persist()
    grams = (
        toks_arr.filter(f"size(tokens) >= {n}")
        .selectExpr(
            "doc_id",
            f"posexplode({ngrams_sql('tokens', n, DIALECT_SPARK)}) AS (p0, g)",
        )
        .selectExpr(
            "doc_id",
            "p0 + 1 AS pos",
            f"{hex_prefix_int_sql('md5(g)', DIALECT_SPARK)} AS s",
        )
        .persist()
    )
    ag = grams.groupBy("s").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min(F.expr("doc_id * 1048576 + pos")).alias("own"),
    )
    flags = (
        grams.join(ag, "s")
        .selectExpr(
            "doc_id",
            "pos",
            "CAST(cnt >= 2 AND doc_id * 1048576 + pos <> own AS INT) AS dup",
        )
        .groupBy("doc_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list("
                "named_struct('pos', pos, 'dup', dup))), x -> x.dup)"
            ).alias("dupf")
        )
    )
    # token t (1-based) is cut iff every covering gram is dup: the
    # sliding-window min of dupf over [max(1, t-n+1) .. min(t, P)] is 1.
    cutf = (
        "CASE WHEN dupf IS NULL THEN array_repeat(0, size(tokens)) "
        "ELSE transform(tokens, (tok, i) -> CAST(array_min(slice(dupf, "
        f"greatest(1, i + 2 - {n}), "
        f"least(i + 1, size(dupf)) - greatest(1, i + 2 - {n}) + 1)) = 1 AS INT)) END"
    )
    out = (
        toks_arr.filter("size(tokens) >= 1")
        .join(flags, "doc_id", "left")
        .selectExpr(
            "doc_id",
            "CAST(size(tokens) AS BIGINT) AS n_tokens",
            f"inline(transform(array({cutf}), c -> named_struct("
            "'n_cut', CAST(aggregate(c, CAST(0 AS BIGINT), (a, x) -> a + x) "
            "AS BIGINT), "
            "'text_kept', array_join("
            "filter(tokens, (tok, i) -> element_at(c, i + 1) = 0), ' '))))",
        )
        .selectExpr("doc_id", "n_tokens", "n_cut", "text_kept")
    )
    return tag_cached_deps(out, toks_arr, grams)


EDGE_DOCS = [
    (1, ""),
    (2, "   "),
    (3, "one"),
    (4, "a b a b a b a b"),
    (5, "a b a b a b a b"),
    (6, "x y z w v u t s r q"),
    (7, "a b c d e a b c d e tail only here"),
    (8, "{brace} 'quote' {brace} 'quote' {brace} 'quote'"),
    (9, None),
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("opt-cut-probe-r13")
    spark.range(1_000_000).count()

    # ---- Phase 1: equality ------------------------------------------------
    edge = spark.createDataFrame(EDGE_DOCS, "doc_id long, text string")
    for nn in (2, 5):
        a = sorted(map(tuple, cut_old(edge, n=nn).collect()))
        b = sorted(map(tuple, cut_new(edge, n=nn).collect()))
        assert a == b, f"edge-case mismatch n={nn}: {a} vs {b}"
        print(f"edge cases equal at n={nn}: {len(a)} rows")
        spark.catalog.clearCache()
    for probe_sf in ("/root/testdata/sf0.01", sf_dir):
        dd = ParquetTarget("t", probe_sf).read(spark, "documents")
        a = sorted(map(tuple, cut_old(dd).collect()))
        spark.catalog.clearCache()
        b = sorted(map(tuple, cut_new(dd).collect()))
        spark.catalog.clearCache()
        assert a == b, f"mismatch at {probe_sf}: {len(a)} vs {len(b)}"
        print(f"cut_repeated_spans equal at {probe_sf}: {len(a)} rows")

    if os.environ.get("CUT_PROBE_PHASE1"):
        spark.stop()
        return

    # ---- Phase 2: interleaved A/B -----------------------------------------
    docs = ParquetTarget("t", sf_dir).read(spark, "documents")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "4"))
    builders = {"old": cut_old, "new": cut_new}
    times: dict[str, list[float]] = {"old": [], "new": []}
    for _ in range(reps):
        for name, build in builders.items():
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                build(docs).collect()
                best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
            times[name].append(round(best, 3))
    print("A/B cut_repeated_spans end-to-end (min of 2 per rep):")
    for name, ts in times.items():
        print(f"  {name}: {ts}  min={min(ts):.3f} median={sorted(ts)[len(ts)//2]:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
