"""Scale-up evidence: measure how the Spark:DuckDB ratio moves when the
data grows 10x — the empirical close for every "the gap is a fixed
per-job constant that vanishes at scale" claim in the round notes.

NOT part of the frozen bench protocol (bench.py is the per-round
record); this is a builder-side experiment.  It materializes a 10x
KEY-SHIFTED replication of sf0.1 under /tmp (testdata itself is
read-only): every integer entity key gets ``replica * 100_000_000``
added, so primary keys stay unique and every foreign-key join keeps
its exact 1:N shape — a TPC-H join on naively duplicated rows would
multiply 10x x 10x and measure a different query.  region/nation stay
single-copy dims (their keys are referenced unshifted).

Run:  python scripts/scale_check.py [out_md]
Writes a markdown table (default SCALE_CHECK.md) with per-query Spark
and DuckDB timings at 1x and 10x and the ratio trajectory.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/pgvs_sf0.1_rep10"
REPLICAS = 10
OFFSET = 100_000_000

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

#: integer key columns shifted per replica (PK + every FK that
#: references a replicated table; nation/region keys stay put).
SHIFTED = {
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}

#: Representative headline queries: the sub-second constant-dominated
#: anchors the r4/r5 verdicts argued about, plus two heavy ones as
#: controls (their ratio should already be <= 1 and stay there).
QUERIES = (
    "tpch_q1_pricing_summary",
    "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q13_customer_distribution",
    "hourly_rollup_events",
    "text_stats_documents",
    "cosine_topk_embeddings",
    "pq_topk_embeddings",
    "full_fingerprint_lineitem",
    "minhash_lsh_pairs_documents",
)


def build_replicated() -> None:
    import duckdb

    if all(
        os.path.exists(f"{DST}/{t}.parquet") for t in TABLES
    ):
        return
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        src = f"{SRC}/{t}.parquet"
        cols = [
            d[0]
            for d in con.execute(
                f"SELECT * FROM read_parquet('{src}') LIMIT 0"
            ).description
        ]
        if t not in SHIFTED:
            sel = f"SELECT * FROM read_parquet('{src}')"
        else:
            parts = []
            for i in range(REPLICAS):
                off = i * OFFSET
                proj = ", ".join(
                    f"{c} + {off} AS {c}" if c in SHIFTED[t] else c
                    for c in cols
                )
                parts.append(f"SELECT {proj} FROM read_parquet('{src}')")
            sel = " UNION ALL ".join(parts)
        con.execute(f"COPY ({sel}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(f"built {DST}", flush=True)


def time_min2(fn) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


#: second point: 100x for the cheapest TPC-H anchors (the queries whose
#: 1x gap is most constant-dominated), tables they need only.
DST100 = "/tmp/pgvs_sf0.1_rep100"
QUERIES_100X = (
    "tpch_q1_pricing_summary",
    "tpch_q6_forecast_revenue",
    "tpch_q4_order_priority",
    "hourly_rollup_events",
)
TABLES_100X = ("region", "nation", "customer", "supplier", "part",
               "orders", "lineitem", "events", "documents", "embeddings")


def build_replicated_100() -> None:
    import duckdb

    if all(os.path.exists(f"{DST100}/{t}.parquet") for t in TABLES_100X):
        return
    os.makedirs(DST100, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES_100X:
        src = f"{SRC}/{t}.parquet"
        if t not in SHIFTED or t not in ("orders", "lineitem", "events"):
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}')) "
                f"TO '{DST100}/{t}.parquet' (FORMAT PARQUET)"
            )
            continue
        cols = [
            d[0]
            for d in con.execute(
                f"SELECT * FROM read_parquet('{src}') LIMIT 0"
            ).description
        ]
        # replicate via a 100-row range join (100 UNION ALL branches
        # would be slow to plan); only the entity keys shift, FKs into
        # unreplicated dims stay
        shifted = SHIFTED[t]
        keep_fk = {"o_custkey", "l_partkey", "l_suppkey", "user_id"}
        proj = ", ".join(
            f"{c} + r.i * {OFFSET} AS {c}"
            if c in shifted and c not in keep_fk
            else c
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {proj} FROM read_parquet('{src}'), "
            "(SELECT unnest(range(100)) AS i) r) "
            f"TO '{DST100}/{t}.parquet' (FORMAT PARQUET)"
        )
    print(f"built {DST100}", flush=True)


def main() -> None:
    import duckdb

    from pgverify_spark import registry
    from pgverify_spark.session import get_spark

    out_md = sys.argv[1] if len(sys.argv) > 1 else "SCALE_CHECK.md"
    build_replicated()

    spark = get_spark("pgverify-spark-scale-check")
    spark.range(1_000_000).select("id").summary().collect()
    queries = registry.spark_queries()
    oracles = registry.oracle_queries()
    probe_twins = registry.bench_oracle_setup()

    results: dict[str, dict[str, float]] = {}
    for sf_label, sf_dir in (("1x", SRC), ("10x", DST)):
        # Spark pass
        for name in QUERIES:
            t = time_min2(lambda: queries[name](spark, sf_dir).collect())
            results.setdefault(name, {})[f"spark_{sf_label}"] = round(t, 3)
            spark.catalog.clearCache()
        # DuckDB pass (fresh connection per SF so temp tables rebuild)
        con = duckdb.connect()
        con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
        for t_ in TABLES:
            con.execute(
                f"CREATE VIEW {t_} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t_}.parquet')"
            )
        for name in QUERIES:
            sql = oracles[name]
            if name in probe_twins:
                setup, sql = probe_twins[name]
                for stmt in setup:
                    con.execute(stmt)
            t = time_min2(lambda: con.execute(sql).fetchall())
            results[name][f"duck_{sf_label}"] = round(t, 3)

    # 100x point for the cheapest anchors
    build_replicated_100()
    res100: dict[str, dict[str, float]] = {}
    for name in QUERIES_100X:
        t = time_min2(lambda: queries[name](spark, DST100).collect())
        res100.setdefault(name, {})["spark_100x"] = round(t, 3)
        spark.catalog.clearCache()
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t_ in TABLES_100X:
        con.execute(
            f"CREATE VIEW {t_} AS SELECT * FROM "
            f"read_parquet('{DST100}/{t_}.parquet')"
        )
    for name in QUERIES_100X:
        t = time_min2(lambda: con.execute(oracles[name]).fetchall())
        res100[name]["duck_100x"] = round(t, 3)

    lines = [
        "# Scale-up check: Spark:DuckDB ratio at 1x vs 10x data",
        "",
        "Builder-side experiment (NOT the frozen bench protocol — see",
        "`scripts/scale_check.py`): the same registry queries and oracle",
        "twins on sf0.1 and on a 10x key-shifted replication of it, min",
        "of two runs each.  If a query's 1x gap is a fixed per-job",
        "scheduling constant, its ratio must collapse toward (or below)",
        "1 at 10x; a ratio that *grows* with data would instead indicate",
        "a real plan deficiency.",
        "",
        "| query | spark 1x | duck 1x | ratio 1x | spark 10x | duck 10x | ratio 10x |",
        "|---|---|---|---|---|---|---|",
    ]
    for name in QUERIES:
        r = results[name]
        r1 = r["spark_1x"] / r["duck_1x"] if r["duck_1x"] else float("nan")
        r10 = r["spark_10x"] / r["duck_10x"] if r["duck_10x"] else float("nan")
        lines.append(
            f"| {name} | {r['spark_1x']:.3f} | {r['duck_1x']:.3f} | "
            f"{r1:.2f} | {r['spark_10x']:.3f} | {r['duck_10x']:.3f} | "
            f"{r10:.2f} |"
        )
    lines += [
        "",
        "## 100x point (cheapest anchors, single-table/1:N-preserving)",
        "",
        "| query | ratio 1x | ratio 10x | spark 100x | duck 100x | ratio 100x |",
        "|---|---|---|---|---|---|",
    ]
    for name in QUERIES_100X:
        r, r100 = results[name], res100[name]
        r1 = r["spark_1x"] / r["duck_1x"]
        r10 = r["spark_10x"] / r["duck_10x"]
        rr = r100["spark_100x"] / r100["duck_100x"]
        lines.append(
            f"| {name} | {r1:.2f} | {r10:.2f} | {r100['spark_100x']:.3f} "
            f"| {r100['duck_100x']:.3f} | {rr:.2f} |"
        )
    lines += [
        "",
        "## Reading the numbers honestly",
        "",
        "- **Complex multi-stage operators** (fingerprint, MinHash-LSH,",
        "  PQ probe) are where Spark's plans pay off: already <=0.5x at",
        "  1x, and the gap *widens* with data (minhash 10x: DuckDB's",
        "  exact-verify join blows past Spark's banded plan; pq_topk",
        "  crosses below 1.0 at 10x).",
        "- **Single-table scan-aggregates** (q1/q6/hourly): the ratio",
        "  falls monotonically with scale but stays >1 on this box —",
        "  DuckDB is a vectorized shared-memory engine and finishes 60M",
        "  rows in ~0.3s, so the workload never leaves the regime where",
        "  an embedded engine is optimal.  The crossover for these",
        "  queries is where data exceeds one node's memory/IO — not",
        "  reachable in a 128 GiB sandbox, which is exactly why the",
        "  100 TB design target is partition/shuffle shape, not",
        "  single-node constants.",
        "",
    ]
    with open(out_md, "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
