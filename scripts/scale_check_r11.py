"""Round-11 scale probes (methodology as scale_check.py — builder-side
experiment, NOT the frozen bench protocol):

1. 100x points for the r10 families that had only 10x evidence
   (r10 VERDICT item 5): attribution (last-touch + the composed
   report), HLL-IVM / trailing WAU / overlap, SCD2 intervals +
   point-in-time, incident runbook — all events-based, so the
   existing 100x events replication serves them.
2. Replicate rows for the r11 composed-entry constant fix (VERDICT
   item 2): attribution_report_events and incident_report_events at
   1x/10x after the shared-relation persist — compare against the r10
   rows (report 7.0x at 10x, runbook stages re-planned per stage).
3. k-core at 100x EDGES: the operator takes a pair relation, so the
   probe replicates the sf0.1 LSH pair graph 100x with shifted node
   ids (100 disjoint components — peel work scales with edges while
   per-round semantics stay identical), isolating the peel loop from
   LSH the same way the r10 PageRank 26M-edge probe did.

    python scripts/scale_check_r11.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_check import (  # noqa: E402
    DST,
    DST100,
    SRC,
    TABLES,
    build_replicated,
    build_replicated_100,
    time_min2,
)

#: events-based entries probed at 1x / 10x / 100x.
QUERIES_100 = (
    "attribution_events",
    "attribution_report_events",
    "hll_ivm_events",
    "hll_trailing_wau_events",
    "hll_overlap_events",
    "scd2_intervals_events",
    "scd2_point_in_time_events",
    "incident_report_events",
)


def _duck_pass(sf_dir: str, names, oracles) -> dict[str, float]:
    import duckdb

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t_ in TABLES:
        p = f"{sf_dir}/{t_}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t_} AS SELECT * FROM read_parquet('{p}')"
            )
    out = {}
    for name in names:
        try:
            out[name] = round(
                time_min2(lambda: con.execute(oracles[name]).fetchall()), 3
            )
        except Exception as ex:  # noqa: BLE001 — probe must not stop
            print(f"DUCK FAIL {name}: {type(ex).__name__}", flush=True)
            out[name] = float("nan")
    con.close()
    return out


def main() -> None:
    from pgverify_spark import registry, session
    from pgverify_spark.session import get_spark

    # builder-side experiment heap: the default 8g local-mode JVM is
    # sized for sf0.1 (the bench protocol) — a 100x row_diff shuffle
    # needs real headroom, and the host has 128 GiB
    session.TUNING_CONFS = {
        **session.TUNING_CONFS,
        "spark.driver.memory": "48g",
        "spark.sql.shuffle.partitions": "64",
    }
    build_replicated()
    build_replicated_100()
    spark = get_spark("pgverify-spark-scale-r11")
    spark.range(1_000_000).select("id").summary().collect()
    queries = registry.spark_queries()
    oracles = registry.oracle_queries()

    results: dict[str, dict[str, float]] = {}
    for label, sf_dir in (("1x", SRC), ("10x", DST), ("100x", DST100)):
        for name in QUERIES_100:
            try:
                t = time_min2(lambda: queries[name](spark, sf_dir).collect())
            except Exception as ex:  # noqa: BLE001 — probe must not stop
                print(f"SPARK FAIL {label} {name}: {type(ex).__name__}", flush=True)
                t = float("nan")
            results.setdefault(name, {})[f"spark_{label}"] = round(t, 3)
            print(f"spark {label} {name}: {t:.3f}", flush=True)
            spark.catalog.clearCache()
        try:
            duck = _duck_pass(sf_dir, QUERIES_100, oracles)
        except Exception as ex:  # noqa: BLE001
            print(f"DUCK FAIL {label}: {type(ex).__name__}", flush=True)
            duck = {n: float("nan") for n in QUERIES_100}
        for name in QUERIES_100:
            results[name][f"duck_{label}"] = duck[name]
            print(f"duck {label} {name}: {duck[name]:.3f}", flush=True)

    # k-core at 100x edges: replicate the 1x LSH pair graph with
    # shifted ids (disjoint components), then time the peel alone
    from pyspark.sql import functions as F

    from pgverify_spark.operators import dedup, graph

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    pairs1 = (
        dedup.minhash_lsh_pairs(docs, 0.3).select("doc_a", "doc_b").persist()
    )
    n1 = pairs1.count()
    reps = spark.range(100).select(F.col("id").alias("rep"))
    pairs100 = (
        pairs1.crossJoin(F.broadcast(reps))
        .selectExpr(
            "doc_a + rep * 100000000 AS doc_a",
            "doc_b + rep * 100000000 AS doc_b",
        )
        .persist()
    )
    n100 = pairs100.count()
    t1 = time_min2(lambda: graph.k_core(pairs1, k=2, rounds=6).collect())
    t100 = time_min2(lambda: graph.k_core(pairs100, k=2, rounds=6).collect())
    kcore_row = (
        f"| k_core peel k=2 (pairs-only probe) | {n1} edges: {t1:.3f} s "
        f"| {n100} edges: {t100:.3f} s | {t100 / max(t1, 1e-9):.1f}x wall "
        f"for 100x edges |"
    )
    pairs1.unpersist()
    pairs100.unpersist()

    lines = [
        "",
        "## r11: 100x points for the r10 families + composed-entry re-measure "
        "(rep100 events tables, warm/min-of-2, idle host)",
        "",
        "| entry | spark 1x | duck 1x | ratio 1x | spark 10x | duck 10x | "
        "ratio 10x | spark 100x | duck 100x | ratio 100x |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for name in QUERIES_100:
        r = results[name]
        def ratio(lbl):
            return r[f"spark_{lbl}"] / r[f"duck_{lbl}"] if r[f"duck_{lbl}"] else float("nan")
        lines.append(
            f"| {name} | {r['spark_1x']:.3f} | {r['duck_1x']:.3f} | {ratio('1x'):.2f} "
            f"| {r['spark_10x']:.3f} | {r['duck_10x']:.3f} | {ratio('10x'):.2f} "
            f"| {r['spark_100x']:.3f} | {r['duck_100x']:.3f} | {ratio('100x'):.2f} |"
        )
    lines += [
        "",
        "### k-core at 100x edges (operator-isolated, disjoint-component replication)",
        "",
        "| probe | 1x | 100x | scaling |",
        "|---|---|---|---|",
        kcore_row,
    ]
    out = "\n".join(lines) + "\n"
    print(out)
    with open("SCALE_CHECK.md", "a") as fh:
        fh.write(out)


if __name__ == "__main__":
    main()
