"""A/B runtime-settable conf experiments over a representative query
subset (r12 optimization instrument; guide §2.2 — partition sizing).

    python scripts/opt_conf_ab.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pgverify_spark import registry  # noqa: E402
from pgverify_spark.session import get_spark  # noqa: E402

SUBSET = [
    "pagerank_term_graph_documents",
    "incident_report_events",
    "repair_apply_orders",
    "row_diff_orders",
    "hourly_rollup_events",
    "tfidf_top_terms_documents",
    "heavy_hitters_lineitem",
    "funnel_events",
    "tpch_q3_shipping_priority",
    "cohort_retention_events",
    "semantic_dup_pairs_documents",
    "quantile_ivm_events",
    "full_fingerprint_lineitem",
    "drilldown_row_diff_events",
]

CONFS = {
    "base": {},
    "coalesce_bytes": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "67108864",
    },
    "shufpart8": {"spark.sql.shuffle.partitions": "8"},
    "coalesce_bytes_16m": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16777216",
    },
}

DEFAULTS = {
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "true",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "67108864",
    "spark.sql.shuffle.partitions": "32",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("opt-conf-ab")
    spark.range(1_000_000).select("id").summary().collect()
    queries = registry.spark_queries()

    warm_dir = "/root/testdata/sf0.001"
    for name in SUBSET:
        queries[name](spark, warm_dir).collect()
    spark.catalog.clearCache()

    results: dict[str, dict[str, float]] = {}
    for tag, confs in CONFS.items():
        for k, v in DEFAULTS.items():
            spark.conf.set(k, v)
        for k, v in confs.items():
            spark.conf.set(k, v)
        t: dict[str, float] = {}
        for name in SUBSET:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                queries[name](spark, sf_dir).collect()
                best = min(best, time.perf_counter() - t0)
            t[name] = round(best, 3)
            spark.catalog.clearCache()
        results[tag] = t
        print(f"== {tag}: total {sum(t.values()):.2f}s", flush=True)

    names = SUBSET
    hdr = "query".ljust(45) + "".join(f"{c:>18s}" for c in CONFS)
    print(hdr)
    for n in names:
        print(n.ljust(45) + "".join(f"{results[c][n]:18.3f}" for c in CONFS))
    for c in CONFS:
        print(f"TOTAL {c}: {sum(results[c].values()):.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
