"""Subset A/B with the EXACT frozen bench protocol (r12 instrument).

Replicates bench.py's measurement for a chosen query subset under
runtime-settable conf variants: warm-up pass at sf0.001 per variant,
then per query min of 2 timed runs x SPARK_GRAFT_BENCH_REPS passes,
``clearCache`` between queries.  Used to attribute suite-level bench
moves to a specific conf (e.g. AQE coalescing mode) without paying a
full 118-query + oracle run per hypothesis.

    SPARK_GRAFT_SUBSET=q1,q2 SPARK_GRAFT_AB_CONFS='{"name": {...}}' \
        python scripts/opt_bench_subset.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pgverify_spark import registry  # noqa: E402
from pgverify_spark.session import get_spark  # noqa: E402

DEFAULT_SUBSET = [
    "full_fingerprint_lineitem",
    "verify_report_lineitem_pair",
    "ngram_jaccard_pairs_documents",
    "pagerank_term_graph_documents",
    "pagerank_weighted_term_graph_documents",
    "kmv_shingle_overlap_documents",
    "cut_repeated_spans_documents",
    "repair_apply_orders",
    "row_diff_orders",
    "generation_diff_orders",
    "verified_delete_orders",
    "incident_report_events",
    "semantic_dedup_filter_documents",
    "hashed_text_topk_documents",
    "tpch_q18_large_volume_customer",
    "gopher_gate_documents",
    "contamination_spans_documents",
]

#: conf name -> {conf: value}; every conf here must be runtime-settable.
DEFAULT_CONFS = {
    # NOTE: batch 2 reverted parallelismFirst=false, so {} is now the
    # stock AQE default; the "parfirst" variant is a no-op kept for the
    # recorded A/B's reproducibility.
    "bytes64m": {},
    "parfirst": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "true",
    },
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = "/root/testdata/sf0.001"
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    subset = [
        q.strip()
        for q in os.environ.get("SPARK_GRAFT_SUBSET", "").split(",")
        if q.strip()
    ] or DEFAULT_SUBSET
    confs = (
        json.loads(os.environ["SPARK_GRAFT_AB_CONFS"])
        if os.environ.get("SPARK_GRAFT_AB_CONFS")
        else DEFAULT_CONFS
    )

    spark = get_spark("opt-bench-subset")
    spark.range(1_000_000).select("id").summary().collect()
    queries = registry.spark_queries()
    subset = [q for q in subset if q in queries]
    base = {
        k: spark.conf.get(k)
        for variant in confs.values()
        for k in variant
    }

    results: dict[str, dict[str, float]] = {}
    for cname, overrides in confs.items():
        for k, v in {**base, **overrides}.items():
            spark.conf.set(k, v)
        for name in subset:  # per-variant warm-up (codegen per plan shape)
            queries[name](spark, warm_dir).collect()
        spark.catalog.clearCache()
        per_q: dict[str, float] = {}
        for _ in range(reps):
            for name in subset:
                best = per_q.get(name, float("inf"))
                for _ in range(2):
                    t0 = time.perf_counter()
                    queries[name](spark, sf_dir).collect()
                    best = min(best, time.perf_counter() - t0)
                per_q[name] = best
                spark.catalog.clearCache()
        results[cname] = {q: round(t, 4) for q, t in per_q.items()}
        for k, v in base.items():
            spark.conf.set(k, v)

    out = {
        "subset_totals": {c: round(sum(t.values()), 4) for c, t in results.items()},
        "per_query": results,
        "reps": reps,
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
