"""Round-12 optimization profiler: per-headline-query wall time, Spark
job count, and formatted plan capture.

NOT part of the frozen bench protocol (bench.py is unchanged); this is
the builder-side instrument for the r12 optimization pass — guide §1:
measure first, capture .explain("formatted"), label jobs.

    python scripts/opt_profile_r12.py [before|after] [key_filter...]

Writes plans/r12/<query>_<tag>.txt and prints one line per query:
``<name> <best_sec> jobs=<n> stages=<n>`` (min of two timed runs,
collect-based like bench.py so numbers are comparable), plus a JSON
summary at the end to /tmp/opt_profile_<tag>.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pgverify_spark import registry  # noqa: E402
from pgverify_spark.session import get_spark  # noqa: E402


def explain_str(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    filters = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("opt-profile-r12")
    sc = spark.sparkContext
    spark.range(1_000_000).select("id").summary().collect()

    queries = registry.spark_queries()
    headline = [n for n in registry.HEADLINE_QUERIES if n in queries]
    if filters:
        headline = [n for n in headline if any(f in n for f in filters)]

    warm_dir = "/root/testdata/sf0.001"
    for name in headline:
        queries[name](spark, warm_dir).collect()
    spark.catalog.clearCache()

    results: dict[str, dict] = {}
    for name in headline:
        sc.setJobGroup(f"q:{name}", name)
        best = float("inf")
        reps = int(os.environ.get("SPARK_GRAFT_PROFILE_REPS", "2"))
        jobs0 = sc.statusTracker().getJobIdsForGroup(f"q:{name}")
        for _ in range(reps):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        jobs = sc.statusTracker().getJobIdsForGroup(f"q:{name}")
        n_jobs = (len(jobs) - len(jobs0)) / float(reps)
        # plan capture AFTER execution so memoized stores exist; this is
        # the plan of a fresh build of the same query
        df = queries[name](spark, sf_dir)
        plan = explain_str(df)
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        n_exch = plan.count("Exchange")
        results[name] = {
            "sec": round(best, 3),
            "jobs_per_run": n_jobs,
            "plan_exchanges": n_exch,
        }
        print(f"{name} {best:.3f}s jobs/run={n_jobs:.1f} exch={n_exch}", flush=True)
        spark.catalog.clearCache()
        sc.setJobGroup(None, None)

    with open(f"/tmp/opt_profile_{tag}.json", "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    total = sum(r["sec"] for r in results.values())
    print(f"TOTAL {total:.2f}s over {len(results)} queries", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
