"""Round-13 optimization profiler: per-headline-query wall time split
into BUILD (registry callable returns a DataFrame — driver-side py4j +
Catalyst work, plus any jobs a composed entry runs eagerly at build
time) and COLLECT (executing the returned plan), plus job counts and a
formatted-plan capture.

NOT part of the frozen bench protocol (bench.py unchanged); builder-side
instrument for the r13 optimization pass — guide §1: measure first.

    python scripts/opt_profile_r13.py [tag] [key_filter...]

Prints one line per query:
``<name> <best_sec> build=<sec> collect=<sec> jobs=<n> exch=<n>``
(min of SPARK_GRAFT_PROFILE_REPS timed runs, collect-based like
bench.py), writes plans/r13/<query>_<tag>.txt and a JSON summary to
/tmp/opt_profile_r13_<tag>.json.
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
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("opt-profile-r13")
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
    capture_plans = not os.environ.get("SPARK_GRAFT_PROFILE_NOPLANS")
    for name in headline:
        sc.setJobGroup(f"q:{name}", name)
        best = float("inf")
        best_build = best_collect = None
        reps = int(os.environ.get("SPARK_GRAFT_PROFILE_REPS", "2"))
        jobs0 = sc.statusTracker().getJobIdsForGroup(f"q:{name}")
        for _ in range(reps):
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.collect()
            t2 = time.perf_counter()
            if t2 - t0 < best:
                best, best_build, best_collect = t2 - t0, t1 - t0, t2 - t1
        jobs = sc.statusTracker().getJobIdsForGroup(f"q:{name}")
        n_jobs = (len(jobs) - len(jobs0)) / float(reps)
        results[name] = {
            "sec": round(best, 3),
            "build_sec": round(best_build, 3),
            "collect_sec": round(best_collect, 3),
            "jobs_per_run": n_jobs,
        }
        if capture_plans:
            # plan of a fresh build of the same query, captured after
            # execution so memoized stores exist
            plan = explain_str(queries[name](spark, sf_dir))
            with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(plan)
            results[name]["plan_exchanges"] = plan.count("Exchange")
        print(
            f"{name} {best:.3f}s build={best_build:.3f} "
            f"collect={best_collect:.3f} jobs/run={n_jobs:.1f} "
            f"exch={results[name].get('plan_exchanges', -1)}",
            flush=True,
        )
        spark.catalog.clearCache()
        sc.setJobGroup(None, None)

    with open(f"/tmp/opt_profile_r13_{tag}.json", "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    total = sum(r["sec"] for r in results.values())
    tb = sum(r["build_sec"] for r in results.values())
    tc = sum(r["collect_sec"] for r in results.values())
    print(
        f"TOTAL {total:.2f}s (build {tb:.2f}s, collect {tc:.2f}s) "
        f"over {len(results)} queries",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
