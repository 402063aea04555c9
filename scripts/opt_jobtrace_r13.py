"""Per-job timeline for selected headline entries (r13, guide §1.1).

For each named query: warm it once at sf0.001 and once at the target
SF (codegen + memoized stores), clearCache, then run it once more and
print every Spark job it scheduled — duration, stage count, task
count — via the status tracker, plus the gaps between jobs (pure
driver time: plan build, py4j, AQE re-optimization, collect transfer).

    python scripts/opt_jobtrace_r13.py <query> [query...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pgverify_spark import registry  # noqa: E402
from pgverify_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("opt-jobtrace-r13")
    sc = spark.sparkContext
    spark.range(1_000_000).count()
    queries = registry.spark_queries()

    for name in names:
        if name not in queries:
            print(f"!! {name}: not in registry")
            continue
        queries[name](spark, "/root/testdata/sf0.001").collect()
        spark.catalog.clearCache()
        queries[name](spark, sf_dir).collect()  # warm memoized stores
        spark.catalog.clearCache()
        group = f"trace:{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).collect()
        wall = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        want = set(sc.statusTracker().getJobIdsForGroup(group))
        store = sc._jsc.sc().statusStore()
        jdatas = []
        it = store.jobsList(None)
        for i in range(it.size()):
            jd = it.apply(i)
            if jd.jobId() in want:
                jdatas.append(jd)
        jdatas.sort(key=lambda jd: jd.jobId())
        print(f"\n=== {name}: wall {wall:.3f}s, {len(jdatas)} jobs ===")
        total_job = 0.0
        prev_end = None
        for jd in jdatas:
            sub = jd.submissionTime().get().getTime()
            end = (
                jd.completionTime().get().getTime()
                if jd.completionTime().isDefined()
                else sub
            )
            dur = (end - sub) / 1000.0
            gap = (sub - prev_end) / 1000.0 if prev_end is not None else 0.0
            prev_end = end
            total_job += dur
            desc = ""
            print(
                f"  job {jd.jobId()}: {dur:7.3f}s (+gap {gap:6.3f}s) "
                f"stages={jd.stageIds().size()} tasks={jd.numTasks()}{desc}"
            )
        print(
            f"  sum(job walls) {total_job:.3f}s; driver/gap time "
            f"~{wall - total_job:.3f}s"
        )
    spark.stop()


if __name__ == "__main__":
    main()
