"""Phase-labeled job census of the quantile-IVM path (r12, guide §1).

Replays quantile_ivm_events' exact steps (snapshot build untimed, then
the timed splice + read-back + distributed rank) with per-phase wall
times and Spark job counts, so the optimization targets the phase that
actually costs, not the one that looks expensive in the plan.

    python scripts/opt_quantile_probe.py [reps]
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pgverify_spark import registry  # noqa: E402
from pgverify_spark.functions import timecol  # noqa: E402
from pgverify_spark.operators import rollup  # noqa: E402
from pgverify_spark.session import ensure_required_confs, get_spark  # noqa: E402
from pgverify_spark.sources.parquet import ParquetTarget  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("opt-quantile-probe")
    ensure_required_confs(spark)
    sc = spark.sparkContext
    spark.range(1_000_000).summary().collect()

    left = ParquetTarget("t", sf_dir).read(spark, "events")
    day = timecol.bucket_sql(left, timecol.US_PER_DAY)
    changed = left.filter(f"{day} <> 19724").selectExpr(
        "event_id", "ts", "user_id", "event_type",
        f"CASE WHEN {day} = 19723 AND event_id % 7 = 0 "
        "THEN value + 50 ELSE value END AS value",
        "props",
    )
    state = tempfile.mkdtemp(prefix="pgvs_qprobe_") + "/state"
    rollup.write_sample_snapshot(left, state)  # untimed, like the bench memo

    # warm codegen at sf0.001 like bench.py does
    warm = ParquetTarget("t", "/root/testdata/sf0.001").read(spark, "events")
    wday = timecol.bucket_sql(warm, timecol.US_PER_DAY)
    wchanged = warm.filter(f"{wday} <> 19724").selectExpr(
        "event_id", "ts", "user_id", "event_type",
        f"CASE WHEN {wday} = 19723 AND event_id % 7 = 0 "
        "THEN value + 50 ELSE value END AS value",
        "props",
    )
    wstate = tempfile.mkdtemp(prefix="pgvs_qprobe_") + "/state"
    rollup.write_sample_snapshot(warm, wstate)
    rollup.update_sample_snapshot(spark, wchanged, wstate, (19723, 19724)).collect()
    spark.catalog.clearCache()

    def phase(tag, fn):
        g = f"ph:{tag}"
        sc.setJobGroup(g, tag)
        before = sc.statusTracker().getJobIdsForGroup(g)
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        jobs = len(sc.statusTracker().getJobIdsForGroup(g)) - len(before)
        print(f"  {tag:28s} {dt*1000:8.1f} ms  jobs+{jobs}", flush=True)
        sc.setJobGroup(None, None)
        return out

    from pgverify_spark.operators.sketch import quantiles_from_sample
    from pgverify_spark.sources import manifest
    from pyspark.sql import functions as F

    for rep in range(reps):
        print(f"rep {rep}", flush=True)
        t0 = time.perf_counter()

        def splice():
            day_sql = timecol.bucket_sql(changed, timecol.US_PER_DAY)
            fresh = rollup._day_sample(
                changed.filter(f"({day_sql}) IN (19723, 19724)"),
                "value", "event_id", 50_000, None,
            )
            prev = manifest.current_entries(spark, state)
            gen = manifest.new_generation()
            fresh.write.partitionBy("day").parquet(f"{state}/{gen}")
            dropped = {"day=19723", "day=19724"}
            kept = [e for e in prev if e.rsplit("/", 1)[-1] not in dropped]
            manifest.commit(
                spark, state, kept + rollup._gen_day_entries(spark, state, gen),
                schema_json=manifest.read_back_schema(fresh, ("day",)),
            )

        phase("splice-write+commit", splice)
        s = phase(
            "read_state-plan",
            lambda: rollup.read_sample_snapshot(spark, state).select("v", "hk"),
        )
        q = phase("rank-plan", lambda: quantiles_from_sample(s))
        rows = phase("final-collect", q.collect)
        print(
            f"  total {time.perf_counter()-t0:6.3f} s  rows={len(rows)}",
            flush=True,
        )
        spark.catalog.clearCache()

    spark.stop()


if __name__ == "__main__":
    main()
