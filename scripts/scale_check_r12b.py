"""Round-12 probe, part 2 (the r12 run OS-OOM-died inside DuckDB's
100x attribution_report oracle — 77 GB RSS before the kernel killed the
process; this continuation sets an explicit DuckDB ``memory_limit`` so
the twin FAILS IN-PROCESS like r11's OutOfMemoryException instead of
taking the probe down).  Collects only what part 1 didn't record:

1. duck 100x for the three 100x entries (attribution's twin expected
   to die — that IS the result);
2. the attribution_report salt A/B at 1x/10x/100x (salt=1 at 100x is
   already measured: 289.7 s by the registered entry in part 1 — only
   8/32 rerun at 100x to save ~10 min of known number);
3. capped-sample-state flatness rows.

    python scripts/scale_check_r12b.py
"""
from __future__ import annotations

import os
import sys

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

QUERIES_100 = (
    "hll_trailing_wau_events",
    "hll_overlap_events",
    "attribution_report_events",
)


def main() -> None:
    import duckdb

    from pgverify_spark import registry, session
    from pgverify_spark.session import get_spark

    session.TUNING_CONFS = {
        **session.TUNING_CONFS,
        "spark.driver.memory": "48g",
        "spark.sql.shuffle.partitions": "64",
    }
    build_replicated()
    build_replicated_100()
    spark = get_spark("pgverify-spark-scale-r12b")
    spark.range(1_000_000).select("id").summary().collect()
    oracles = registry.oracle_queries()

    # --- duck 100x, memory-limited so failure stays in-process -------
    duck100 = {}
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    con.execute("SET memory_limit='40GB'")
    for t_ in TABLES:
        p = f"{DST100}/{t_}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t_} AS SELECT * FROM read_parquet('{p}')")
    for name in QUERIES_100:
        try:
            duck100[name] = round(
                time_min2(lambda: con.execute(oracles[name]).fetchall()), 3
            )
        except Exception as ex:  # noqa: BLE001 — the OOM IS the result
            print(f"DUCK FAIL 100x {name}: {type(ex).__name__}: {ex}"[:200],
                  flush=True)
            duck100[name] = float("nan")
        print(f"duck 100x {name}: {duck100[name]:.3f}", flush=True)
    con.close()

    # --- salt A/B ------------------------------------------------------
    from pgverify_spark.operators import funnel as fm

    salt_rows = []
    for label, sf_dir, salts in (
        ("1x", SRC, (1, 8, 32)),
        ("10x", DST, (1, 8, 32)),
        ("100x", DST100, (8, 32)),
    ):
        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        walls = {1: 289.698 if label == "100x" else float("nan")}
        for s in salts:
            try:
                walls[s] = round(time_min2(
                    lambda: fm.attribution_report(events, salt=s).collect()
                ), 3)
            except Exception as ex:  # noqa: BLE001
                print(f"SALT FAIL {label} s={s}: {type(ex).__name__}", flush=True)
                walls[s] = float("nan")
            print(f"salt {label} s={s}: {walls[s]:.3f}", flush=True)
            spark.catalog.clearCache()
        mark = " (part-1 registered-entry run)" if label == "100x" else ""
        salt_rows.append(
            f"| {label} | {walls[1]:.3f}{mark} | {walls[8]:.3f} | {walls[32]:.3f} |"
        )

    # --- capped-state flatness ----------------------------------------
    import tempfile

    from pgverify_spark.operators import rollup

    cap = 2000
    cap_rows = []
    for label, sf_dir in (("1x", SRC), ("10x", DST), ("100x", DST100)):
        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        capped = tempfile.mkdtemp(prefix=f"pgvs_capstate_{label}_") + "/s"
        plain = tempfile.mkdtemp(prefix=f"pgvs_rawstate_{label}_") + "/s"
        rollup.write_sample_snapshot(events, capped, cap_per_day=cap)
        rollup.write_sample_snapshot(events, plain)
        n_cap = rollup.read_sample_snapshot(spark, capped).count()
        n_raw = rollup.read_sample_snapshot(spark, plain).count()
        t_cap = time_min2(lambda: rollup.update_sample_snapshot(
            spark, events, capped, (), cap_per_day=cap
        ).collect())
        t_raw = time_min2(lambda: rollup.update_sample_snapshot(
            spark, events, plain, ()
        ).collect())
        cap_rows.append(
            f"| {label} | {n_raw} | {n_cap} | {t_raw:.3f} | {t_cap:.3f} |"
        )
        print(cap_rows[-1], flush=True)

    lines = [
        "",
        "### r12b: duck 100x (memory-limited), salt A/B, capped-state flatness",
        "",
        "| entry | duck 100x |",
        "|---|---|",
        *(f"| {n} | {duck100[n]:.3f} |" for n in QUERIES_100),
        "",
        "### attribution_report salt A/B (Spark wall, output identical at every salt)",
        "",
        "| scale | salt=1 | salt=8 | salt=32 |",
        "|---|---|---|---|",
        *salt_rows,
        "",
        f"### capped sample state (cap_per_day={cap}) vs uncapped",
        "",
        "| scale | state rows (uncapped) | state rows (capped) | "
        "quantile wall uncapped | capped |",
        "|---|---|---|---|---|",
        *cap_rows,
    ]
    out = "\n".join(lines) + "\n"
    print(out)
    with open("SCALE_CHECK_r12b.partial.md", "w") as fh:
        fh.write(out)


if __name__ == "__main__":
    main()
