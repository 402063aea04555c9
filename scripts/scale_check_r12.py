"""Round-12 scale probes (methodology as scale_check.py — builder-side
experiment, NOT the frozen bench protocol):

1. Attribution-report salt A/B at 1x/10x/100x hot-user events (r11
   VERDICT item 5): the registered entry's 100x wall was 291 s with the
   join's quadratic pair build concentrated per user; measure salt in
   {1, 8, 32} to pick the shipped default with evidence.
2. hll_trailing_wau / hll_overlap at 1x/10x/100x after the r12 constant
   shaves (one-scan overlap, broadcast days join) — r11 VERDICT item 4
   wants these under ~3x of the twin at 100x or a measured write-up.
3. Capped-sample state: state ROW COUNT and whole-state quantile wall
   at 1x/10x/100x for cap_per_day=2000 vs uncapped — the flat-state
   proof r11 VERDICT item 2 asks for.
4. The four de-whitelisted quantile entries (distributed rank) at
   1x/10x — regression guard for the r12 rank rewrite.

    python scripts/scale_check_r12.py
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

#: post-shave HLL rows + rank-rewrite regression rows, vs their twins.
QUERIES_100 = (
    "hll_trailing_wau_events",
    "hll_overlap_events",
    "attribution_report_events",
)
QUERIES_10 = (
    "sampled_quantiles_orders",
    "quantile_ivm_events",
    "quantile_range_rollup_events",
    "quantile_ivm_capped_events",
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

    session.TUNING_CONFS = {
        **session.TUNING_CONFS,
        "spark.driver.memory": "48g",
        "spark.sql.shuffle.partitions": "64",
    }
    build_replicated()
    build_replicated_100()
    spark = get_spark("pgverify-spark-scale-r12")
    spark.range(1_000_000).select("id").summary().collect()
    queries = registry.spark_queries()
    oracles = registry.oracle_queries()

    results: dict[str, dict[str, float]] = {}
    for label, sf_dir, names in (
        ("1x", SRC, QUERIES_100 + QUERIES_10),
        ("10x", DST, QUERIES_100 + QUERIES_10),
        ("100x", DST100, QUERIES_100),
    ):
        for name in names:
            try:
                t = time_min2(lambda: queries[name](spark, sf_dir).collect())
            except Exception as ex:  # noqa: BLE001
                print(f"SPARK FAIL {label} {name}: {type(ex).__name__}", flush=True)
                t = float("nan")
            results.setdefault(name, {})[f"spark_{label}"] = round(t, 3)
            print(f"spark {label} {name}: {t:.3f}", flush=True)
            spark.catalog.clearCache()
        duck = _duck_pass(sf_dir, names, oracles)
        for name in names:
            results[name][f"duck_{label}"] = duck[name]
            print(f"duck {label} {name}: {duck[name]:.3f}", flush=True)

    # --- salt A/B on the composed report (Spark side only: the salt
    # changes the Spark plan, not the oracle) -------------------------
    from pgverify_spark.operators import funnel as fm

    salt_rows = []
    for label, sf_dir in (("1x", SRC), ("10x", DST), ("100x", DST100)):
        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        walls = {}
        for s in (1, 8, 32):
            try:
                walls[s] = round(time_min2(
                    lambda: fm.attribution_report(events, salt=s).collect()
                ), 3)
            except Exception as ex:  # noqa: BLE001
                print(f"SALT FAIL {label} s={s}: {type(ex).__name__}", flush=True)
                walls[s] = float("nan")
            print(f"salt {label} s={s}: {walls[s]:.3f}", flush=True)
            spark.catalog.clearCache()
        salt_rows.append(
            f"| {label} | {walls[1]:.3f} | {walls[8]:.3f} | {walls[32]:.3f} |"
        )

    # --- capped-state flatness: rows + whole-state quantile wall ------
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
        "## r12: post-shave HLL + salted report + rank-rewrite rows "
        "(rep10/rep100 tables, warm/min-of-2, idle host)",
        "",
        "| entry | spark 1x | duck 1x | ratio 1x | spark 10x | duck 10x | "
        "ratio 10x | spark 100x | duck 100x | ratio 100x |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for name in QUERIES_100:
        r = results[name]

        def ratio(lbl):
            d = r.get(f"duck_{lbl}")
            return r[f"spark_{lbl}"] / d if d else float("nan")

        lines.append(
            f"| {name} | {r['spark_1x']:.3f} | {r['duck_1x']:.3f} | {ratio('1x'):.2f} "
            f"| {r['spark_10x']:.3f} | {r['duck_10x']:.3f} | {ratio('10x'):.2f} "
            f"| {r['spark_100x']:.3f} | {r['duck_100x']:.3f} | {ratio('100x'):.2f} |"
        )
    lines += [
        "",
        "### distributed-rank quantile entries (post-rewrite regression guard)",
        "",
        "| entry | spark 1x | duck 1x | spark 10x | duck 10x |",
        "|---|---|---|---|---|",
    ]
    for name in QUERIES_10:
        r = results[name]
        lines.append(
            f"| {name} | {r['spark_1x']:.3f} | {r['duck_1x']:.3f} "
            f"| {r['spark_10x']:.3f} | {r['duck_10x']:.3f} |"
        )
    lines += [
        "",
        "### attribution_report salt A/B (Spark wall, same output at every salt)",
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
    with open("SCALE_CHECK.md", "a") as fh:
        fh.write(out)


if __name__ == "__main__":
    main()
