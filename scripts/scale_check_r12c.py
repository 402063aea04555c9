"""Round-12 probe, part 3: 1x/10x points for the entries REGISTERED
this round (capped IVM, live-JDBC-delta splice, capped trailing window,
streaming capped twin excluded like all streaming machinery), so the
families ship with scale evidence from day one.  Methodology as
scale_check.py (builder-side, warm, min-of-2, idle host).

    python scripts/scale_check_r12c.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_check import DST, SRC, TABLES, build_replicated, time_min2  # noqa: E402

QUERIES = (
    "quantile_ivm_capped_events",
    "quantile_ivm_jdbc_events",
    "quantile_trailing_capped_events",
)


def main() -> None:
    import duckdb

    from pgverify_spark import registry
    from pgverify_spark.session import get_spark

    build_replicated()
    spark = get_spark("pgverify-spark-scale-r12c")
    spark.range(1_000_000).select("id").summary().collect()
    queries = registry.spark_queries()
    oracles = registry.oracle_queries()

    results: dict[str, dict[str, float]] = {}
    for label, sf_dir in (("1x", SRC), ("10x", DST)):
        for name in QUERIES:
            try:
                t = time_min2(lambda: queries[name](spark, sf_dir).collect())
            except Exception as ex:  # noqa: BLE001
                print(f"SPARK FAIL {label} {name}: {type(ex).__name__}", flush=True)
                t = float("nan")
            results.setdefault(name, {})[f"spark_{label}"] = round(t, 3)
            print(f"spark {label} {name}: {t:.3f}", flush=True)
            spark.catalog.clearCache()
        con = duckdb.connect()
        con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
        con.execute("SET memory_limit='40GB'")
        for t_ in TABLES:
            con.execute(
                f"CREATE VIEW {t_} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t_}.parquet')"
            )
        for name in QUERIES:
            try:
                t = time_min2(lambda: con.execute(oracles[name]).fetchall())
            except Exception as ex:  # noqa: BLE001
                print(f"DUCK FAIL {label} {name}: {type(ex).__name__}", flush=True)
                t = float("nan")
            results[name][f"duck_{label}"] = round(t, 3)
            print(f"duck {label} {name}: {t:.3f}", flush=True)
        con.close()

    lines = [
        "",
        "### r12c: the round-12 entries at 1x/10x (rep10 tables, warm/min-of-2, idle host)",
        "",
        "| entry | spark 1x | duck 1x | ratio 1x | spark 10x | duck 10x | ratio 10x |",
        "|---|---|---|---|---|---|---|",
    ]
    for name in QUERIES:
        r = results[name]

        def ratio(lbl):
            return (
                r[f"spark_{lbl}"] / r[f"duck_{lbl}"]
                if r[f"duck_{lbl}"]
                else float("nan")
            )

        lines.append(
            f"| {name} | {r['spark_1x']:.3f} | {r['duck_1x']:.3f} | {ratio('1x'):.2f} "
            f"| {r['spark_10x']:.3f} | {r['duck_10x']:.3f} | {ratio('10x'):.2f} |"
        )
    out = "\n".join(lines) + "\n"
    print(out)
    with open("SCALE_CHECK.md", "a") as fh:
        fh.write(out)


if __name__ == "__main__":
    main()
