"""Round-12 probe, part 4: (a) 100x points for the round's capped
quantile entries (the r12c table stopped at 10x), and (b) 1x/10x for
the entries registered late in the round (repeated-span mining,
weighted sampling, time-travel read, schema-drift audit).

quantile_ivm_jdbc_events stays at its 10x row deliberately: its wall
is the embedded-Derby round trip (single-JVM row-at-a-time JDBC), so a
100x point would measure Derby's insert loop, not the splice — the
scale path for a real database source is the partitioned JDBC read
already exercised live in tests/test_jdbc_live.py.

Methodology as scale_check.py (warm, min-of-2, idle host).

    python scripts/scale_check_r12d.py
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
    "quantile_ivm_capped_events",
    "quantile_trailing_capped_events",
)
QUERIES_NEW = (
    "repeated_spans_documents",
    "weighted_sample_documents",
    "timetravel_read_orders",
    "schema_drift_orders",
)


def main() -> None:
    import duckdb

    from pgverify_spark import registry
    from pgverify_spark.session import get_spark

    build_replicated()
    build_replicated_100()
    spark = get_spark("pgverify-spark-scale-r12d")
    spark.range(1_000_000).select("id").summary().collect()
    queries = registry.spark_queries()
    oracles = registry.oracle_queries()

    results: dict[str, dict[str, float]] = {}
    points = (
        ("1x", SRC, QUERIES_NEW),
        ("10x", DST, QUERIES_NEW),
        ("100x", DST100, QUERIES_100),
    )
    for label, sf_dir, qnames in points:
        for name in qnames:
            try:
                t = time_min2(lambda: queries[name](spark, sf_dir).collect())
            except Exception as ex:  # noqa: BLE001
                print(f"SPARK FAIL {label} {name}: {type(ex).__name__}: {ex}",
                      flush=True)
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
        for name in qnames:
            try:
                t = time_min2(lambda: con.execute(oracles[name]).fetchall())
            except Exception as ex:  # noqa: BLE001
                print(f"DUCK FAIL {label} {name}: {type(ex).__name__}: {ex}",
                      flush=True)
                t = float("nan")
            results[name][f"duck_{label}"] = round(t, 3)
            print(f"duck {label} {name}: {t:.3f}", flush=True)
        con.close()

    def ratio(r, lbl):
        d = r.get(f"duck_{lbl}")
        return r[f"spark_{lbl}"] / d if d else float("nan")

    lines = [
        "",
        "### r12d: 100x for the capped quantile entries; 1x/10x for the late-round entries (warm/min-of-2, idle host)",
        "",
        "| entry | spark 1x | duck 1x | ratio 1x | spark 10x | duck 10x | ratio 10x |",
        "|---|---|---|---|---|---|---|",
    ]
    for name in QUERIES_NEW:
        r = results[name]
        lines.append(
            f"| {name} | {r['spark_1x']:.3f} | {r['duck_1x']:.3f} | {ratio(r, '1x'):.2f} "
            f"| {r['spark_10x']:.3f} | {r['duck_10x']:.3f} | {ratio(r, '10x'):.2f} |"
        )
    lines += [
        "",
        "| entry | spark 100x | duck 100x | ratio 100x |",
        "|---|---|---|---|",
    ]
    for name in QUERIES_100:
        r = results[name]
        lines.append(
            f"| {name} | {r['spark_100x']:.3f} | {r['duck_100x']:.3f} "
            f"| {ratio(r, '100x'):.2f} |"
        )
    out = "\n".join(lines) + "\n"
    print(out)
    with open("SCALE_CHECK.md", "a") as fh:
        fh.write(out)


if __name__ == "__main__":
    main()
