"""Final late-round-10 probes: position attribution, trailing WAU, and
the cardinality verify mode at 1x/10x.  Methodology as scale_check.py.

    python scripts/scale_check_r10d.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_check import DST, SRC, TABLES, build_replicated, time_min2  # noqa: E402

QUERIES = (
    "attribution_position_events",
    "hll_trailing_wau_events",
    "cardinality_fingerprint_lineitem",
)


def main() -> None:
    import duckdb

    from pgverify_spark import registry
    from pgverify_spark.session import get_spark

    build_replicated()
    spark = get_spark("pgverify-spark-scale-r10d")
    spark.range(1_000_000).select("id").summary().collect()
    queries = registry.spark_queries()
    oracles = registry.oracle_queries()

    results: dict[str, dict[str, float]] = {}
    for sf_label, sf_dir in (("1x", SRC), ("10x", DST)):
        for name in QUERIES:
            t = time_min2(lambda: queries[name](spark, sf_dir).collect())
            results.setdefault(name, {})[f"spark_{sf_label}"] = round(t, 3)
            spark.catalog.clearCache()
        con = duckdb.connect()
        con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
        for t_ in TABLES:
            con.execute(
                f"CREATE VIEW {t_} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t_}.parquet')"
            )
        for name in QUERIES:
            t = time_min2(lambda: con.execute(oracles[name]).fetchall())
            results[name][f"duck_{sf_label}"] = round(t, 3)

    lines = [
        "",
        "## Position attribution, WAU, cardinality mode at 10x (rep10, warm/min-of-2, idle host)",
        "",
        "| entry | spark 1x | duck 1x | ratio 1x | spark 10x | duck 10x | ratio 10x |",
        "|---|---|---|---|---|---|---|",
    ]
    for name in QUERIES:
        r = results[name]
        r1 = r["spark_1x"] / r["duck_1x"] if r["duck_1x"] else float("nan")
        r10 = r["spark_10x"] / r["duck_10x"] if r["duck_10x"] else float("nan")
        lines.append(
            f"| `{name}` | {r['spark_1x']:.2f} s | {r['duck_1x']:.2f} s | "
            f"{r1:.1f}x | {r['spark_10x']:.2f} s | {r['duck_10x']:.2f} s | "
            f"**{r10:.1f}x** |"
        )
    lines.append("")
    print("\n".join(lines))
    spark.stop()


if __name__ == "__main__":
    main()
