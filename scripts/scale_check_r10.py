"""Round-10 scale probes: the new operators at 1x/10x (plus the IVM
splice re-probe on the NEW distributed state path and a 3-column
z-order layout row).

Same builder-side methodology as scripts/scale_check.py (which this
reuses for the key-shifted rep10 corpus): warm session, min of two,
clearCache between queries, DuckDB twins timed in the same process on
the same parquet.  Run with nothing else executing.

    python scripts/scale_check_r10.py

Prints a markdown fragment to append to SCALE_CHECK.md.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_check import DST, SRC, TABLES, build_replicated, time_min2  # noqa: E402

QUERIES = (
    "pagerank_weighted_term_graph_documents",
    "pagerank_personalized_term_graph_documents",
    "equidepth_histogram_orders",
    "rollup_ivm_events",
)


def _matching_row_groups(path: str, preds: list[tuple[str, float, float]]):
    """(#row groups whose [min,max] overlaps every predicate, total)."""
    import pyarrow.parquet as pq

    keep = total = 0
    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            total += 1
            ok = True
            for col, lo, hi in preds:
                st = md.row_group(rg).column(names[col]).statistics
                if st is None or st.max < lo or st.min > hi:
                    ok = False
                    break
            keep += ok
    return keep, total


def main() -> None:
    import duckdb

    from pgverify_spark import registry
    from pgverify_spark.session import get_spark
    from pgverify_spark.sources.zorder import write_zordered

    build_replicated()
    spark = get_spark("pgverify-spark-scale-r10")
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

    # 3-column z-order layout at 10x: write wall + 3-dim box pruning vs
    # the best single-column sort (r9 VERDICT item 7's SCALE_CHECK row)
    from pgverify_spark.functions.timecol import epoch_us_sql

    raw = spark.read.parquet(f"{DST}/events.parquet")
    ev = raw.selectExpr(
        "event_id", "user_id", "value", f"{epoch_us_sql(raw)} AS us"
    )
    zpath = "/tmp/pgvs_z3_rep10"
    t0 = time.perf_counter()
    write_zordered(ev, ["user_id", "value", "us"], zpath, bits=6, files=32)
    z_write = time.perf_counter() - t0
    bounds = {}
    for c in ("user_id", "value", "us"):
        bounds[c] = ev.selectExpr(
            f"approx_percentile(CAST({c} AS DOUBLE), 0.40)",
            f"approx_percentile(CAST({c} AS DOUBLE), 0.45)",
        ).first()
    box = [(c, bounds[c][0], bounds[c][1]) for c in bounds]
    z_box, zn = _matching_row_groups(zpath, box)
    per_dim = {
        c: _matching_row_groups(zpath, [(c, bounds[c][0], bounds[c][1])])[0]
        for c in bounds
    }

    lines = [
        "",
        "## Round-10 operators at 10x (key-shifted rep10, warm/min-of-2, idle host)",
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
    lines += [
        "",
        f"3-column z-order layout (events rep10, 1M rows, user_id x value x "
        f"epoch_us, bits=6, 32 files): write {z_write:.1f} s; a 5%-wide "
        f"3-dim box keeps {z_box}/{zn} row groups "
        f"(per-dimension: " + ", ".join(f"{c} {per_dim[c]}/{zn}" for c in per_dim) + ").",
        "",
    ]
    print("\n".join(lines))
    spark.stop()


if __name__ == "__main__":
    main()
