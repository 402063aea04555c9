"""Exact-tuple cross-engine sweep: STRICTER than the round driver.

The driver's correctness gate hashes float cells at %.6g, which
absorbs ~1e-6 relative divergence — enough to hide, e.g., Spark typing
a bare decimal literal as DECIMAL and computing an estimator in
decimal arithmetic while DuckDB computes doubles (the late-r10 HLL
alpha bug this sweep caught: 3.7e-9 relative, driver-green, wrong).
This sweep compares every registry entry's sorted result tuples for
EXACT equality (None-safe ordering for CUBE/rollup NULL keys).

    python scripts/exact_sweep.py [sf_dir] [key_filter...]

Round-12 final state: the end-of-round full-registry run — after the
distributed-rank quantile rewrite, the five r11-advice fixes, the
KMV-capped state (IVM + trailing + streaming store with row-dropping
capped compaction), the one-scan HLL overlap, the salted/adaptive
attribution join, the live-JDBC-delta splice, and the six late-round
entries (repeated-span mining + cut transform + ingest-gate probe,
weighted sampling, time-travel read, schema-drift audit) — printed
**256 exact, 0 inexact, 0 err** at sf0.01.  (Earlier full runs this
round: 248/248, 250/250, 254/254, 255/255.)

Round-11 final state: **246/246** (244 in the end-of-round full run
plus the two late trailing-quantile entries swept 1/1 separately).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from pgverify_spark import registry  # noqa: E402
from pgverify_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _key(row: tuple) -> tuple:
    return tuple((v is None, v) for v in row)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]
    spark = get_spark("exact-sweep")
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    q, o = registry.spark_queries(), registry.oracle_queries()
    exact = inexact = err = 0
    for name in q:
        if filters and not any(f in name for f in filters):
            continue
        try:
            a = sorted(map(tuple, q[name](spark, sf).collect()), key=_key)
            b = sorted(map(tuple, con.execute(o[name]).fetchall()), key=_key)
            if a == b:
                exact += 1
            else:
                inexact += 1
                detail = "row-structure/count"
                for ra, rb in zip(a, b):
                    if ra != rb:
                        for x, y in zip(ra, rb):
                            if x != y:
                                detail = f"{x!r} vs {y!r}"
                                break
                        break
                print(f"INEXACT {name}: rows {len(a)}/{len(b)} first-diff {detail}", flush=True)
            spark.catalog.clearCache()
        except Exception as ex:  # noqa: BLE001 — sweep must not stop
            err += 1
            print(f"ERR {name}: {type(ex).__name__} {str(ex)[:150]}", flush=True)
    print(f"{exact} exact, {inexact} inexact, {err} err", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
