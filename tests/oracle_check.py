"""Driver-mimicking correctness sweep: run every registry query against
its DuckDB oracle twin at a given SF dir and report row-count / hash
matches.  Not collected by pytest (no test_ prefix); run manually:

    python tests/oracle_check.py [sf_dir] [key_filter...]
"""
from __future__ import annotations

import hashlib
import sys

import duckdb

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
FILTERS = sys.argv[2:]

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def norm_cell(v):
    # Type-faithful rendering: the driver's hash distinguishes int 1
    # from float 1.0 (the CORRECTNESS_r04 sessionize HUGEINT fail that
    # the old %.6g-only rendering was blind to) and CRASHES on list
    # cells (pandas sort over unhashable cells — hashed_vectors r04
    # `err`).  Mimic both so sweep-green predicts driver-green.
    if v is None:
        return ""
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        return f"f:{v:.6g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple, dict, set)):
        raise TypeError(
            f"unhashable driver cell type {type(v).__name__}: the driver's "
            "pandas canon crashes on array/struct outputs — flatten them"
        )
    import decimal

    if isinstance(v, decimal.Decimal):
        return f"d:{v}"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main():
    import __spark_entry__ as entry
    from pgverify_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    n_pass = n_fail = n_weak = 0
    for key, fn in qs.items():
        if FILTERS and not any(f in key for f in FILTERS):
            continue
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            # keep sweep storage flat: drop this query's persisted
            # intermediates (LSH pair streams etc.) once materialized
            from pgverify_spark.operators.util import release_cached_deps

            release_cached_deps(sdf)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {key}: spark error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        sql = oracles.get(key)
        if sql is None:
            print(f"weak {key}: rows={len(srows)} (no oracle)")
            n_weak += 1
            continue
        try:
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {key}: oracle error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {key}: cols {sorted(scols)} vs {sorted(ocols)}")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {key}: rowcount {len(srows)} vs {len(orows)}")
            n_fail += 1
            continue
        try:
            sh = table_hash(scols, srows)
            oh = table_hash(ocols, orows)
        except TypeError as e:
            print(f"FAIL {key}: driver-crash cell type — {e}")
            n_fail += 1
            continue
        if sh != oh:
            print(f"FAIL {key}: hash mismatch ({len(srows)} rows)")
            n_fail += 1
        else:
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} weak (rows-only)")


if __name__ == "__main__":
    main()
