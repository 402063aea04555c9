"""Key-distribution audit: the profiling pass you run *before* a big join.

Beyond-reference extension (the reference is strictly equi-fingerprint
verification): at 100 TB the difference between a 20-minute and a
6-hour join is usually one hot key, and the cheap defense is measuring
the key distribution first — then choosing broadcast / salting / AQE
skew-join with data, not guesswork.  These two operators are that
measurement.

Scale shape: ``groupBy(key).count()`` is one hash shuffle with map-side
partial aggregation, and everything downstream operates on the *counts*
relation — |distinct keys| rows, not |rows|.  The summary is a single
tiny aggregate over it; heavy hitters is a top-N
(``TakeOrderedAndProject`` — no global sort).  Exact percentiles over
group sizes are fine here because the counts relation is small by
construction; at extreme key cardinality swap ``percentile`` for
``approx_percentile`` (KLL-style mergeable sketch, same call shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Group-size percentiles reported by :func:`key_distribution`.
PCTS = (0.5, 0.9, 0.99)


def key_distribution(df: DataFrame, key: str) -> DataFrame:
    """One-row key-distribution summary for ``key``.

    Output: (n_rows, n_keys, max_group, avg_group, p50_group, p90_group,
    p99_group, skew_ratio) — ``skew_ratio`` = max/avg group size, the
    number AQE's skew-join threshold reasons about (a ratio near 1 means
    a uniform shuffle; >10 means salting territory).
    """
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    aggs = [
        F.sum("n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("max_group"),
        F.expr("round(avg(n), 6)").alias("avg_group"),
    ]
    aggs += [
        F.expr(f"round(percentile(n, {p}), 6)").alias(f"p{int(p * 100)}_group")
        for p in PCTS
    ]
    aggs.append(F.expr("round(max(n) / avg(n), 6)").alias("skew_ratio"))
    return counts.agg(*aggs)


def key_distribution_oracle_sql(table: str, key: str) -> str:
    pct = ", ".join(
        f"round(quantile_cont(n, {p}), 6) AS p{int(p * 100)}_group" for p in PCTS
    )
    return (
        f"WITH c AS (SELECT {key}, count(*) AS n FROM {table} GROUP BY {key}) "
        "SELECT CAST(sum(n) AS BIGINT) AS n_rows, count(*) AS n_keys, "
        f"max(n) AS max_group, round(avg(n), 6) AS avg_group, {pct}, "
        "round(max(n) / avg(n), 6) AS skew_ratio FROM c"
    )


def heavy_hitters(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """Top-N keys by row count: (key, n, share), share rounded to 1e-6.

    Deterministic under ties: ordered by (n DESC, key ASC) in both
    engines, so the selected set is identical cross-engine.
    """
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").cast("double").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .selectExpr(key, "n", "round(n / total, 6) AS share")
        .orderBy(F.col("n").desc(), F.col(key).asc())
        .limit(top_n)
    )


def heavy_hitters_oracle_sql(table: str, key: str, top_n: int = 10) -> str:
    return (
        f"WITH c AS (SELECT {key}, count(*) AS n FROM {table} GROUP BY {key}), "
        "t AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM c) "
        f"SELECT {key}, n, round(n / total, 6) AS share FROM c CROSS JOIN t "
        f"ORDER BY n DESC, {key} ASC LIMIT {top_n}"
    )
