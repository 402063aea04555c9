"""Time-bucketed rollups over event streams (hypertable-style).

Beyond-reference extension (the reference is strictly batch-relational,
SURVEY.md §1.4): the batch form of the aggregate that
``streaming/incremental.py`` maintains continuously — bucket events into
fixed time windows and aggregate per (window, dimension).

Scale shape: a single hash shuffle on (bucket, dimension) with map-side
partial aggregation; no sort, no window function.  The distinct-user
count adds Spark's expand+reshuffle for exact semantics — at 100 TB swap
it for ``approx_count_distinct`` (HLL, partial-aggregatable, one shuffle)
when ±2 % error is acceptable.  ``sum(value)`` runs over DECIMAL(18,2),
not DOUBLE: decimal addition is exact and commutative, so the result is
independent of partitioning/merge order — a float sum would differ
between engines (and between runs) in the last ulps.

The time bucket is computed in integer arithmetic on epoch counts —
``ts DIV ns_per_bucket`` — which both engines evaluate identically
(events.ts is TIMESTAMP(NANOS) parquet: Spark reads it as bigint nanos
via ``nanosAsLong``, DuckDB as TIMESTAMP, whence ``epoch_us``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Nanoseconds / microseconds per hour.
_NS_PER_HOUR = 3_600_000_000_000
_US_PER_HOUR = 3_600_000_000


def hourly_rollup(df: DataFrame, distinct_users: str | None = "exact") -> DataFrame:
    """Per (hour, event_type): event count, distinct users, exact value
    sum, min/max value.

    ``distinct_users`` selects the user-count semantics:

    - ``"exact"`` (default): ``countDistinct`` — forces Spark's
      expand+reshuffle rewrite (two shuffles), the right call when the
      rollup feeds a correctness gate.
    - ``"approx"``: ``approx_count_distinct`` (HLL++, ±~2 %) — a plain
      partial-aggregatable function, single shuffle; the 100 TB default.
    - ``None``: omit ``n_users`` entirely (used by :func:`daily_rollup`,
      which cannot merge per-hour distincts anyway) — single shuffle,
      no Expand node in the plan.
    """
    base = df.selectExpr(
        f"CAST(ts DIV {_NS_PER_HOUR} AS BIGINT) AS hour_bucket",
        "event_type",
        "user_id",
        "CAST(value AS DECIMAL(18,2)) AS dvalue",
        "value",
    )
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if distinct_users == "exact":
        aggs.append(F.countDistinct("user_id").alias("n_users"))
    elif distinct_users == "approx":
        aggs.append(F.approx_count_distinct("user_id").alias("n_users"))
    elif distinct_users is not None:
        raise ValueError(f"distinct_users must be 'exact', 'approx' or None, got {distinct_users!r}")
    aggs += [
        F.sum("dvalue").cast("decimal(38,2)").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    ]
    return base.groupBy("hour_bucket", "event_type").agg(*aggs)


def daily_rollup(df: DataFrame) -> DataFrame:
    """Per (day, event_type), computed by *re-aggregating the hourly
    rollup* — the hypertable continuous-aggregate pattern: at scale the
    hourly partials already exist (materialized or streamed), so the
    daily level touches ~n_hours rows instead of rescanning raw events.
    count/sum/min/max re-aggregate losslessly; distinct users do NOT
    (|users(day)| != sum over hours), so the daily level omits n_users —
    and therefore asks the hourly level to skip the countDistinct
    entirely (``distinct_users=None``), keeping the whole plan at two
    plain hash aggregations with no Expand/reshuffle.  Compute daily
    uniques from raw events (or an HLL sketch union) when needed."""
    hourly = hourly_rollup(df, distinct_users=None)
    return hourly.groupBy(
        F.expr("hour_bucket div 24").alias("day_bucket"),
        "event_type",
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value").cast("decimal(38,2)").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


def daily_rollup_oracle_sql(table: str) -> str:
    return (
        "SELECT CAST(hour_bucket // 24 AS BIGINT) AS day_bucket, event_type, "
        "CAST(sum(n_events) AS BIGINT) AS n_events, "
        "CAST(sum(sum_value) AS DECIMAL(38,2)) AS sum_value, "
        "min(min_value) AS min_value, max(max_value) AS max_value "
        f"FROM ({hourly_rollup_oracle_sql(table)}) h GROUP BY 1, 2"
    )


def hourly_rollup_oracle_sql(table: str) -> str:
    return (
        f"SELECT CAST(epoch_us(ts) // {_US_PER_HOUR} AS BIGINT) AS hour_bucket, "
        "event_type, "
        "count(*) AS n_events, "
        "count(DISTINCT user_id) AS n_users, "
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_value, "
        "min(value) AS min_value, "
        "max(value) AS max_value "
        f"FROM {table} GROUP BY 1, 2"
    )
