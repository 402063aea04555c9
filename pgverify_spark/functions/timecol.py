"""Type-adaptive epoch-time expressions for event-time columns.

The engine's time-bucketed operators (rollups, trends, funnels,
sessionization, per-day fingerprints) key everything on an *integer
epoch-microsecond* value so that bucket arithmetic is exact and
engine-independent.  The physical column feeding that value varies by
source:

- parquet ``TIMESTAMP(MICROS)`` → Spark ``timestamp`` / ``timestamp_ntz``
  (Spark 4 reads non-UTC-adjusted micros as NTZ);
- parquet ``TIMESTAMP(NANOS)`` → ``bigint`` epoch-nanos under the
  ``spark.sql.legacy.parquet.nanosAsLong`` read (one of
  ``session.REQUIRED_CONFS``).

A ``bigint`` event-time column is therefore *always* interpreted as
epoch **nanoseconds** — the ``nanosAsLong`` read is the only way a raw
event-time lands as a long in this engine.  An upstream operator that
has already converted to epoch-micros must keep (or cast to) a
timestamp type before re-entering these helpers; feeding a bigint
micros column here would silently divide by 1000.

These helpers inspect the DataFrame's actual dtype and emit the right
Spark SQL expression, so operators work unchanged across both shapes.
The NTZ→TIMESTAMP cast is wall-clock-preserving and the session zone is
pinned to UTC by ``session.REQUIRED_CONFS``, so ``unix_micros`` yields
the same integer DuckDB's ``epoch_us`` computes on the naive TIMESTAMP
it reads from the same file — the cross-engine contract every oracle
pairing relies on.

Scale note: both shapes are pure JVM integer/cast expressions inside
whole-stage codegen — no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

US_PER_HOUR = 3_600_000_000
US_PER_DAY = 86_400_000_000
US_PER_WEEK = 7 * US_PER_DAY

#: DuckDB spelling of the same integer value (ts arrives there as a
#: naive TIMESTAMP whatever the parquet unit; ``epoch_us`` floors
#: sub-microsecond input, matching the nanos DIV 1000 on the Spark side
#: for post-1970 data — pre-1970 sub-us edge covered in canonical.py).
DUCK_EPOCH_US = "CAST(epoch_us(ts) AS BIGINT)"


def epoch_us_sql(df: DataFrame, col: str = "ts") -> str:
    """Spark SQL expression: ``col`` as BIGINT epoch microseconds.

    ``bigint`` columns are assumed to be epoch *nanoseconds* (the
    ``nanosAsLong`` parquet read — the only way a raw event-time lands
    as a long in this engine); timestamps cast through ``unix_micros``.
    """
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        return f"CAST({col} DIV 1000 AS BIGINT)"
    return f"unix_micros(CAST({col} AS TIMESTAMP))"


def bucket_sql(df: DataFrame, us_per_bucket: int, col: str = "ts") -> str:
    """Spark SQL expression: integer time-bucket id (division of
    epoch-us by the bucket width).  Matches the DuckDB twin
    ``CAST(epoch_us(ts) // us_per_bucket AS BIGINT)`` exactly: both
    Spark ``DIV`` and DuckDB integer ``//`` truncate toward zero
    (verified ``-7 // 2 = -3`` in DuckDB), so even pre-1970 epochs
    bucket identically.
    """
    return f"CAST(({epoch_us_sql(df, col)}) DIV {us_per_bucket} AS BIGINT)"


def duck_bucket_sql(us_per_bucket: int, col: str = "ts") -> str:
    """DuckDB spelling of :func:`bucket_sql` (``//`` truncates like DIV)."""
    return f"CAST(epoch_us({col}) // {us_per_bucket} AS BIGINT)"
