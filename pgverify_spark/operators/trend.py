"""Time-series / product-analytics operators over the events stream.

Beyond-reference extensions: the reporting layer a team runs on top of
the rollups — cohort retention, moving averages, anomaly flags.  All
three are built on the same integer-bucket arithmetic as
``operators.rollup`` (``epoch_us DIV us_per_bucket`` — identical in
both engines) and keep every intermediate either integer/DECIMAL (exact) or
a final IEEE-double division, so results hash-match the DuckDB oracle.

Scale shapes:

- :func:`cohort_retention` — two hash shuffles on ``user_id`` (first-week
  assignment, then the activity join is a shuffle on the *same* key —
  co-partitioned, AQE reuses the exchange) + one aggregation over
  (cohort, offset) pairs, which is |users| x active-weeks rows, tiny
  next to the event stream.
- :func:`moving_average` — one shuffle to the per-(type, bucket) rollup
  (map-side combined), then a window frame over each type's *hourly
  series* — hundreds of rows per type, not events; never a window over
  raw events.
- :func:`daily_anomalies` — rollup shuffle + a per-type aggregate for
  the moments; z-scores use explicitly-computed DECIMAL moments
  (sum, sum-of-squares are exact decimal sums, so the variance is
  order-independent — ``stddev_samp``'s float accumulation would differ
  between engines in the last ulps and break the oracle hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pgverify_spark.functions.timecol import (
    US_PER_DAY as _US_PER_DAY,
    US_PER_HOUR as _US_PER_HOUR,
    US_PER_WEEK as _US_PER_WEEK,
    bucket_sql,
    duck_bucket_sql,
)

#: DuckDB spelling of the same integer buckets (ts arrives as a naive
#: TIMESTAMP there whatever the parquet unit).
_DUCK_WEEK = duck_bucket_sql(_US_PER_WEEK)
_DUCK_HOUR = duck_bucket_sql(_US_PER_HOUR)
_DUCK_DAY = duck_bucket_sql(_US_PER_DAY)


def cohort_retention(df: DataFrame) -> DataFrame:
    """Weekly cohort retention: (cohort_week, week_offset, n_active,
    retention) — of the users whose first event fell in ``cohort_week``,
    how many were active ``week_offset`` weeks later.

    ``retention`` = n_active / cohort size (offset 0 is 1.0 by
    definition since the first event itself is activity).
    """
    weeks = df.selectExpr(
        "user_id", f"{bucket_sql(df, _US_PER_WEEK)} AS wk"
    )
    first = weeks.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    active = (
        weeks.join(first, "user_id")
        .selectExpr("user_id", "cohort_week", "wk - cohort_week AS week_offset")
        .distinct()
    )
    sizes = first.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("cohort_size"))
    return (
        active.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(sizes, "cohort_week")
        .selectExpr(
            "cohort_week",
            "week_offset",
            "n_active",
            "round(CAST(n_active AS DOUBLE) / cohort_size, 6) AS retention",
        )
    )


def cohort_retention_oracle_sql(table: str) -> str:
    return (
        f"WITH w AS (SELECT user_id, {_DUCK_WEEK} AS wk FROM {table}), "
        "f AS (SELECT user_id, min(wk) AS cohort_week FROM w GROUP BY user_id), "
        "a AS (SELECT DISTINCT w.user_id, f.cohort_week, w.wk - f.cohort_week AS week_offset "
        "FROM w JOIN f ON w.user_id = f.user_id), "
        "s AS (SELECT cohort_week, count(*) AS cohort_size FROM f GROUP BY cohort_week) "
        "SELECT a.cohort_week, a.week_offset, count(*) AS n_active, "
        "round(CAST(count(*) AS DOUBLE) / any_value(s.cohort_size), 6) AS retention "
        "FROM a JOIN s ON a.cohort_week = s.cohort_week "
        "GROUP BY a.cohort_week, a.week_offset"
    )


def moving_average(df: DataFrame, window_hours: int = 3) -> DataFrame:
    """Per-type hourly series with a trailing moving average:
    (event_type, hour_bucket, n_events, ma) — frame = current row and
    the ``window_hours - 1`` preceding *rows* of that type's series.

    Row-based (not range-based) frames on a complete hourly series are
    the cheap formulation; gaps in the series would call for a
    range-interval frame instead — same one-line change in both engines.
    """
    from pyspark.sql.window import Window

    hourly = (
        df.selectExpr(f"{bucket_sql(df, _US_PER_HOUR)} AS hour_bucket", "event_type")
        .groupBy("event_type", "hour_bucket")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_bucket")
        .rowsBetween(-(window_hours - 1), 0)
    )
    return hourly.withColumn(
        "ma", F.round(F.avg("n_events").over(w), 6)
    )


def moving_average_oracle_sql(table: str, window_hours: int = 3) -> str:
    return (
        f"WITH h AS (SELECT event_type, {_DUCK_HOUR} AS hour_bucket, count(*) AS n_events "
        f"FROM {table} GROUP BY event_type, {_DUCK_HOUR}) "
        "SELECT event_type, hour_bucket, n_events, "
        "round(avg(n_events) OVER (PARTITION BY event_type ORDER BY hour_bucket "
        f"ROWS BETWEEN {window_hours - 1} PRECEDING AND CURRENT ROW), 6) AS ma FROM h"
    )


def daily_anomalies(df: DataFrame, z_threshold: float = 2.0) -> DataFrame:
    """Days whose value-sum deviates > ``z_threshold`` sample standard
    deviations from that event type's own daily mean:
    (event_type, day_bucket, day_sum, z).

    The moments are computed from exact DECIMAL sums (sum and
    sum-of-squares), so mean/variance are order-independent and the
    z-score is one deterministic double expression — see module
    docstring for why ``stddev_samp`` is avoided.
    """
    daily = (
        df.selectExpr(
            f"{bucket_sql(df, _US_PER_DAY)} AS day_bucket",
            "event_type",
            "CAST(value AS DECIMAL(18,2)) AS dv",
        )
        .groupBy("event_type", "day_bucket")
        .agg(F.sum("dv").cast("decimal(38,2)").alias("day_sum"))
    )
    moments = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("day_sum").cast("decimal(38,2)").alias("s1"),
        F.sum(F.expr("CAST(day_sum * day_sum AS DECIMAL(38,4))"))
        .cast("decimal(38,4)")
        .alias("s2"),
    )
    z = (
        "(CAST(day_sum AS DOUBLE) - CAST(s1 AS DOUBLE) / n_days) / "
        "sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n_days) "
        "/ (n_days - 1))"
    )
    return (
        daily.join(moments, "event_type")
        .filter(F.expr(f"n_days > 1 AND abs({z}) > {z_threshold!r}"))
        .selectExpr("event_type", "day_bucket", "day_sum", f"round({z}, 6) AS z")
    )


def daily_anomalies_oracle_sql(table: str, z_threshold: float = 2.0) -> str:
    z = (
        "(CAST(day_sum AS DOUBLE) - CAST(s1 AS DOUBLE) / n_days) / "
        "sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n_days) "
        "/ (n_days - 1))"
    )
    return (
        f"WITH d AS (SELECT event_type, {_DUCK_DAY} AS day_bucket, "
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS day_sum "
        f"FROM {table} GROUP BY event_type, {_DUCK_DAY}), "
        "m AS (SELECT event_type, count(*) AS n_days, "
        "CAST(sum(day_sum) AS DECIMAL(38,2)) AS s1, "
        "CAST(sum(CAST(day_sum * day_sum AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS s2 "
        "FROM d GROUP BY event_type) "
        "SELECT d.event_type, day_bucket, day_sum, "
        f"round({z}, 6) AS z FROM d JOIN m ON d.event_type = m.event_type "
        f"WHERE n_days > 1 AND abs({z}) > {z_threshold!r}"
    )


def cusum_changepoints(
    df: DataFrame, k_ppm: int = 50_000, h_ppm: int = 4_000_000
) -> DataFrame:
    """Two-sided CUSUM drift monitor over each event type's daily count
    series (Page 1954) — the sequential changepoint statistic behind
    "did this stream's level shift" monitoring, which a z-score per day
    (:func:`daily_anomalies`) cannot answer: CUSUM accumulates SMALL
    persistent shifts that never individually cross a z threshold.

    Output: (event_type, day_bucket, n, cusum_up, cusum_dn, alarm) for
    EVERY day of the global observation window — the series is
    densified first (a day with no events is a ZERO count, not a
    missing sample), so a stream that silently stops drives its
    ``cusum_dn`` up and alarms; the full trajectory is certified, not
    just alarms.

    The textbook recursion ``S_i = max(0, S_{i-1} + d_i)`` is not a
    window function, but it has a closed form AS one:
    ``S_i = P_i - min(0, min_{j<=i} P_j)`` with ``P`` the prefix sum of
    the deviations — so the whole monitor is two ordinary windows
    (running sum + running min) per direction, partitioned by type,
    never a single-reducer (the relation is the tiny daily rollup
    anyway).  Deviations, slack and threshold are all BIGINT:
    ``d_up = n - mean - slack``, ``slack = mean*k_ppm div 1e6``,
    ``alarm when cusum > mean*h_ppm div 1e6`` — bit-identical
    cross-engine, no floats anywhere.
    """
    sparse = (
        df.selectExpr(
            f"{bucket_sql(df, _US_PER_DAY)} AS day_bucket", "event_type"
        )
        .groupBy("event_type", "day_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # densify over the GLOBAL observation window: a day with no events
    # is a count of ZERO, not a missing sample — without this a stream
    # that silently STOPS never alarms (no rows, no statistic), which is
    # the single most important change a monitor exists to catch.  The
    # spine is |types| x |days| rows from a broadcast 1-row bounds agg —
    # never corpus-sized.
    bounds = sparse.groupBy().agg(
        F.expr("min(day_bucket)").alias("d0"), F.expr("max(day_bucket)").alias("d1")
    )
    daily = (
        sparse.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .selectExpr("event_type", "explode(sequence(d0, d1)) AS day_bucket")
        .join(sparse, ["event_type", "day_bucket"], "left")
        .selectExpr(
            "event_type", "day_bucket", "coalesce(n, CAST(0 AS BIGINT)) AS n"
        )
    )
    stats = daily.groupBy("event_type").agg(
        F.expr("CAST(sum(n) AS BIGINT) div count(1)").alias("mean_n")
    )
    dev = daily.join(stats, "event_type").selectExpr(
        "event_type",
        "day_bucket",
        "n",
        f"(mean_n * {h_ppm}) div 1000000 AS h",
        f"n - mean_n - (mean_n * {k_ppm}) div 1000000 AS d_up",
        f"mean_n - n - (mean_n * {k_ppm}) div 1000000 AS d_dn",
    )
    w = (
        "PARTITION BY event_type ORDER BY day_bucket "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    )
    prefix = dev.selectExpr(
        "event_type",
        "day_bucket",
        "n",
        "h",
        f"sum(d_up) OVER ({w}) AS p_up",
        f"sum(d_dn) OVER ({w}) AS p_dn",
    )
    return prefix.selectExpr(
        "event_type",
        "day_bucket",
        "n",
        f"p_up - least(CAST(0 AS BIGINT), min(p_up) OVER ({w})) AS cusum_up",
        f"p_dn - least(CAST(0 AS BIGINT), min(p_dn) OVER ({w})) AS cusum_dn",
        "h",
    ).selectExpr(
        "event_type",
        "day_bucket",
        "n",
        "cusum_up",
        "cusum_dn",
        "CASE WHEN cusum_up > h AND cusum_dn > h THEN 'both' "
        "WHEN cusum_up > h THEN 'up' WHEN cusum_dn > h THEN 'down' "
        "ELSE 'none' END AS alarm",
    )


def cusum_changepoints_oracle_sql(
    table: str, k_ppm: int = 50_000, h_ppm: int = 4_000_000
) -> str:
    w = (
        "PARTITION BY event_type ORDER BY day_bucket "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    )
    return (
        f"WITH sp AS (SELECT event_type, {_DUCK_DAY} AS day_bucket, "
        f"CAST(count(*) AS BIGINT) AS n FROM {table} "
        f"GROUP BY event_type, {_DUCK_DAY}), "
        "bounds AS (SELECT min(day_bucket) AS d0, max(day_bucket) AS d1 FROM sp), "
        "d AS (SELECT t.event_type, s.day_bucket, "
        "coalesce(sp.n, CAST(0 AS BIGINT)) AS n FROM "
        "(SELECT DISTINCT event_type FROM sp) t "
        "CROSS JOIN (SELECT unnest(range(d0, d1 + 1)) AS day_bucket FROM bounds) s "
        "LEFT JOIN sp ON sp.event_type = t.event_type "
        "AND sp.day_bucket = s.day_bucket), "
        "m AS (SELECT event_type, CAST(sum(n) AS BIGINT) // count(*) AS mean_n "
        "FROM d GROUP BY event_type), "
        "dev AS (SELECT d.event_type, day_bucket, n, "
        f"(mean_n * {h_ppm}) // 1000000 AS h, "
        f"n - mean_n - (mean_n * {k_ppm}) // 1000000 AS d_up, "
        f"mean_n - n - (mean_n * {k_ppm}) // 1000000 AS d_dn "
        "FROM d JOIN m ON d.event_type = m.event_type), "
        "pfx AS (SELECT event_type, day_bucket, n, h, "
        f"sum(d_up) OVER ({w}) AS p_up, sum(d_dn) OVER ({w}) AS p_dn FROM dev), "
        "cs AS (SELECT event_type, day_bucket, n, h, "
        f"CAST(p_up - least(0, min(p_up) OVER ({w})) AS BIGINT) AS cusum_up, "
        f"CAST(p_dn - least(0, min(p_dn) OVER ({w})) AS BIGINT) AS cusum_dn "
        "FROM pfx) "
        "SELECT event_type, day_bucket, n, cusum_up, cusum_dn, "
        "CASE WHEN cusum_up > h AND cusum_dn > h THEN 'both' "
        "WHEN cusum_up > h THEN 'up' WHEN cusum_dn > h THEN 'down' "
        "ELSE 'none' END AS alarm FROM cs"
    )


def daily_trend_slope(df: DataFrame) -> DataFrame:
    """Per-type least-squares slope of the daily value-sum series:
    (event_type, n_days, slope) — trending up or down, and how fast.

    ``slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)`` with every S an exact
    integer/DECIMAL sum (x = day bucket, y = exact daily sum), so the
    only float op is the final division — deterministic cross-engine,
    unlike ``regr_slope`` whose accumulation strategy is
    engine-internal.
    """
    daily = (
        df.selectExpr(
            f"{bucket_sql(df, _US_PER_DAY)} AS x",
            "event_type",
            "CAST(value AS DECIMAL(18,2)) AS dv",
        )
        .groupBy("event_type", "x")
        .agg(F.sum("dv").cast("decimal(38,2)").alias("y"))
    )
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,2)").alias("sy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.expr("CAST(x * y AS DECIMAL(38,2))")).cast("decimal(38,2)").alias("sxy"),
    )
    slope = (
        "(n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / "
        "(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    )
    return m.filter("n > 1").selectExpr("event_type", "n AS n_days", f"round({slope}, 6) AS slope")


def daily_trend_slope_oracle_sql(table: str) -> str:
    slope = (
        "(n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / "
        "(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    )
    return (
        f"WITH d AS (SELECT event_type, {_DUCK_DAY} AS x, "
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS y "
        f"FROM {table} GROUP BY event_type, {_DUCK_DAY}), "
        "m AS (SELECT event_type, count(*) AS n, "
        "CAST(sum(x) AS DECIMAL(38,0)) AS sx, CAST(sum(y) AS DECIMAL(38,2)) AS sy, "
        "CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx, "
        "CAST(sum(CAST(x * y AS DECIMAL(38,2))) AS DECIMAL(38,2)) AS sxy "
        "FROM d GROUP BY event_type) "
        f"SELECT event_type, n AS n_days, round({slope}, 6) AS slope FROM m WHERE n > 1"
    )
