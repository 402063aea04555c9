"""Interval (range) join: events against time windows.

Beyond-reference extension (the reference has equi-semantics only): join
a fact stream to ``(win_id, lo_us, hi_us)`` windows on
``lo_us <= t < hi_us`` and aggregate per window — the incident/
maintenance-window rollup every observability pipeline runs.

Spark has no native range-join optimization: a naive formulation is a
``crossJoin`` + filter, O(|events| x |windows|).  The scale formulation
here is the standard *bucketed interval index*: each window explodes
into the fixed-width time buckets it covers (windows are short, so a
handful of rows each), the fact side computes its bucket in the
projection, and the join becomes an **equi-join on bucket** with the
range predicate as a post-join filter.  The window index is tiny and
broadcast, so the event corpus is scanned once, never shuffled; only
the per-window partial aggregates move.  Cost: O(events + windows x
buckets_per_window + matches) at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pgverify_spark.functions.timecol import epoch_us_sql

#: Bucket width for the interval index: one hour, in microseconds.
_BUCKET_US = 3_600_000_000


def interval_join_rollup(events: DataFrame, windows: DataFrame) -> DataFrame:
    """Per-window event rollup via a bucketed-interval equi-join.

    ``events`` needs (ts timestamp or nanos bigint, value); ``windows`` needs
    (win_id, lo_us, hi_us), half-open micros.  Output: one row per
    window — (win_id, lo_us, hi_us, n_events, sum_value) — including
    empty windows (left join back to the window list).
    """
    idx = windows.selectExpr(
        "win_id",
        "lo_us",
        "hi_us",
        f"explode(sequence(lo_us DIV {_BUCKET_US}, (hi_us - 1) DIV {_BUCKET_US})) AS hb",
    )
    ev = events.selectExpr(
        f"{epoch_us_sql(events)} AS us",
        "CAST(value AS DECIMAL(18,2)) AS dvalue",
    ).selectExpr("us", "dvalue", f"us DIV {_BUCKET_US} AS hb")
    hits = (
        ev.join(F.broadcast(idx), "hb")
        .filter("us >= lo_us AND us < hi_us")
        .groupBy("win_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("dvalue").cast("decimal(38,2)").alias("sum_value"),
        )
    )
    return (
        windows.join(hits, "win_id", "left")
        .selectExpr(
            "win_id",
            "lo_us",
            "hi_us",
            "CAST(coalesce(n_events, 0) AS BIGINT) AS n_events",
            "CAST(coalesce(sum_value, 0) AS DECIMAL(38,2)) AS sum_value",
        )
    )


def interval_join_rollup_oracle_sql(events_table: str, windows_sql: str) -> str:
    """DuckDB twin: the declarative theta join (the optimizer there runs
    an IEJoin; the bucketed index above is the Spark-scale equivalent)."""
    return (
        f"WITH w AS ({windows_sql}), "
        "hits AS (SELECT w.win_id, count(*) AS n_events, "
        "CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_value "
        f"FROM w JOIN {events_table} e "
        "ON CAST(epoch_us(e.ts) AS BIGINT) >= w.lo_us AND CAST(epoch_us(e.ts) AS BIGINT) < w.hi_us "
        "GROUP BY w.win_id) "
        "SELECT w.win_id, w.lo_us, w.hi_us, "
        "CAST(coalesce(hits.n_events, 0) AS BIGINT) AS n_events, "
        "CAST(coalesce(hits.sum_value, 0) AS DECIMAL(38,2)) AS sum_value "
        "FROM w LEFT JOIN hits ON w.win_id = hits.win_id"
    )
