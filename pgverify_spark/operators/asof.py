"""As-of (point-in-time) join — the time-series lookup Spark lacks.

Beyond-reference extension: for each probe row ``(key, t)``, find the
latest event of the same key with ``event_ts <= t`` (LEFT semantics:
probes with no such event keep NULL event fields).  The standard
primitive for feature backfills ("state of the user as of this label's
timestamp") and slowly-changing-dimension lookups.

Spark has no ASOF JOIN operator; the naive spelling
(``join on key AND ts <= t`` + groupBy-max) explodes to candidate pairs
quadratic in per-key history.  This implementation is the union-window
formulation instead:

1. union events and probes, tagged, into one stream,
2. one hash shuffle on ``key``, sort by ``(ts, tag)`` within partitions
   (events sort before probes at equal ts, so "at or before" holds),
3. a running ``last(event_struct, ignorenulls)`` window fills each probe
   row with the most recent event seen,
4. keep probe rows.

Cost: ONE shuffle of events+probes and a linear per-partition scan —
no candidate blowup, no range join.  Event columns travel packed in a
single struct (never NULL for event rows), so a legitimately-NULL event
*value* cannot make the window skip to an older event.

Skew: a window partitioned by ``key`` places each key's full history in
one task; at 100 TB with hot keys, pre-filter events to the probe time
range or bucket by (key, coarse time) and de-overlap — documented here
because the operator itself cannot know the time span.

Determinism requires unique ``(key, ts)`` per event (testdata events
are; pre-dedupe otherwise, keeping e.g. the max event_id per instant).

Oracle: DuckDB's native ``ASOF LEFT JOIN`` — an independent
implementation of the same semantics, which makes the correctness gate
a genuine cross-check rather than a restatement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    events: DataFrame,
    probes: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    probe_ts: str = "t",
    value_cols: tuple[str, ...] = ("event_type", "value"),
) -> DataFrame:
    """For each probe (key, t [, carry cols]): the latest event with
    ``ts <= t``.  Output: probe columns + ``event_ts`` + value_cols."""
    carry = [c for c in probes.columns if c not in (key, probe_ts)]
    ev_struct = F.struct(
        F.col(ts_col).alias("event_ts"), *[F.col(c) for c in value_cols]
    )
    ev = events.select(
        F.col(key),
        F.col(ts_col).alias("_ord"),
        F.lit(0).alias("_tag"),
        ev_struct.alias("_ev"),
        *[F.lit(None).cast(probes.schema[c].dataType).alias(c) for c in carry],
    )
    struct_type = ev.schema["_ev"].dataType
    pr = probes.select(
        F.col(key),
        F.col(probe_ts).alias("_ord"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(struct_type).alias("_ev"),
        *[F.col(c) for c in carry],
    )
    w = (
        Window.partitionBy(key)
        .orderBy("_ord", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = ev.unionByName(pr).withColumn("_last", F.last("_ev", ignorenulls=True).over(w))
    return filled.filter(F.col("_tag") == 1).select(
        F.col(key),
        F.col("_ord").alias(probe_ts),
        *[F.col(c) for c in carry],
        F.col("_last.event_ts").alias("event_ts"),
        *[F.col(f"_last.{c}").alias(c) for c in value_cols],
    )


def asof_join_oracle_sql(
    events_table: str,
    probes_sql: str,
    key: str = "user_id",
    ts_col: str = "ts",
    probe_ts: str = "t",
    value_cols: tuple[str, ...] = ("event_type", "value"),
    carry: tuple[str, ...] = (),
) -> str:
    """DuckDB native ASOF LEFT JOIN computing the identical result."""
    sel = ", ".join(
        [f"p.{key}", f"p.{probe_ts}"]
        + [f"p.{c}" for c in carry]
        + [f"e.{ts_col} AS event_ts"]
        + [f"e.{c}" for c in value_cols]
    )
    return (
        f"SELECT {sel} FROM ({probes_sql}) p "
        f"ASOF LEFT JOIN {events_table} e "
        f"ON p.{key} = e.{key} AND e.{ts_col} <= p.{probe_ts}"
    )
