"""Streaming SCD2: type-2 dimension intervals maintained at ingest.

Streaming twin of ``operators.rollup.scd2_intervals`` — the same
gaps-and-islands interval chaining, folded incrementally per user with
``applyInPandasWithState``.  Dimension feeds are the canonical
streaming-upsert workload: every attribute-change event either extends
the user's current validity interval or CLOSES it and opens a new one.

A closed interval is FINAL on emission (later events can never reopen
an earlier run), so closed rows stream out exactly once; the user's
current OPEN interval (valid_to_us NULL) is re-emitted as a snapshot
whenever a micro-batch touches the user, with a per-user ``seq``
counter so :func:`finalize_streaming_scd2` keeps only the latest.

State per user: (cur_type, valid_from_us, n, seq) — four scalars
forever, no growth with event count, no watermark needed.  Delivery
contract: each user's events arrive in event-time order across
micro-batches (the log-shipping contract every streaming twin in this
package documents); within a batch events fold in (us, event_id)
order — the identical total order the batch operator's window uses,
so an event-time-ordered replay equals the batch output row-for-row.

Scale: ONE keyed exchange on user_id (same as the batch operator);
per-batch work is a sorted fold over just that batch's events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_OUT_SCHEMA = (
    "user_id bigint, event_type string, valid_from_us bigint, "
    "valid_to_us bigint, n bigint, closed int, seq bigint"
)
_STATE_SCHEMA = "cur_type string, valid_from_us bigint, n bigint, seq bigint"

_OUT_COLS = ("user_id", "event_type", "valid_from_us", "valid_to_us", "n")


def streaming_scd2(sdf: DataFrame) -> DataFrame:
    """Per-user streaming SCD2 rows: closed intervals (final, closed=1)
    plus open-interval snapshots (closed=0, latest ``seq`` wins)."""
    import pandas as pd  # local: executors import lazily
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from pgverify_spark.functions.timecol import epoch_us_sql

    rows = sdf.selectExpr(
        "user_id", "event_id", f"{epoch_us_sql(sdf)} AS us", "event_type"
    )

    def update_fn(key: tuple, pdfs, state: GroupState):
        cur, frm, n, seq = (
            state.get if state.exists else (None, None, 0, 0)
        )
        out: list[tuple] = []
        touched = False
        for pdf in pdfs:
            for us, _eid, et in sorted(
                zip(map(int, pdf["us"]), map(int, pdf["event_id"]), pdf["event_type"])
            ):
                touched = True
                if cur is None:
                    cur, frm, n = et, us, 1
                elif et == cur:
                    n += 1
                else:  # close the run; its end is the next run's start
                    seq += 1
                    out.append((key[0], cur, frm, us, n, 1, seq))
                    cur, frm, n = et, us, 1
        if touched:
            seq += 1
            out.append((key[0], cur, frm, None, n, 0, seq))
        state.update((cur, frm, n, seq))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "user_id", "event_type", "valid_from_us",
                    "valid_to_us", "n", "closed", "seq",
                ],
            ).astype({"valid_to_us": "Int64"})

    return rows.groupBy("user_id").applyInPandasWithState(
        update_fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def finalize_streaming_scd2(emitted: DataFrame) -> DataFrame:
    """Collapse emitted rows to the batch ``scd2_intervals`` shape:
    every closed interval (each emitted exactly once, immutable) plus
    the LATEST open snapshot per user (max ``seq`` — superseded open
    snapshots from earlier micro-batches drop out).  Distributed: one
    filter for the closed history, one per-user top-1 window for the
    open rows."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    closed = emitted.filter("closed = 1").select(*_OUT_COLS)
    w = Window.partitionBy("user_id").orderBy(F.desc("seq"))
    latest_open = (
        emitted.filter("closed = 0")
        .withColumn("rk", F.row_number().over(w))
        .filter("rk = 1")
        .select(*_OUT_COLS)
    )
    return closed.unionByName(latest_open)
