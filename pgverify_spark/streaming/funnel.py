"""Streaming funnel: continuous per-user step progression.

Streaming twin of ``operators.funnel`` — the same anchored-at-earliest
fold, maintained incrementally per user with ``applyInPandasWithState``.
Each micro-batch folds that batch's (time-sorted) events into the
user's ``(stage, stage_ts)`` state; because the batch fold is a left
fold over time-ordered events, folding a prefix and then the suffix is
*identical* to folding the whole — streaming equals batch whenever the
stream delivers each user's events in event-time order across
micro-batches (the usual log-shipping contract; with out-of-order
sources you'd front this with a watermark + sort buffer).

State per user: two scalars, forever — no watermark needed, no growth
with event count.  Output (update mode) re-emits a user's row only in
micro-batches where their funnel state changed, with an ``updates``
counter so an append sink can keep the latest row per user.

Scale: the keyed exchange on user_id is the only shuffle; state-store
entries are O(|users|) x 3 ints; per-batch work is a sorted fold over
just that batch's events — the operator never re-reads history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pgverify_spark.operators.funnel import DEFAULT_STEPS

_OUT_SCHEMA = "user_id bigint, stage int, stage_ts bigint, updates int"
_STATE_SCHEMA = "stage int, stage_ts bigint, updates int"

_MIN_LONG = -9223372036854775808


def streaming_funnel_state(
    sdf: DataFrame,
    steps: tuple[str, ...] = DEFAULT_STEPS,
    max_gap_us: int | None = None,
) -> DataFrame:
    """Per-user streaming funnel state: (user_id, stage, stage_ts, updates)."""
    import pandas as pd  # local: executors import lazily
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    quoted = ", ".join("'" + s.replace("'", "''") + "'" for s in steps)
    from pgverify_spark.functions.timecol import epoch_us_sql

    rows = sdf.filter(f"event_type IN ({quoted})").selectExpr(
        "user_id",
        f"{epoch_us_sql(sdf)} AS us",
        "event_type AS et",
    )
    n_steps = len(steps)
    step_at = {i: s for i, s in enumerate(steps)}

    def update_fn(key: tuple, pdfs, state: GroupState):
        stage, stage_ts, updates = state.get if state.exists else (0, _MIN_LONG, 0)
        before = (stage, stage_ts)
        for pdf in pdfs:
            for us, et in sorted(zip(map(int, pdf["us"]), pdf["et"])):
                if stage >= n_steps:
                    break
                if (
                    et == step_at[stage]
                    and us > stage_ts
                    and (stage == 0 or max_gap_us is None or us - stage_ts <= max_gap_us)
                ):
                    stage, stage_ts = stage + 1, us
        if (stage, stage_ts) != before or updates == 0:
            updates += 1
            state.update((stage, stage_ts, updates))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "stage": [stage],
                    "stage_ts": [stage_ts],
                    "updates": [updates],
                }
            )
        else:
            state.update((stage, stage_ts, updates))

    return rows.groupBy("user_id").applyInPandasWithState(
        update_fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def finalize_streaming_funnel(
    emitted: DataFrame, steps: tuple[str, ...] = DEFAULT_STEPS
) -> list[tuple[int, str, int, float]]:
    """Collapse emitted rows (latest per user) to the batch ``funnel``
    output shape: [(step, step_name, n_users, conversion)]."""
    latest: dict[int, tuple[int, int]] = {}
    for r in emitted.collect():
        cur = latest.get(r["user_id"])
        if cur is None or r["updates"] > cur[1]:
            latest[r["user_id"]] = (r["stage"], r["updates"])
    out = []
    prev = None
    for i, name in enumerate(steps):
        n = sum(1 for stage, _ in latest.values() if stage >= i + 1)
        if i == 0:
            conv = 1.0 if n > 0 else 0.0
        else:
            conv = round(n / prev, 6) if prev else 0.0
        out.append((i + 1, name, n, conv))
        prev = n
    return out


def streaming_attribution(
    sdf: DataFrame,
    touches: tuple[str, ...] = None,
    conversion: str = "purchase",
    lookback_us: int = None,
) -> DataFrame:
    """Streaming twin of ``operators.funnel.attribute_conversions``:
    last-touch attribution at ingest time.  State per user is ONE
    (touch_us, touch_event_id, touch_type) triple — O(1) forever, no
    watermark needed — and each conversion's credit row is FINAL on
    emission (append mode): last-touch needs no retraction because
    later events can't change an earlier conversion's most recent
    preceding touch.

    Delivery contract: event-time-ordered per user across micro-batches
    (the same contract streaming_debounce and the streaming funnel
    document); within a batch events fold in (us, event_id) order — the
    identical total order the batch operator's window uses, so a
    replayed feed equals the batch output row-for-row, NULL direct
    bucket included.
    """
    import pandas as pd  # local: executors import lazily
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from pgverify_spark.functions.timecol import epoch_us_sql
    from pgverify_spark.operators.funnel import (
        DEFAULT_LOOKBACK_US,
        DEFAULT_TOUCHES,
    )

    touches = DEFAULT_TOUCHES if touches is None else touches
    lookback_us = DEFAULT_LOOKBACK_US if lookback_us is None else lookback_us
    touch_set = set(touches)
    all_types = ", ".join(f"'{t}'" for t in (*touches, conversion))
    rows = sdf.filter(f"event_type IN ({all_types})").selectExpr(
        "user_id", "event_id", f"{epoch_us_sql(sdf)} AS us", "event_type"
    )

    def update_fn(key: tuple, pdfs, state: GroupState):
        t_us, t_id, t_type = state.get if state.exists else (None, None, None)
        out = {"conv_event_id": [], "conv_us": [], "touch_event_id": [],
               "touch_type": [], "latency_us": []}
        for pdf in pdfs:
            for us, eid, et in sorted(
                zip(map(int, pdf["us"]), map(int, pdf["event_id"]), pdf["event_type"])
            ):
                if et in touch_set:
                    t_us, t_id, t_type = us, eid, et
                else:  # conversion
                    hit = t_us is not None and us - t_us <= lookback_us
                    out["conv_event_id"].append(eid)
                    out["conv_us"].append(us)
                    out["touch_event_id"].append(t_id if hit else None)
                    out["touch_type"].append(t_type if hit else None)
                    out["latency_us"].append(us - t_us if hit else None)
        state.update((t_us, t_id, t_type))
        if out["conv_event_id"]:
            n = len(out["conv_event_id"])
            yield pd.DataFrame({
                "conv_event_id": out["conv_event_id"],
                "user_id": [key[0]] * n,
                "conv_us": out["conv_us"],
                "touch_event_id": pd.array(out["touch_event_id"], dtype="Int64"),
                "touch_type": out["touch_type"],
                "latency_us": pd.array(out["latency_us"], dtype="Int64"),
            })

    return rows.groupBy("user_id").applyInPandasWithState(
        update_fn,
        outputStructType="conv_event_id bigint, user_id bigint, conv_us bigint, "
        "touch_event_id bigint, touch_type string, latency_us bigint",
        stateStructType="t_us bigint, t_id bigint, t_type string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
