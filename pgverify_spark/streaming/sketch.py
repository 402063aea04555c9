"""Streaming KMV distinct sketch: continuous cardinality per group.

Streaming twin of ``operators.sketch`` — and the payoff of choosing a
*mergeable* sketch: KMV state (the k smallest distinct hashes) absorbs
a micro-batch by set-union + re-truncate, an operation that is
associative, commutative and idempotent-per-hash.  Arrival order is
irrelevant, so unlike the streaming funnel no event-time-ordered feed
is needed — any chunking of the input converges to exactly the batch
sketch, which the test asserts.

State per group: at most ``k`` bigints, forever.  Output (update mode)
re-emits a group only when its sketch actually changed (a hash entered
the k-min set), with the same (grp, n_sketch, kth_min, est_distinct)
shape as the batch operator — so the registry pairs it with the *same*
DuckDB oracle SQL as the batch sketch.

Scale: one keyed exchange on the group; per-batch work is a sort of
that batch's distinct hashes against a k-bounded list.  This is the
incremental-cardinality design HLL sketches serve in monitoring
systems, with the cross-engine-exact property HLL cannot give
(see operators/sketch.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pgverify_spark.functions.canonical import DIALECT_SPARK, hex_prefix_int_sql

_DOMAIN = float(1 << 60)

_OUT_SCHEMA = "grp string, n_sketch bigint, kth_min bigint, est_distinct double, updates int"
_STATE_SCHEMA = "hashes array<bigint>, updates int"


def streaming_kmv_state(
    sdf: DataFrame, value_col: str, group_col: str, k: int = 64
) -> DataFrame:
    """Per-group streaming KMV state: (grp, n_sketch, kth_min,
    est_distinct, updates), emitted on change."""
    import pandas as pd  # local: executors import lazily
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    h = hex_prefix_int_sql(f"md5(CAST({value_col} AS STRING))", DIALECT_SPARK, 15)
    rows = sdf.selectExpr(f"CAST({group_col} AS STRING) AS grp", f"{h} AS h")

    def update_fn(key: tuple, pdfs, state: GroupState):
        hashes, updates = state.get if state.exists else ([], 0)
        kept = set(hashes)
        before = frozenset(kept)
        for pdf in pdfs:
            kept.update(map(int, pdf["h"]))
        merged = sorted(kept)[:k]
        if frozenset(merged) != before or updates == 0:
            updates += 1
            state.update((merged, updates))
            n, mx = len(merged), merged[-1]
            # same arithmetic as operators.sketch._est_sql: one final
            # IEEE-double division (inputs exact), round to 1e-6
            est = float(n) if n < k else round((k - 1) * _DOMAIN / mx, 6)
            yield pd.DataFrame(
                {
                    "grp": [key[0]],
                    "n_sketch": [n],
                    "kth_min": [mx],
                    "est_distinct": [est],
                    "updates": [updates],
                }
            )
        else:
            state.update((sorted(before), updates))

    return rows.groupBy("grp").applyInPandasWithState(
        update_fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_countmin(
    sdf: DataFrame, value_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Streaming Count-Min frequency sketch — the purely-additive twin
    of ``operators.sketch.countmin_sketch``: because cells are sums,
    the sketch IS a native Structured Streaming aggregate (explode d
    hash rows -> groupBy(j, col) count in update mode).  No custom
    state code; Spark's streaming state store holds exactly the ≤ d×w
    counters, forever, regardless of stream volume or key skew — the
    bounded-state property that makes CM the standard streaming
    frequency monitor.

    Emitted rows are (j, col, cnt) with cnt monotonically increasing;
    the final sketch is the max cnt per cell
    (:func:`finalize_streaming_countmin`), which equals the batch
    sketch over the same data — the registry pairs it with the SAME
    DuckDB oracle as the batch cell table.
    """
    from pgverify_spark.operators.sketch import _cm_hash

    h = _cm_hash(value_col, "j", DIALECT_SPARK)
    return (
        sdf.selectExpr(f"explode(sequence(0, {depth - 1})) AS j", value_col)
        .selectExpr("CAST(j AS BIGINT) AS j", f"CAST({h} % {width} AS BIGINT) AS col")
        .groupBy("j", "col")
        .count()
        .withColumnRenamed("count", "cnt")
    )


def finalize_streaming_countmin(emitted: DataFrame) -> DataFrame:
    """Final cell table from update-mode emissions: cnt only grows, so
    the last state per (j, col) is the max."""
    from pyspark.sql import functions as F

    return emitted.groupBy("j", "col").agg(F.max("cnt").alias("cnt"))


def finalize_streaming_kmv(emitted: DataFrame) -> list[tuple]:
    """Latest state per group: [(grp, n_sketch, kth_min, est_distinct)]."""
    latest: dict[str, tuple] = {}
    for r in emitted.collect():
        cur = latest.get(r["grp"])
        if cur is None or r["updates"] > cur[3]:
            latest[r["grp"]] = (r["n_sketch"], r["kth_min"], r["est_distinct"], r["updates"])
    return [(g, n, mx, est) for g, (n, mx, est, _) in sorted(latest.items())]


def streaming_sample_quantiles(
    sdf: DataFrame, value_col: str, key_col: str, sample_path: str,
    rate_ppm: int = 50_000,
):
    """Streaming quantile maintenance: each micro-batch applies the
    stateless hash-threshold sample predicate and appends its (v, hk)
    survivors to the persisted sample store at ``sample_path`` — the
    "state" IS the growing rate-bounded sample, held in storage rather
    than in a stateful operator (``foreachBatch``, like the LSH ingest
    gate: no per-key streaming state is needed for a pure row
    predicate).

    Exactness: sample-of-union == union-of-samples (membership depends
    only on the row), so quantiles finalized from the store equal the
    batch :func:`~pgverify_spark.operators.sketch.sampled_quantiles`
    over all arrived rows — the registry pairs the streaming run with
    the BATCH operator's oracle SQL.

    Replay-idempotent: ``foreachBatch`` is at-least-once, so each
    batch writes to its own ``batch_id=<id>`` partition with dynamic
    partition overwrite — a batch replayed after failure/restart
    *replaces* its partition instead of double-appending (which would
    shift row_number ranks in the finalize and break the batch-equality
    contract above).  Same epoch, same input, same sample rows: the
    rewrite is a no-op on content.

    Returns a configured ``writeStream`` (caller sets checkpoint and
    calls ``start()``).
    """
    def append(batch_df: DataFrame, batch_id: int) -> None:
        _write_sample_batch(
            batch_df, batch_id, value_col, key_col, sample_path, rate_ppm
        )

    return sdf.writeStream.foreachBatch(append).outputMode("append")


def _write_sample_batch(
    batch_df: DataFrame, batch_id: int, value_col: str, key_col: str,
    sample_path: str, rate_ppm: int,
) -> None:
    """One micro-batch's sample write — idempotent on replay: dynamic
    partition overwrite of this batch's own ``batch_id`` partition
    (module-level so tests can drive a replay directly)."""
    from pyspark.sql import functions as F

    from pgverify_spark.operators.sketch import sample_select

    (
        sample_select(batch_df, value_col, key_col, rate_ppm)
        .withColumn("batch_id", F.lit(batch_id))
        .write.option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .partitionBy("batch_id")
        .parquet(sample_path)
    )


def finalize_streaming_quantiles(
    spark, sample_path: str,
    probs_ppm: tuple[int, ...] = (250_000, 500_000, 750_000, 900_000, 990_000),
) -> DataFrame:
    """Quantile report from the persisted sample store — the same rank
    selection as the batch operator (shared code path).  The store's
    ``batch_id`` partition column exists only for replay idempotency
    and is dropped before ranking."""
    from pgverify_spark.operators.sketch import quantiles_from_sample

    return quantiles_from_sample(
        spark.read.parquet(sample_path).select("v", "hk"), probs_ppm
    )


def streaming_day_sample(
    sdf: DataFrame, sample_path: str,
    value_col: str = "value", key_col: str = "event_id",
    rate_ppm: int = 50_000, cap_per_day: int | None = None,
):
    """Streaming DAY-KEYED quantile-sample maintenance: like
    :func:`streaming_sample_quantiles` but each survivor row carries
    its event-time day, so the store supports the trailing-window
    finalize (rolling p50/p99 at ingest) and arbitrary day-range
    quantiles — the streaming feeder of the batch
    ``rollup.sample_trailing_quantiles`` / ``sample_range_quantiles``
    family.  Same replay-idempotent ``batch_id`` partition discipline;
    same exactness argument (sample-of-union == union-of-samples is
    day-respecting because membership never looks at the day).

    ``cap_per_day`` trims each micro-batch's per-day sample to the cap
    BEFORE writing (per-(batch, day) KMV bottom-k — every batch writes
    at most days-in-batch x cap rows), and the capped finalize re-trims
    each day across batches: trim(union of per-batch trims) ==
    trim(union), so the result equals the batch operator with the same
    cap exactly.  Per-day state is bounded per batch at write and
    restored to a hard days x cap bound by capped compaction
    (:func:`compact_sample_store` with the same cap).

    Returns a configured ``writeStream`` (caller sets checkpoint and
    calls ``start()``)."""
    def append(batch_df: DataFrame, batch_id: int) -> None:
        _write_day_sample_batch(
            batch_df, batch_id, value_col, key_col, sample_path, rate_ppm,
            cap_per_day,
        )

    return sdf.writeStream.foreachBatch(append).outputMode("append")


def _write_day_sample_batch(
    batch_df: DataFrame, batch_id: int, value_col: str, key_col: str,
    sample_path: str, rate_ppm: int, cap_per_day: int | None = None,
) -> None:
    from pyspark.sql import functions as F

    from pgverify_spark.operators.rollup import _day_sample

    (
        _day_sample(batch_df, value_col, key_col, rate_ppm, cap_per_day)
        .withColumn("batch_id", F.lit(batch_id))
        .write.option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .partitionBy("batch_id")
        .parquet(sample_path)
    )


def compact_sample_store(
    spark, sample_path: str, upto_exclusive: int,
    target_bytes: int = 128 * 1024 * 1024,
    cap_per_day: int | None = None,
) -> dict:
    """Sealed-batch compaction for the streaming sample stores (both
    the flat ``streaming_sample_quantiles`` store and the day-keyed
    ``streaming_day_sample`` store): without it each micro-batch leaves
    its own ``batch_id=N`` directory forever — small-file growth
    unbounded in stream lifetime (r11 VERDICT item 3).

    Delegates to :func:`pgverify_spark.streaming.ingest.seal_and_compact`
    — the stores share the ingest store's exact layout and replay
    discipline, so the same crash-safe protocol applies verbatim: pass
    the newest CHECKPOINT-COMMITTED batch id as ``upto_exclusive``
    (those batches can never replay; the in-flight batch keeps its own
    directory for the dynamic-overwrite replay contract), sealed
    directories merge into one ``batch_id=-G`` generation via staging +
    rename with a ``_covers_upto`` marker, and recovery deletes
    resurrected duplicates before ever compacting further.  Content is
    untouched — ``finalize_streaming_quantiles`` /
    ``finalize_streaming_trailing_quantiles`` read the store through
    partition discovery and drop ``batch_id``, so their output is
    IDENTICAL before and after (asserted in tests); only the file count
    drops.  Run it as the same side-car maintenance job that compacts
    the ingest store.

    For a CAPPED day-keyed store pass the writer's ``cap_per_day``: the
    merged generation keeps only each day's bottom-cap over the sealed
    set — rows beyond it can never re-enter any future bottom-k (a
    superset only pushes them further out), so every CAPPED finalize is
    byte-identical before and after while both file AND row counts
    drop.  The per-day trim restores the hard days x cap state bound a
    long stream erodes (each batch writes its own per-day trim, so
    un-compacted state grows with batch count).  An UNCAPPED finalize
    over a cap-compacted store would see fewer rows — cap the store or
    don't; the parameter belongs to the store, not the query."""
    from pgverify_spark.streaming.ingest import seal_and_compact

    transform = None
    if cap_per_day is not None:
        from pgverify_spark.operators.sketch import grouped_sample_trim

        def transform(df):  # noqa: ANN001 — merged (day, v, hk) relation
            return (
                grouped_sample_trim(
                    df.withColumnRenamed("day", "grp"), cap_per_day
                ).withColumnRenamed("grp", "day")
            )

    return seal_and_compact(
        spark, sample_path, upto_exclusive, target_bytes, transform
    )


def finalize_streaming_trailing_quantiles(
    spark, sample_path: str, window_days: int = 7,
    probs_ppm: tuple[int, ...] = (250_000, 500_000, 750_000, 900_000, 990_000),
    cap_per_day: int | None = None,
) -> DataFrame:
    """Rolling-window quantile report from the persisted day-sample
    store — the same window fanout + rank selection as the batch
    operator (shared code path via
    ``rollup.trailing_quantiles_from_day_sample``).  For a capped store
    pass the writer's ``cap_per_day``: each day re-trims ACROSS batches
    first (trim-of-union == union-of-per-batch-trims), then the shared
    capped trailing path runs — output equals the batch operator with
    the same cap, and the entry shares its oracle."""
    from pgverify_spark.operators.rollup import trailing_quantiles_from_day_sample

    s = spark.read.parquet(sample_path).select("day", "v", "hk")
    if cap_per_day is not None:
        from pgverify_spark.operators.sketch import grouped_sample_trim

        s = (
            grouped_sample_trim(s.withColumnRenamed("day", "grp"), cap_per_day)
            .withColumnRenamed("grp", "day")
        )
    return trailing_quantiles_from_day_sample(
        s, window_days, probs_ppm, cap_per_day
    )


def streaming_kmv_overlap(
    sdf: DataFrame,
    store_path: str,
    k: int = 256,
    to_sides=None,
):
    """Streaming KMV set-operation maintenance: each micro-batch reduces
    to its <= 3k sketch SURVIVORS (``operators.sketch.kmv_overlap_survivors``
    — the union of the batch's three per-sketch top-k heads) and writes
    them to the persisted store — the same store-is-the-state shape as
    :func:`streaming_sample_quantiles`, because survivor membership
    needs no per-key streaming state.

    Exactness (shares the BATCH operator's oracle): a hash among the k
    smallest of the total union / total A / total B is among the k
    smallest of every batch subset containing it, so it survives that
    batch's trim with its side flags intact; re-aggregating the union
    of survivors through ``overlap_from_sides`` therefore equals the
    batch operator over all arrived rows.  State: <= 3k rows per batch
    in storage, the finalize reads batches-count x 3k rows — both
    constant in stream VOLUME.

    Replay-idempotent exactly as streaming_sample_quantiles: per-batch
    ``batch_id`` partition with dynamic overwrite.

    ``to_sides``: optional callable mapping the raw micro-batch to the
    (side_a, v) relation (e.g. tokenize + shingle); default expects the
    stream to already carry those columns.  Returns a configured
    ``writeStream`` (caller sets checkpoint and calls ``start()``).
    """
    def append(batch_df: DataFrame, batch_id: int) -> None:
        _write_kmv_overlap_batch(batch_df, batch_id, store_path, k, to_sides)

    return sdf.writeStream.foreachBatch(append).outputMode("append")


def _write_kmv_overlap_batch(
    batch_df: DataFrame, batch_id: int, store_path: str, k: int, to_sides
) -> None:
    from pyspark.sql import functions as F

    from pgverify_spark.operators.sketch import kmv_overlap_survivors
    from pgverify_spark.operators.util import release_cached_deps

    rel = batch_df if to_sides is None else to_sides(batch_df)
    surv = kmv_overlap_survivors(rel, "v", "side_a", k)
    (
        surv.withColumn("batch_id", F.lit(batch_id))
        .write.option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .partitionBy("batch_id")
        .parquet(store_path)
    )
    # a to_sides pipeline may persist intermediates (doc_term_edges'
    # shingle table) — the write above materialized everything
    release_cached_deps(rel)


def finalize_streaming_kmv_overlap(spark, store_path: str, k: int = 256) -> DataFrame:
    """The overlap report from the persisted survivor store: merge
    survivor flags per hash (max — a side seen in ANY batch counts),
    then the SAME report code path as the batch operator."""
    from pyspark.sql import functions as F

    from pgverify_spark.operators.sketch import overlap_from_sides

    merged = (
        spark.read.parquet(store_path)
        .groupBy("h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    return overlap_from_sides(merged, k)


# ---------------------------------------------------------------------------
# Streaming HyperLogLog
# ---------------------------------------------------------------------------

_HLL_OUT_SCHEMA = "grp string, updates int, regs array<int>"
_HLL_STATE_SCHEMA = "regs array<int>, updates int"


def streaming_hll_state(
    sdf: DataFrame, value_col: str, group_col: str, p: int = 8
) -> DataFrame:
    """Streaming twin of ``operators.sketch.hll_distinct``: per-group
    HLL registers folded across micro-batches.  State per group is the
    m-register vector itself — FIXED size forever, the property HLL is
    chosen for in monitoring systems; absorbing a batch is element-wise
    max, so arrival order and chunking are irrelevant (any feed
    converges to exactly the batch registers, asserted by sharing the
    batch oracle).

    The (bucket, rho) mapping runs as a stateless Spark SQL projection
    BEFORE the stateful operator — the same ``_hll_register_sql``
    expressions as batch, so the hash math never re-implements in
    Python.  The stateful fold is pure integer max; emitted rows carry
    the raw register vector and the ESTIMATE IS NOT COMPUTED HERE —
    :func:`finalize_streaming_hll` feeds the final registers through
    the batch ``hll_summary``, so the floating-point estimator is one
    code path for both modes and cannot drift.
    """
    import pandas as pd  # local: executors import lazily
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from pgverify_spark.operators.sketch import _hll_parts, _hll_register_sql

    m, _ = _hll_parts(p)
    grp, bucket, rho = _hll_register_sql(value_col, group_col, p, DIALECT_SPARK)
    rows = sdf.filter(f"{value_col} IS NOT NULL").selectExpr(
        f"CAST({group_col} AS STRING) AS grp", bucket, rho
    )

    def update_fn(key: tuple, pdfs, state: GroupState):
        regs, updates = state.get if state.exists else ([0] * m, 0)
        regs = list(regs)
        changed = False
        for pdf in pdfs:
            for b, r in zip(pdf["bucket"], pdf["r"]):
                b, r = int(b), int(r)
                if r > regs[b]:
                    regs[b] = r
                    changed = True
        if changed or updates == 0:
            updates += 1
            state.update((regs, updates))
            yield pd.DataFrame(
                {"grp": [key[0]], "updates": [updates], "regs": [regs]}
            )
        else:
            state.update((regs, updates))

    return rows.groupBy("grp").applyInPandasWithState(
        update_fn,
        outputStructType=_HLL_OUT_SCHEMA,
        stateStructType=_HLL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def finalize_streaming_hll(emitted: DataFrame, p: int = 8) -> DataFrame:
    """Last emitted register vector per group -> the batch summary.
    (grp, n_filled, register_sum, est_distinct) — byte-identical to
    ``hll_distinct`` over the same data because the estimator IS the
    batch ``hll_summary`` run on the final registers."""
    from pgverify_spark.operators.sketch import hll_summary

    return hll_summary(finalize_streaming_hll_registers(emitted), p)


def finalize_streaming_hll_registers(emitted: DataFrame) -> DataFrame:
    """Last emitted register vector per group as a (grp, bucket, r)
    relation — the composition point: any batch register consumer
    (trailing-window WAU merge, range rollup, overlap) runs unchanged
    on streamed state."""
    from pyspark.sql import functions as F

    latest = emitted.groupBy("grp").agg(
        F.expr("max_by(regs, updates)").alias("regs")
    )
    return latest.selectExpr(
        "grp", "posexplode(regs) AS (bucket, r)"
    ).filter("r > 0")
