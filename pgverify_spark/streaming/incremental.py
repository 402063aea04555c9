"""Structured Streaming extensions: incremental verification.

The reference is strictly batch (SURVEY.md §1.4); these operators extend
verification to continuously-arriving data:

- ``streaming_additive_fingerprint`` — maintains the order-insensitive
  additive fingerprint (see ``operators.fingerprint.additive_fingerprint``)
  incrementally: rows hash-bucket on their row-hash and the streaming
  aggregation keeps (count, sum) per bucket, so state is bounded at
  ``buckets`` rows regardless of stream length, and the finalized value
  equals the batch additive fingerprint of everything ingested —
  addition commutes with arbitrary arrival order, which is exactly why
  the *ordered* fingerprints cannot be streamed (SURVEY.md §7.4).
- ``streaming_windowed_counts`` — event-time windowed aggregation with a
  watermark for late data: the standard monitoring companion (per-type
  counts/sums per window) for a table under continuous ingest.

Scale: streaming state lives in the state store keyed by bucket/window —
a few thousand entries — and each micro-batch does one map-side partial
aggregate; no sort, no wide shuffle beyond the keyed exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pgverify_spark.config import VerifyConfig
from pgverify_spark.functions.canonical import DIALECT_SPARK, hex_prefix_int_sql, row_hash_sql
from pgverify_spark.operators.fingerprint import ADDITIVE_MOD
from pgverify_spark.sources.schemas import TableSchema


def streaming_additive_fingerprint(
    sdf: DataFrame,
    schema: TableSchema,
    config: VerifyConfig | None = None,
    buckets: int = 1024,
) -> DataFrame:
    """Per-bucket incremental fingerprint state (streaming DataFrame).

    Output (complete/update mode): (bucket, cnt, hsum) — finalize with
    :func:`finalize_additive_fingerprint` to get the scalar ``count:sum``
    comparable to the batch ``additive`` mode.
    """
    config = config or VerifyConfig()
    cols = schema.hashed_cols(config.valid_column)
    h = row_hash_sql(cols, DIALECT_SPARK, config.trunc_unit)
    h48 = hex_prefix_int_sql("hm", DIALECT_SPARK)
    return (
        sdf.selectExpr(f"{h} AS hm")
        .selectExpr(f"CAST({h48} AS DECIMAL(38,0)) AS hv")
        .selectExpr("hv", f"CAST(hv % {buckets} AS INT) AS bucket")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("hv").alias("hsum"))
    )


def finalize_additive_fingerprint(bucket_state: DataFrame) -> str:
    """Collapse per-bucket state to the scalar ``count:sum`` fingerprint
    (identical to ``additive_fingerprint`` over the same rows)."""
    row = bucket_state.selectExpr(
        "concat_ws(':', CAST(sum(cnt) AS STRING), "
        f"CAST(CAST(sum(hsum) % {ADDITIVE_MOD} AS DECIMAL(38,0)) AS STRING)) AS fp"
    ).collect()[0]
    return row.fp


#: Output / state schemas for the stateful bucket fingerprint operator.
_BUCKET_OUT_SCHEMA = "bucket int, cnt bigint, hsum bigint, updates int"
_BUCKET_STATE_SCHEMA = "cnt bigint, hsum bigint, updates int"


def streaming_stateful_bucket_fingerprint(
    sdf: DataFrame,
    schema: TableSchema,
    config: VerifyConfig | None = None,
    buckets: int = 64,
) -> DataFrame:
    """Per-bucket incremental fingerprint via ``applyInPandasWithState``
    — a custom stateful operator, not a built-in aggregation, because it
    emits a bucket's row ONLY in micro-batches where that bucket changed
    (change-data-capture of the fingerprint itself; a ``groupBy().agg``
    in update mode cannot carry the per-bucket update counter).

    State per bucket: ``(cnt, hsum, updates)`` where ``hsum`` is the
    48-bit row-hash sum mod 2^61-1 — modular addition is associative, so
    folding each micro-batch's partial sum into state reproduces the
    batch ``additive`` fingerprint exactly, in any arrival order.  State
    is bounded at ``buckets`` rows forever (no watermark needed).

    Output rows carry ``updates`` (how many micro-batches touched the
    bucket) so downstream consumers can keep the latest state per bucket
    from an append/update sink.
    """
    import pandas as pd  # local: executors import lazily
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    config = config or VerifyConfig()
    cols = schema.hashed_cols(config.valid_column)
    h = row_hash_sql(cols, DIALECT_SPARK, config.trunc_unit)
    h48 = hex_prefix_int_sql("hm", DIALECT_SPARK)
    rows = (
        sdf.selectExpr(f"{h} AS hm")
        .selectExpr(f"CAST({h48} AS BIGINT) AS hv")
        .selectExpr("hv", f"CAST(hv % {buckets} AS INT) AS bucket")
    )

    def update_fn(key: tuple, pdfs, state: GroupState):
        cnt, hsum, updates = state.get if state.exists else (0, 0, 0)
        delta_n, delta_sum = 0, 0
        for pdf in pdfs:
            delta_n += len(pdf)
            # Python-int sum: per-batch totals exceed int64 long before
            # the modular fold does (48-bit values), so don't let numpy
            # wrap silently.
            delta_sum += int(sum(map(int, pdf["hv"])))
        cnt += delta_n
        hsum = (hsum + delta_sum) % ADDITIVE_MOD
        updates += 1
        state.update((cnt, hsum, updates))
        yield pd.DataFrame(
            {"bucket": [key[0]], "cnt": [cnt], "hsum": [hsum], "updates": [updates]}
        )

    return rows.groupBy("bucket").applyInPandasWithState(
        update_fn,
        outputStructType=_BUCKET_OUT_SCHEMA,
        stateStructType=_BUCKET_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_bucket_fingerprint_oracle_sql(
    table: str,
    schema: TableSchema,
    config: VerifyConfig | None = None,
    buckets: int = 64,
    chunk_sql: str = "event_id % 4",
) -> str:
    """DuckDB twin of the FINAL state of a chunk-file drive of
    :func:`streaming_stateful_bucket_fingerprint`.

    The operator itself is not SQL-expressible (per-micro-batch state
    updates), but its final per-bucket state IS deterministic SQL when
    each source chunk maps to exactly one micro-batch
    (``maxFilesPerTrigger=1`` over one file per chunk): ``cnt`` is the
    bucket's row count, ``hsum`` the 48-bit row-hash sum mod 2^61-1
    (modular addition is associative, so the per-batch fold equals the
    one-shot sum in any arrival order), and ``updates`` the number of
    distinct chunks containing at least one row of the bucket — one
    state update per micro-batch that touched it.
    """
    from pgverify_spark.functions.canonical import DIALECT_DUCKDB

    config = config or VerifyConfig()
    cols = config.typed_cols(schema.hashed_cols(config.valid_column))
    h = row_hash_sql(cols, DIALECT_DUCKDB, config.trunc_unit)
    h48 = hex_prefix_int_sql("hm", DIALECT_DUCKDB)
    return (
        f"WITH hm AS (SELECT {h} AS hm, {chunk_sql} AS chunk FROM {table}), "
        f"v AS (SELECT CAST({h48} AS BIGINT) AS hv, chunk FROM hm), "
        f"b AS (SELECT hv, CAST(hv % {buckets} AS INTEGER) AS bucket, chunk FROM v) "
        "SELECT bucket, CAST(count(*) AS BIGINT) AS cnt, "
        f"CAST(sum(hv) % {ADDITIVE_MOD} AS BIGINT) AS hsum, "
        "CAST(count(DISTINCT chunk) AS INTEGER) AS updates "
        "FROM b GROUP BY bucket ORDER BY bucket"
    )


def finalize_stateful_bucket_fingerprint(emitted: DataFrame) -> str:
    """Collapse emitted (bucket, cnt, hsum, updates) rows — keeping each
    bucket's latest update — to the scalar ``count:sum`` fingerprint,
    identical to batch ``additive_fingerprint`` over the same rows."""
    latest: dict[int, tuple[int, int, int]] = {}
    for r in emitted.collect():
        cur = latest.get(r["bucket"])
        if cur is None or r["updates"] > cur[2]:
            latest[r["bucket"]] = (r["cnt"], r["hsum"], r["updates"])
    total_cnt = sum(v[0] for v in latest.values())
    total_sum = sum(v[1] for v in latest.values()) % ADDITIVE_MOD
    return f"{total_cnt}:{total_sum}"


def streaming_windowed_counts(
    sdf: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Event-time windowed per-key counts and value sums with a watermark
    bounding state for late data.  ``ts_col`` may be a bigint of epoch
    nanoseconds (the nanosAsLong parquet read) or a real timestamp.
    """
    fields = dict(sdf.dtypes)
    if fields.get(ts_col) == "bigint":
        sdf = sdf.withColumn(ts_col, F.timestamp_micros((F.col(ts_col) / 1000).cast("long")))
    elif fields.get(ts_col) == "timestamp_ntz":
        # Watermarks require TIMESTAMP; the cast is wall-clock-preserving
        # under the UTC session zone pinned by session.REQUIRED_CONFS.
        sdf = sdf.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # decimal-exact: double sums accumulate in arrival order and
            # cannot hash-match an oracle (same policy as rollup.py)
            F.sum(F.col(value_col).cast("decimal(18,6)")).alias("value_sum"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            key_col,
            "n_events",
            "value_sum",
        )
    )


def streaming_dedup(sdf: DataFrame, text_col: str = "text") -> DataFrame:
    """Streaming exact deduplication: emit only the first-arriving
    document per normalized-content hash — the streaming twin of
    ``operators.dedup.exact_dup_groups`` (which *reports* duplicates;
    this *drops* them at ingest, the shape a continuously-fed training
    pipeline needs).

    State: one entry per distinct content hash, exact over the whole
    stream.  For unbounded streams where content recurrence has a time
    horizon, swap ``dropDuplicates`` for ``dropDuplicatesWithinWatermark``
    after ``withWatermark`` to bound state to the horizon — same plan
    shape, state expiring with the watermark.

    Which duplicate survives depends on arrival order (inherent to
    streaming); the *set of distinct content hashes* and the kept-row
    count are deterministic and equal the batch distinct — asserted in
    tests/test_streaming.py.
    """
    from pgverify_spark.functions.text_exprs import norm_sql

    hashed = sdf.withColumn(
        "content_md5", F.expr(f"md5({norm_sql(text_col, DIALECT_SPARK)})")
    )
    return hashed.dropDuplicates(["content_md5"])


def streaming_dedup_bounded(
    sdf: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    horizon: str = "30 days",
) -> DataFrame:
    """Bounded-state streaming dedup: :func:`streaming_dedup` whose
    per-hash state EXPIRES with the event-time watermark — the form an
    *unbounded* stream must run (exact dropDuplicates state grows with
    distinct content forever; this holds one entry per distinct hash
    seen within the last ``horizon``).

    Semantics (proven in tests/test_streaming.py): a duplicate arriving
    within ``horizon`` of its first occurrence is dropped; a recurrence
    AFTER the horizon is re-admitted — the deliberate trade that bounds
    state, appropriate when content recurrence has a time locality
    (crawl recrawls, retry storms), and exactly Spark's
    ``dropDuplicatesWithinWatermark`` contract.
    """
    from pgverify_spark.functions.text_exprs import norm_sql

    fields = dict(sdf.dtypes)
    if fields.get(ts_col) == "bigint":
        sdf = sdf.withColumn(
            ts_col, F.timestamp_micros((F.col(ts_col) / 1000).cast("long"))
        )
    elif fields.get(ts_col) == "timestamp_ntz":
        sdf = sdf.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    hashed = sdf.withColumn(
        "content_md5", F.expr(f"md5({norm_sql(text_col, DIALECT_SPARK)})")
    )
    return hashed.withWatermark(ts_col, horizon).dropDuplicatesWithinWatermark(
        ["content_md5"]
    )


def streaming_lsh_ingest_probe(
    sdf: DataFrame, index_name: str, out_path: str, threshold: float = 0.5
):
    """Streaming near-dup ingest gate: every micro-batch of arriving
    documents probes the persisted bucketed MinHash-LSH index
    (``operators.dedup.write_lsh_index``) and appends its near-duplicate
    pairs (new_doc, corpus_doc, jaccard) to ``out_path`` — the
    production ingest loop, composed from the pieces this engine already
    certifies: per-batch cost is O(batch) with ZERO corpus-side Exchange
    (the index arrives pre-bucketed), and the per-batch persisted
    intermediates are released after each batch materializes, so a
    day-long ingest run holds executor storage flat.

    Probes are independent per document, so the union of per-batch
    outputs equals the one-shot ``cross_corpus_lsh_pairs`` over all
    arrived docs — which is the oracle pairing.

    Returns a configured ``writeStream`` (caller sets checkpoint and
    calls ``start()``).  ``foreachBatch`` is the right tool here, not a
    stateful operator: the standing corpus is a *batch* artifact and the
    probe a batch join per micro-batch; no streaming state is needed.
    """
    from pgverify_spark.operators.dedup import probe_lsh_index
    from pgverify_spark.operators.util import release_cached_deps

    def probe(batch_df: DataFrame, _batch_id: int) -> None:
        res = probe_lsh_index(
            batch_df.sparkSession, batch_df, index_name, threshold
        )
        res.write.mode("append").parquet(out_path)
        release_cached_deps(res)

    return sdf.writeStream.foreachBatch(probe).outputMode("append")


def streaming_debounce(sdf: DataFrame, window_us: int = 5_000_000) -> DataFrame:
    """Streaming retry-burst collapse — the stateful twin of
    ``operators.rollup.debounce``: per (user_id, event_type) key the
    state is ONE bigint (the last-seen event time); each micro-batch
    left-folds its time-sorted events through that scalar, emitting the
    events whose gap to their predecessor exceeds ``window_us``.  A
    left fold over time-ordered events makes prefix-then-suffix
    identical to the whole, so streaming equals batch under the same
    event-time-ordered delivery contract as the streaming funnel
    (streaming/funnel.py); kept events are final on emission — append
    mode, no retraction.

    State: one bigint per active (user, type) key, forever — no growth
    with event count, no watermark needed.
    """
    import pandas as pd  # local: executors import lazily
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from pgverify_spark.functions.timecol import epoch_us_sql

    rows = sdf.selectExpr(
        "user_id", "event_type", "event_id", f"{epoch_us_sql(sdf)} AS us", "value"
    )

    def update_fn(key: tuple, pdfs, state: GroupState):
        (last_us,) = state.get if state.exists else (None,)
        kept = {"event_id": [], "us": [], "value": []}
        for pdf in pdfs:
            for us, eid, val in sorted(
                zip(map(int, pdf["us"]), map(int, pdf["event_id"]), pdf["value"])
            ):
                if last_us is None or us - last_us > window_us:
                    kept["event_id"].append(eid)
                    kept["us"].append(us)
                    kept["value"].append(val)
                last_us = us
        state.update((last_us,))
        if kept["event_id"]:
            n = len(kept["event_id"])
            yield pd.DataFrame(
                {
                    "event_id": kept["event_id"],
                    "user_id": [key[0]] * n,
                    "event_type": [key[1]] * n,
                    "us": kept["us"],
                    "value": kept["value"],
                }
            )

    return rows.groupBy("user_id", "event_type").applyInPandasWithState(
        update_fn,
        outputStructType="event_id bigint, user_id bigint, event_type string, "
        "us bigint, value double",
        stateStructType="last_us bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_ivf_ingest_probe(
    sdf: DataFrame,
    index_name: str,
    out_path: str,
    tau: float = 0.9,
    nprobe: int = 2,
):
    """Streaming EMBEDDING near-dup ingest gate — the semantic twin of
    :func:`streaming_lsh_ingest_probe`: every micro-batch of arriving
    vectors probes the persisted bucketed IVF inverted file
    (``similarity.write_ivf_index``) and appends its (new_vec,
    corpus_vec, cosine) near-duplicates to ``out_path``.  Per-batch
    cost: the probed cells bucket-prune the stored index (~nprobe/C of
    its files read) and the batch side broadcasts — nothing
    corpus-sized shuffles, no streaming state (the standing index is a
    batch artifact; ``foreachBatch`` is the right tool, same reasoning
    as the LSH gate).

    Probes are independent per vector, so the union of per-batch
    outputs equals the one-shot ``cross_corpus_ivf_pairs`` over all
    arrived vectors — the oracle pairing.
    """
    from pgverify_spark.operators.similarity import probe_ivf_dups

    def probe(batch_df: DataFrame, _batch_id: int) -> None:
        res = probe_ivf_dups(
            batch_df.sparkSession, batch_df, index_name, tau, nprobe
        )
        res.write.mode("append").parquet(out_path)

    return sdf.writeStream.foreachBatch(probe).outputMode("append")


def streaming_session_rollup(
    sdf: DataFrame,
    gap_us: int = 30 * 60 * 1_000_000,
    watermark: str = "1 second",
) -> DataFrame:
    """Streaming gap-based sessionization: Spark's native
    ``session_window`` merges events into per-user sessions whose gap
    exceeds ``gap_us`` — the streaming twin of the batch
    ``operators.rollup.sessionize`` (same session boundaries; asserted
    equal in tests over a chunked replay).

    Output per (user_id, session): window start/end, event count, exact
    decimal value sum.  ``session_window``'s end extends ``gap`` past
    the last event (Spark's definition), so the batch-comparable end is
    ``window.end - gap``.

    State: one open session per active user, merged and emitted by the
    state store as the watermark passes; scales with concurrent active
    users, not stream length.  ``watermark`` sets the late-data bound:
    rows later than it are dropped, rows within it merge into (or
    re-split) their open session before it finalizes — equality with
    batch replay under bounded out-of-order delivery is asserted in
    tests/test_streaming.py's late-data test.
    """
    from pgverify_spark.functions.timecol import epoch_us_sql

    with_ts = sdf.withColumn("ets", F.timestamp_micros(F.expr(epoch_us_sql(sdf))))
    gap_expr = f"INTERVAL {gap_us} MICROSECOND"
    return (
        with_ts.withWatermark("ets", watermark)
        .groupBy(F.session_window("ets", gap_expr), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.expr("CAST(value AS DECIMAL(18,2))")).cast("decimal(38,2)").alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros("session_window.start").alias("start_us"),
            (F.unix_micros("session_window.end") - F.lit(gap_us)).alias("end_us"),
            "n_events",
            "sum_value",
        )
    )


def bloom_words(docs: DataFrame, n: int | None = None, eval_mod: int = 10) -> DataFrame:
    """Static Bloom bitmap words from a batch eval corpus — the build
    half of :func:`streaming_bloom_decontaminate` (the bitmap is built
    once from the fixed eval suite; the stream only probes it)."""
    from pgverify_spark.operators.contamination import (
        CONTAM_N,
        _bloom_pos_exprs,
        _contam_shingled,
    )

    n = CONTAM_N if n is None else n
    return (
        _contam_shingled(docs, n)
        .filter(f"doc_id % {eval_mod} = 0")
        .selectExpr("explode(shingles) AS s")
        .selectExpr(f"explode(array({', '.join(_bloom_pos_exprs('s'))})) AS pos")
        .selectExpr(
            "pos DIV 63 AS word_idx",
            "shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT)) AS m",
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(m)").alias("word"))
    )


def streaming_bloom_decontaminate(
    sdf: DataFrame,
    words: DataFrame,
    n: int | None = None,
    min_hits: int = 2,
) -> DataFrame:
    """Decontaminate a document stream at ingest: probe each arriving
    document's shingles against a *static* broadcast Bloom bitmap of the
    eval suite — the streaming twin of
    :func:`pgverify_spark.operators.contamination.bloom_decontaminate`,
    emitting identical rows (asserted in tests and shared oracle).

    Plan shape under streaming's one-stateful-operator constraint: the
    k membership checks are k stream-static *broadcast joins* (one per
    hash function), so each shingle stays a single row — no per-shingle
    aggregation — and the only stateful operator is the final per-doc
    count.  State is one counter row per in-flight document; documents
    arrive whole (one row each), so each doc's aggregate finalizes in
    the micro-batch that carries it.

    Scale: the bitmap is m/8 bytes whatever the eval size (the
    stream-static join broadcasts it once per query, not per batch);
    the probe itself is stateless per-row arithmetic.
    """
    from pgverify_spark.functions.text_exprs import (
        ngrams_sql,
        shingle_ints_sql,
        tokens_sql,
    )
    from pgverify_spark.operators.contamination import (
        BLOOM_K,
        CONTAM_N,
        _bloom_pos_exprs,
    )

    n = CONTAM_N if n is None else n
    d = DIALECT_SPARK
    pos = _bloom_pos_exprs("s")
    probe_cols = ["doc_id", "s"]
    for j in range(BLOOM_K):
        probe_cols += [
            f"({pos[j]}) DIV 63 AS w{j}",
            f"shiftleft(CAST(1 AS BIGINT), CAST(({pos[j]}) % 63 AS INT)) AS m{j}",
        ]
    probe = (
        sdf.selectExpr("doc_id", f"{tokens_sql('text', d)} AS tokens")
        .filter(f"size(tokens) >= {n}")
        .selectExpr("doc_id", f"{ngrams_sql('tokens', n, d)} AS grams")
        .selectExpr("doc_id", f"{shingle_ints_sql('grams', d)} AS shingles")
        .selectExpr("doc_id", "explode(shingles) AS s")
        .selectExpr(*probe_cols)
    )
    checks = []
    for j in range(BLOOM_K):
        side = F.broadcast(
            words.selectExpr(f"word_idx AS w{j}", f"word AS word_{j}")
        )
        probe = probe.join(side, f"w{j}", "left")
        checks.append(f"CAST(word_{j} IS NOT NULL AND (word_{j} & m{j}) <> 0 AS INT)")
    return (
        probe.selectExpr("doc_id", f"CAST({' + '.join(checks)} = {BLOOM_K} AS INT) AS sh_hit")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum("sh_hit").alias("bloom_hits"),
        )
        .selectExpr(
            "doc_id",
            "n_shingles",
            "bloom_hits",
            f"CAST(bloom_hits >= {min_hits} AS INT) AS contaminated",
        )
    )


def streaming_lm_scores(sdf: DataFrame, model: DataFrame) -> DataFrame:
    """Score a document stream at ingest against an offline-trained
    bigram model (:func:`pgverify_spark.operators.lm.bigram_model`) —
    the production LM-quality-gate shape: the model is trained once on
    the standing corpus, and arriving documents are scored online.
    Emits the same rows as the batch
    :func:`~pgverify_spark.operators.lm.bigram_lm_scores` when the
    stream replays the training corpus (shared oracle; asserted in
    tests).

    Plan shape: the bigram explode is stateless; the model lookup is a
    stream-static broadcast join (the min_count-pruned model is
    broadcast once per query); the only stateful operator is the
    per-doc aggregation, one counter row per in-flight document —
    documents arrive whole, so each finalizes in its carrying
    micro-batch.
    """
    from pgverify_spark.functions.text_exprs import ngrams_sql, tokens_sql
    from pgverify_spark.operators.lm import LM_SCALE

    d = DIALECT_SPARK
    grams = (
        sdf.selectExpr("doc_id", f"{tokens_sql('text', d)} AS tokens")
        .filter("size(tokens) >= 2")
        .selectExpr("doc_id", f"explode({ngrams_sql('tokens', 2, d)}) AS gram")
    )
    return (
        grams.join(F.broadcast(model), "gram", "left")
        .selectExpr("doc_id", "coalesce(q, CAST(0 AS BIGINT)) AS q")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum("q").alias("sum_q"))
        .selectExpr(
            "doc_id",
            "n_bigrams",
            "sum_q",
            f"round(CAST(sum_q AS DOUBLE) / CAST(n_bigrams AS DOUBLE) / {LM_SCALE}, 6)"
            " AS avg_cond_p",
        )
    )
