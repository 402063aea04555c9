"""Deterministic sampling operators for training-data pipelines.

Beyond-reference extensions (the reference verifies tables, it does not
curate them): reproducible corpus sampling.  Random sampling is wrong
for verification and for reproducible dataset curation — two runs (or
two engines) would pick different rows — so selection is content-hashed:
a row is kept iff the first 48 bits of ``md5(key)`` fall under the
per-stratum rate.  The same construction as the reference's sparse
fingerprint sampler (``query.go:163-229``; here per-stratum and
rate-based rather than mod-based).

Scale shape: a pure filter + projection — no shuffle, no sort, no state.
The scan prunes to the key/stratum columns plus whatever the caller
projects; the md5 predicate is evaluated JVM-side in whole-stage codegen
and the filter collapses the output to ~rate x input before anything
else happens.  At 100 TB this is the cheapest possible operator shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pgverify_spark.functions.canonical import (
    DIALECT_DUCKDB,
    DIALECT_SPARK,
    hex_prefix_int_sql,
)

#: Selection-space denominator: rates are applied as integer thresholds
#: out of 2^20 buckets, so a rate is honored to ~1e-6 resolution and the
#: threshold arithmetic is exact (no float comparison at the boundary).
_BUCKETS = 1 << 20


def _keep_sql(key_col: str, rate_expr: str, dialect: str) -> str:
    """Deterministic keep-predicate: hash-bucket(key) < rate * 2^20."""
    cast = "STRING" if dialect == DIALECT_SPARK else "VARCHAR"
    sel = hex_prefix_int_sql(f"md5(CAST({key_col} AS {cast}))", dialect)
    return f"({sel} % {_BUCKETS}) < {rate_expr}"


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sample: keep each row of stratum ``s``
    with probability ``rates.get(s, default_rate)``, selected by content
    hash of ``key_col`` (reproducible across runs, engines and cluster
    layouts).

    The standard curation move for mixing training data (e.g. downsample
    ``lang='en'`` to 10 %, keep all ``lang='de'``): one declarative
    filter, so Catalyst pushes the stratum test into the scan and
    partition-prunes when the source is partitioned by the stratum.
    """
    return df.filter(_sample_predicate(key_col, strata_col, rates, default_rate, DIALECT_SPARK))


def _sample_predicate(
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float,
    dialect: str,
) -> str:
    cast = "STRING" if dialect == DIALECT_SPARK else "VARCHAR"
    branches = " ".join(
        f"WHEN CAST({strata_col} AS {cast}) = '{s}' THEN {int(r * _BUCKETS)}"
        for s, r in sorted(rates.items())
    )
    threshold = f"(CASE {branches} ELSE {int(default_rate * _BUCKETS)} END)"
    return _keep_sql(key_col, threshold, dialect)


def stratified_sample_oracle_sql(
    table: str,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> str:
    pred = _sample_predicate(key_col, strata_col, rates, default_rate, DIALECT_DUCKDB)
    return f"SELECT * FROM {table} WHERE {pred}"


#: Mixture weights are taken in parts-per-million so every step of the
#: rate derivation is BIGINT arithmetic — bit-identical across engines
#: (no float rounding at a keep/drop boundary).
_PPM = 1_000_000


def reservoir_sample(
    df: DataFrame, key_col: str, group_col: str, k: int
) -> DataFrame:
    """Exactly ``min(k, |group|)`` rows per group — the fixed-SIZE
    sibling of :func:`stratified_sample`'s fixed-RATE selection (eval
    sets, per-source spot-check panels, "give me 100 docs per
    language").  Selection is the content-hash rank of ``key_col``, so
    the sample is reproducible across runs, engines and cluster
    layouts, and adding new rows to a group only ever swaps individual
    members (hash order is stable — the online-reservoir property,
    without the RNG).

    Scale shape: one hash-partition exchange on ``group_col`` + a
    rank-k window; per-reducer cost is a k-bounded scan of its groups.
    For a group so hot one reducer can't stream it (10^9 rows of one
    language), pre-filter with the rate sampler at ~4k/|group| (counts
    from a map-side-combined aggregate, same derivation as
    :func:`mixture_sample`) and rank only the survivors — the hybrid
    keeps the window input ~k-sized per group at any skew.
    """
    h = hex_prefix_int_sql(f"md5(CAST({key_col} AS STRING))", DIALECT_SPARK, 15)
    w = Window.partitionBy(group_col).orderBy(F.expr(h), F.col(key_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def reservoir_sample_oracle_sql(
    table: str, key_col: str, group_col: str, k: int, cols: tuple[str, ...]
) -> str:
    h = hex_prefix_int_sql(f"md5(CAST({key_col} AS VARCHAR))", DIALECT_DUCKDB, 15)
    return (
        f"SELECT {', '.join(cols)} FROM (SELECT *, row_number() OVER "
        f"(PARTITION BY {group_col} ORDER BY {h}, {key_col}) AS rn "
        f"FROM {table}) t WHERE rn <= {k}"
    )


def _mixture_threshold_sql(weights: dict[str, float], target_frac: float, dialect: str) -> str:
    """Per-source keep-threshold (out of 2^20) as a CASE over integer math.

    desired_s = (N * frac_ppm / 1e6) * (w_s_ppm / 1e6), threshold_s =
    min(2^20, desired_s * 2^20 / n_s) — all floor division on BIGINTs.
    ``n`` and ``total`` are column references supplied by the caller's
    per-source counts relation.
    """
    div = " DIV " if dialect == DIALECT_SPARK else " // "
    frac_ppm = int(target_frac * _PPM)
    branches = " ".join(
        f"WHEN source = '{s}' THEN "
        f"(((total * {frac_ppm}){div}{_PPM} * {int(w * _PPM)}){div}{_PPM} * {_BUCKETS}){div}n"
        for s, w in sorted(weights.items())
    )
    return f"LEAST(CAST({_BUCKETS} AS BIGINT), CASE {branches} ELSE 0 END)"


def mixture_sample(
    df: DataFrame,
    key_col: str,
    source_col: str,
    weights: dict[str, float],
    target_frac: float,
) -> DataFrame:
    """Sample a corpus down to ``target_frac`` of its rows with the kept
    rows distributed across sources per ``weights`` (summing to ~1) —
    the data-mixture step of training-corpus assembly (e.g. "30 % web,
    30 % code, 40 % books, half the original volume").

    Unlike :func:`stratified_sample` the caller states the TARGET mixture,
    not per-source rates: rates are derived from the observed per-source
    counts inside the same plan (groupBy(source) -> tiny relation ->
    broadcast hash join back), then applied as the deterministic
    content-hash predicate.  A source whose desired share exceeds its
    population keeps everything (threshold capped at 2^20 — sampling
    never fabricates rows; re-weight upstream if a source runs dry).

    Scale shape: one map-side-combinable count aggregate over the source
    column (a scan that prunes to two columns), a broadcast join of the
    #sources-row rate table, and a JVM-codegen filter.  No wide shuffle
    of the corpus at any point.

    Returns the kept rows with all original columns.
    """
    threshold = _mixture_threshold_sql(weights, target_frac, DIALECT_SPARK)
    counts = (
        df.groupBy(F.col(source_col).alias("source"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("total", F.sum("n").over(Window.partitionBy(F.lit(1))))
        .selectExpr(
            "source AS __mix_source", f"{threshold} AS __mix_threshold"
        )
    )
    keep = _keep_sql(key_col, "__mix_threshold", DIALECT_SPARK)
    return (
        df.join(
            F.broadcast(counts),
            F.col(source_col) == F.col("__mix_source"),
            "inner",
        )
        .filter(keep)
        .select(*[df[c] for c in df.columns])
    )


def mixture_sample_oracle_sql(
    table: str,
    key_col: str,
    source_col: str,
    weights: dict[str, float],
    target_frac: float,
) -> str:
    """DuckDB twin of :func:`mixture_sample` (same integer derivation)."""
    threshold = _mixture_threshold_sql(weights, target_frac, DIALECT_DUCKDB)
    keep = _keep_sql(f"t.{key_col}", "c.keep_threshold", DIALECT_DUCKDB)
    return (
        f"WITH counts AS (SELECT {source_col} AS source, count(*) AS n FROM {table} GROUP BY 1), "
        f"c0 AS (SELECT source, n, sum(n) OVER () AS total FROM counts), "
        f"c AS (SELECT source, {threshold} AS keep_threshold FROM c0) "
        f"SELECT t.* FROM {table} t JOIN c ON t.{source_col} = c.source WHERE {keep}"
    )


def token_mixture_sample(
    df: DataFrame,
    key_col: str,
    source_col: str,
    text_col: str,
    weights: dict[str, float],
    target_frac: float,
) -> DataFrame:
    """:func:`mixture_sample` with the budget measured in TOKENS, not
    documents — how training mixes are actually specified ("30 % of the
    token budget from web"): sources with systematically longer
    documents would otherwise overshoot their share.  Per-source keep
    rates derive from the observed per-source token sums (same integer
    threshold math as mixture_sample with n = token sum); membership
    stays the per-row content-hash predicate, so the kept TOKEN share
    matches the target in expectation (document hash is independent of
    document length).

    Scale shape: identical to mixture_sample — one map-side-combinable
    (source -> token sum) aggregate, a broadcast #sources-row rate
    table, a codegen filter.  No wide shuffle.
    """
    tokens = f"CAST(size(split(trim({text_col}), '\\\\s+')) AS BIGINT)"
    threshold = _mixture_threshold_sql(weights, target_frac, DIALECT_SPARK)
    counts = (
        df.selectExpr(f"{source_col} AS source", f"{tokens} AS tk")
        .groupBy("source")
        .agg(F.sum("tk").alias("n"))
        .withColumn("total", F.sum("n").over(Window.partitionBy(F.lit(1))))
        .selectExpr("source AS __mix_source", f"{threshold} AS __mix_threshold")
    )
    keep = _keep_sql(key_col, "__mix_threshold", DIALECT_SPARK)
    return (
        df.join(
            F.broadcast(counts),
            F.col(source_col) == F.col("__mix_source"),
            "inner",
        )
        .filter(keep)
        .select(*[df[c] for c in df.columns])
    )


def token_mixture_sample_oracle_sql(
    table: str,
    key_col: str,
    source_col: str,
    text_col: str,
    weights: dict[str, float],
    target_frac: float,
) -> str:
    tokens = f"CAST(len(regexp_split_to_array(trim({text_col}), '\\s+')) AS BIGINT)"
    threshold = _mixture_threshold_sql(weights, target_frac, DIALECT_DUCKDB)
    keep = _keep_sql(f"t.{key_col}", "c.keep_threshold", DIALECT_DUCKDB)
    return (
        f"WITH counts AS (SELECT {source_col} AS source, sum({tokens}) AS n "
        f"FROM {table} GROUP BY 1), "
        "c0 AS (SELECT source, n, sum(n) OVER () AS total FROM counts), "
        f"c AS (SELECT source, {threshold} AS keep_threshold FROM c0) "
        f"SELECT t.* FROM {table} t JOIN c ON t.{source_col} = c.source WHERE {keep}"
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_expr: str,
    target_rows: int,
) -> DataFrame:
    """Importance-weighted Bernoulli sample: keep each row with
    probability proportional to ``weight_expr`` (clipped at 1),
    calibrated so the expected kept count is ~``target_rows`` — the
    quality-/length-proportional subsampling step of corpus curation
    ("keep ~1M docs, preferring the long/high-quality ones"), with the
    inclusion probability emitted per row so downstream statistics can
    reweight unbiasedly (Horvitz-Thompson: sum(1e6 / incl_ppm) over the
    kept rows estimates the population count; sum(x * 1e6 / incl_ppm)
    any population total).

    Selection stays the engine's deterministic content-hash predicate —
    NOT an RNG — and the per-row threshold is pure BIGINT arithmetic:
    ``min(2^20, (target_rows * w * 2^20) div sum(w))`` out of 2^20 hash
    buckets, so two engines (and two runs) keep byte-identical row sets
    and there is no float comparison at any keep/drop boundary.  Rows
    whose weight would imply probability > 1 are kept outright (their
    ``incl_ppm`` reads 1e6); re-calibrate upstream if many clip.

    Scale shape: one map-side-combinable 1-row sum aggregate, broadcast
    back over a cross join (a single scalar), then a JVM-codegen filter
    — no wide shuffle of the corpus at any point, the same cheapest
    shape as the other samplers.  BIGINT headroom: target_rows * w *
    2^20 must stay under 2^63 — fine through target 10^6 x weight 10^9.

    Output: all original columns plus ``incl_ppm`` (inclusion
    probability in parts-per-million, BIGINT).
    """
    tot = df.selectExpr(f"CAST({weight_expr} AS BIGINT) AS __w").agg(
        F.expr("sum(__w)").alias("__w_total")
    )
    thr = (
        f"LEAST(CAST({_BUCKETS} AS BIGINT), "
        f"(CAST({target_rows} AS BIGINT) * CAST({weight_expr} AS BIGINT) "
        f"* {_BUCKETS}) DIV __w_total)"
    )
    keep = _keep_sql(key_col, "__ws_threshold", DIALECT_SPARK)
    return (
        df.crossJoin(F.broadcast(tot))
        .withColumn("__ws_threshold", F.expr(thr))
        .filter(keep)
        .select(
            *[df[c] for c in df.columns],
            F.expr(
                f"CAST((__ws_threshold * {_PPM}) DIV {_BUCKETS} AS BIGINT)"
            ).alias("incl_ppm"),
        )
    )


def weighted_sample_oracle_sql(
    table: str,
    key_col: str,
    weight_expr: str,
    target_rows: int,
    cols: tuple[str, ...],
) -> str:
    thr = (
        f"LEAST(CAST({_BUCKETS} AS BIGINT), "
        f"(CAST({target_rows} AS BIGINT) * CAST({weight_expr} AS BIGINT) "
        f"* {_BUCKETS}) // __w_total)"
    )
    keep = _keep_sql(key_col, "__ws_threshold", DIALECT_DUCKDB)
    return (
        f"WITH w AS (SELECT sum(CAST({weight_expr} AS BIGINT)) AS __w_total "
        f"FROM {table}), "
        f"s AS (SELECT t.*, {thr} AS __ws_threshold FROM {table} t CROSS JOIN w) "
        f"SELECT {', '.join(cols)}, "
        f"CAST((__ws_threshold * {_PPM}) // {_BUCKETS} AS BIGINT) AS incl_ppm "
        f"FROM s WHERE {keep}"
    )
