"""Grouped top-k: the per-group leaderboard primitive.

Beyond-reference extension: "top N x per y" (top parts per supplier,
top documents per language, top URLs per domain) is the single most
common reporting shape over a large fact table, and the naive global
``ORDER BY`` it replaces is a full sort of the fact table.

Scale shape: aggregate first (hash shuffle with map-side combine down
to |groups x keys| rows), *then* rank within groups with a
``row_number`` window — the window runs over the aggregated relation,
orders of magnitude smaller than the fact table, and needs no global
sort.  Ties break on the ranked key so the selected set is
deterministic cross-engine.  For extreme group cardinality the window
shuffle can reuse the aggregation's partitioning when the group key is
a prefix of the aggregation key (as here) — AQE plans exactly that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def grouped_topk_revenue(df: DataFrame, k: int = 3) -> DataFrame:
    """Top-``k`` parts by exact-decimal revenue within each supplier:
    (l_suppkey, l_partkey, revenue, rank)."""
    # ONE exchange serves both the aggregate and the window: hash
    # partitioning on l_suppkey alone satisfies the (l_suppkey,
    # l_partkey) aggregation's clustered-distribution requirement AND
    # the window's, so Catalyst plans no further shuffle after the
    # explicit repartition (plan-pinned in tests/test_plan_audit.py).
    # Trade: the shuffle carries raw (s, p, r) rows instead of
    # map-side-combined partials — the right side of the trade when
    # per-(s, p) multiplicity is small (lineitem: ~1-2 rows per pair;
    # measured 1.5 s -> 1.0 s at sf0.1).  For a high-multiplicity key,
    # keep the plain groupBy and let the partial aggregate earn its
    # second exchange.  Width is EXPLICIT and size-derived
    # (util.scaled_partitions): the downstream window rank is CPU-heavy
    # per row, and AQE byte-coalescing would run it on one task at
    # small scale (measured 1.0 s -> 3.3 s under parallelismFirst=false
    # before the pin).
    from pgverify_spark.operators.util import scaled_partitions

    rev = (
        df.selectExpr(
            "l_suppkey",
            "l_partkey",
            "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS r",
        )
        .repartition(scaled_partitions(df), "l_suppkey")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("r").cast("decimal(38,4)").alias("revenue"))
    )
    w = Window.partitionBy("l_suppkey").orderBy(
        F.desc("revenue"), F.asc("l_partkey")
    )
    return (
        rev.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("l_suppkey", "l_partkey", "revenue", "rank")
    )


def grouped_topk_revenue_oracle_sql(table: str, k: int = 3) -> str:
    return (
        "WITH rev AS (SELECT l_suppkey, l_partkey, "
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) "
        "AS DECIMAL(38,4)) AS revenue "
        f"FROM {table} GROUP BY l_suppkey, l_partkey) "
        "SELECT l_suppkey, l_partkey, revenue, rank FROM ("
        "SELECT l_suppkey, l_partkey, revenue, row_number() OVER ("
        "PARTITION BY l_suppkey ORDER BY revenue DESC, l_partkey ASC) AS rank FROM rev) t "
        f"WHERE rank <= {k}"
    )


def equidepth_histogram(
    df: DataFrame, col: str, buckets: int = 10, width: int | None = None
) -> DataFrame:
    """Equi-depth (equal-count) histogram of ``col``:
    (bucket, n, lo, hi) — the bucket boundaries a range-partitioner or
    a BI tool's quantile axis would use.

    Exact ntile semantics, computed WITHOUT the single-reducer global
    window (r9 VERDICT item 4) — the classic distributed ranking:

    1. range-repartition on ``col`` + in-partition sort (boundaries
       from Spark's range sampler, balanced under skew; width
       size-derived — ``util.scaled_partitions``, floor 1 — so a small
       column sorts on one well-fed task with no boundary-sampling
       pass while a 100 TB column gets bytes/64 MB partitions);
    2. per-partition row counts → cumulative offsets — an
       O(#partitions) driver step, independent of data size;
    3. global rank = partition offset + the in-partition row number,
       both decoded from ``monotonically_increasing_id()`` computed
       narrowly on the sorted relation (pid = id >> 33, row number =
       low 33 bits + 1) — never a global window, and (r12) never a
       Window at all: the previous pid-partitioned ``row_number``
       forced an ENSURE_REQUIREMENTS re-shuffle of the whole
       range-sorted column on pid, which the id arithmetic removes;
    4. ntile's bucket from the rank in closed form: with
       ``N = q·buckets + rem``, the first ``rem`` buckets take ``q+1``
       rows — pure integer arithmetic, so the result is exactly what
       ``ntile(buckets) OVER (ORDER BY col)`` produces.

    Ties may straddle a partition boundary, but range partitioning
    keeps equal values in adjacent partitions with everything smaller
    before and larger after, so offset+row_number is a valid total
    order — and the OUTPUT is tie-invariant anyway: bucket sizes are
    fixed by ntile's definition, and a straddling value appears as one
    bucket's ``hi`` and the next's ``lo`` whichever side each tied row
    lands on.  The oracle twin stays DuckDB's literal ``ntile``.

    The range-sorted relation is persisted (the offsets pass and the
    rank pass must see the SAME sampled partitioning) and tagged on the
    result for ``util.release_cached_deps``.
    """
    from pgverify_spark.operators.util import scaled_partitions, tag_cached_deps

    spark = df.sparkSession
    vals = df.select(col)
    # `width` pins the exchange width (tests exercise the multi-partition
    # offset math with it); None derives it from the size estimate
    if width is None:
        width = scaled_partitions(vals, floor=1)
    ranged = (
        vals.repartitionByRange(width, F.asc(col))
        .sortWithinPartitions(F.asc(col))
        .withColumn("mid", F.monotonically_increasing_id())
        .persist()
    )
    counts = {
        r["pid"]: r["cnt"]
        for r in ranged.selectExpr("mid >> 33 AS pid")
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    # n_total from the per-pid counts — no separate full scan
    n_total = sum(counts.values())
    if n_total == 0:
        ranged.unpersist()
        return vals.selectExpr(
            "CAST(NULL AS INT) AS bucket",
            f"CAST(count(1) AS BIGINT) AS n",
            f"min({col}) AS lo",
            f"max({col}) AS hi",
        ).filter("bucket IS NOT NULL")
    offs, acc = [], 0
    for i in sorted(counts):
        offs.append((i, acc))
        acc += counts[i]
    q, rem = divmod(n_total, buckets)
    cut = rem * (q + 1)
    # q == 0 ⇒ cut == N and the ELSE branch is unreachable (divisor
    # clamped to keep the expression well-formed)
    bucket = (
        f"CASE WHEN rank <= {cut} THEN CAST((rank - 1) div {q + 1} AS INT) + 1 "
        f"ELSE {rem} + CAST((rank - {cut} - 1) div {max(q, 1)} AS INT) + 1 END"
    )
    rows = ranged.selectExpr(
        col, "mid >> 33 AS pid", "(mid & 8589934591) + 1 AS rn"
    )
    if len(offs) <= 64:
        # offsets as a literal CASE: a per-pid constant needs no join —
        # the broadcast build of the offsets relation is a whole Spark
        # job (~100 ms constant at any scale); above 64 partitions the
        # expression would bloat codegen, so fall back to the join
        off_case = "CASE " + " ".join(
            f"WHEN pid = {pid} THEN {off}L" for pid, off in offs
        ) + " END"
        binned = rows.selectExpr(col, f"{off_case} + rn AS rank").selectExpr(
            col, f"{bucket} AS bucket"
        )
    else:
        off_df = spark.createDataFrame(offs, "pid BIGINT, off BIGINT")
        binned = (
            rows.join(F.broadcast(off_df), "pid")
            .selectExpr(col, "off + rn AS rank")
            .selectExpr(col, f"{bucket} AS bucket")
        )
    out = binned.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(col).alias("lo"),
        F.max(col).alias("hi"),
    )
    return tag_cached_deps(out, ranged)


def equidepth_histogram_oracle_sql(table: str, col: str, buckets: int = 10) -> str:
    return (
        f"WITH b AS (SELECT {col}, ntile({buckets}) OVER (ORDER BY {col} ASC) AS bucket "
        f"FROM {table}) "
        f"SELECT bucket, count(*) AS n, min({col}) AS lo, max({col}) AS hi "
        "FROM b GROUP BY bucket"
    )


def _equiwidth_bucket_sql(col: str, buckets: int) -> str:
    """Bucket expression shared VERBATIM by both engines: all-double
    arithmetic (identical op order = identical IEEE results), LEAST
    clamp puts the max value in the last bucket instead of its own."""
    v, mn, mx = f"CAST({col} AS DOUBLE)", "CAST(mn AS DOUBLE)", "CAST(mx AS DOUBLE)"
    # coalesce: an all-equal column (mx == mn -> NULL width) lands in
    # bucket 0 by convention, not in whatever LEAST's null-skipping
    # would pick
    return (
        f"CAST(LEAST({buckets} - 1, coalesce(CAST(floor(({v} - {mn}) * {buckets} "
        f"/ nullif({mx} - {mn}, 0.0)) AS INT), 0)) AS INT)"
    )


def equiwidth_histogram(df: DataFrame, col: str, buckets: int = 10) -> DataFrame:
    """Equi-WIDTH histogram: ``buckets`` equal value-range bins between
    the column's min and max — (bucket, n, lo, hi) with lo/hi the
    bucket's observed extremes.  The shape profile beside
    :func:`equidepth_histogram`'s quantile view: equi-depth shows
    WHERE the mass is, equi-width shows HOW it is distributed (a
    heavy tail is ONE overfull first bin here and compressed top
    buckets there).  Degenerate all-equal columns land in bucket 0.

    Scale shape: one min/max aggregate (two scalars), broadcast onto
    the scan (1-row broadcast nested-loop — never a shuffle), then ONE
    hash aggregate on the bucket id with map-side combine.  The bucket
    arithmetic is the same all-double expression text in both engines.

    NULL values are EXCLUDED (matching the rest of the profile/sketch
    family) — without the filter, the degenerate-case coalesce(...,0)
    in the bucket expression would silently count NULL rows into
    bucket 0 while lo/hi ignored them.
    """
    stats = df.selectExpr(f"min({col}) AS mn", f"max({col}) AS mx")
    return (
        df.where(F.col(col).isNotNull())
        .join(F.broadcast(stats))
        .selectExpr(f"{_equiwidth_bucket_sql(col, buckets)} AS bucket", col)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(f"min({col})").alias("lo"),
            F.expr(f"max({col})").alias("hi"),
        )
    )


def equiwidth_histogram_oracle_sql(table: str, col: str, buckets: int = 10) -> str:
    return (
        f"WITH stats AS (SELECT min({col}) AS mn, max({col}) AS mx FROM {table}), "
        f"binned AS (SELECT {_equiwidth_bucket_sql(col, buckets)} AS bucket, {col} "
        f"FROM {table}, stats WHERE {col} IS NOT NULL) "
        f"SELECT bucket, CAST(count(*) AS BIGINT) AS n, "
        f"min({col}) AS lo, max({col}) AS hi FROM binned GROUP BY bucket"
    )
