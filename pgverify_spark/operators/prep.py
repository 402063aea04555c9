"""Training-data preparation: chunking, sequence packing, dataset splits.

Beyond-reference extensions — the last mile of an LLM data pipeline,
after dedup/quality/decontamination have pruned the corpus:

- :func:`chunk_documents` — fixed-width character windows with overlap
  (the retrieval/embedding chunking everyone runs).  Pure per-row
  ``transform(sequence(...))`` + ``posexplode`` — embarrassingly
  parallel, no shuffle; output size is the only cost.
- :func:`pack_sequences` — concatenate-and-cut packing: documents are
  laid end-to-end in deterministic (source, doc_id) order and cut into
  fixed token budgets — how pretraining batches are actually formed.
  A document's bin is where its *first* token lands.  The running
  total is a window sum **partitioned by source**: each shard packs
  independently and in parallel (the practical formulation at 100 TB —
  a single global order would serialize; per-shard packing is what
  data loaders do anyway).
- :func:`hash_split` — deterministic train/val/test assignment from an
  md5 bucket of the document id: reproducible, join-free, and stable
  under corpus growth (a doc's split never changes when others are
  added — the property random sampling lacks).

All three stay in exact integer arithmetic (character offsets, token
counts, hash buckets), so every row hash-matches the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pgverify_spark.functions.canonical import (
    DIALECT_DUCKDB,
    DIALECT_SPARK,
    hex_prefix_int_sql,
)


def _n_chunks(len_expr: str, stride: int) -> str:
    """Chunk count: ceil(max(len - overlap, 1) / stride) in integer math
    — identical text in both dialects."""
    return f"CAST((greatest({len_expr}, 1) + {stride - 1}) DIV {stride} AS INT)"


def chunk_documents(df: DataFrame, chunk_chars: int = 200, overlap: int = 20) -> DataFrame:
    """(doc_id, chunk_idx, chunk): sliding windows of ``chunk_chars``
    stepping ``chunk_chars - overlap``; the final window may be short;
    a doc shorter than one window yields exactly one chunk."""
    stride = chunk_chars - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_chars")
    n = _n_chunks(f"length(text) - {overlap}", stride)
    return df.selectExpr(
        "doc_id",
        f"posexplode(transform(sequence(0, {n} - 1), "
        f"i -> substr(text, i * {stride} + 1, {chunk_chars}))) AS (chunk_idx, chunk)",
    )


def chunk_documents_oracle_sql(table: str, chunk_chars: int = 200, overlap: int = 20) -> str:
    stride = chunk_chars - overlap
    n = _n_chunks(f"length(text) - {overlap}", stride).replace(" DIV ", " // ")
    return (
        f"WITH g AS (SELECT doc_id, text, "
        f"unnest(generate_series(0, CAST({n} AS BIGINT) - 1)) AS i FROM {table}) "
        "SELECT doc_id, CAST(i AS INT) AS chunk_idx, "
        f"substr(text, CAST(i * {stride} + 1 AS INT), {chunk_chars}) AS chunk FROM g"
    )


def pack_sequences(df: DataFrame, budget_tokens: int = 512) -> DataFrame:
    """Per-source concat-and-cut packing report: (source, bin, n_docs,
    bin_tokens) — ``bin`` is where each doc's first token lands when the
    source's docs are laid end-to-end in doc_id order and cut every
    ``budget_tokens``."""
    from pyspark.sql.window import Window

    toks = df.selectExpr(
        "source",
        "doc_id",
        "CAST(size(split(trim(text), '\\\\s+')) AS BIGINT) AS n_tokens",
    )
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    binned = toks.withColumn("cum", F.sum("n_tokens").over(w)).selectExpr(
        "source",
        "doc_id",
        "n_tokens",
        f"CAST((cum - n_tokens) DIV {budget_tokens} AS BIGINT) AS bin",
    )
    return binned.groupBy("source", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("bin_tokens"),
    )


def pack_sequences_oracle_sql(table: str, budget_tokens: int = 512) -> str:
    return (
        "WITH t AS (SELECT source, doc_id, "
        "CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens "
        f"FROM {table}), "
        "c AS (SELECT source, doc_id, n_tokens, "
        "sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t) "
        f"SELECT source, CAST((cum - n_tokens) // {budget_tokens} AS BIGINT) AS bin, "
        "count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens "
        "FROM c GROUP BY source, CAST((cum - n_tokens) // {b} AS BIGINT)".replace(
            "{b}", str(budget_tokens)
        )
    )


#: Token-count expression shared by the packing/split/shard operators
#: (and the curate-corpus funnel report, registry.py) — both dialects,
#: one source so the twins cannot drift.
_TOKENS = "CAST(size(split(trim(text), '\\\\s+')) AS BIGINT)"
_TOKENS_DUCK = "CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)"


def assign_shards(df: DataFrame, n_shards: int = 8) -> DataFrame:
    """Token-balanced shard assignment: (doc_id, n_tokens, shard) with
    ``shard = (global_rank_by_size - 1) % n_shards`` — documents dealt
    round-robin in descending size order (the LPT heuristic), so every
    shard's token total lands within one max-document of the mean.  This
    is the write-side step of corpus assembly: balanced shards mean no
    straggler data-loader worker.

    The interesting part is HOW the global rank is computed at scale.
    The naive ``row_number() OVER (ORDER BY n_tokens DESC)`` collapses
    the table onto ONE reducer (Spark plans a SinglePartition window) —
    a non-starter at 100 TB.  Instead, the classic two-pass distributed
    rank:

    1. ``repartitionByRange`` on (n_tokens DESC, doc_id) — a range
       shuffle, the same machinery as a distributed sort; partition i
       holds rows strictly ordering before partition i+1.
    2. A tiny count-per-partition job (one BIGINT per partition crosses
       the cluster) produces cumulative offsets.
    3. ``row_number`` windowed WITHIN each range partition (parallel,
       spill-safe) plus the partition's offset = exact global rank.

    The offsets collect is O(partitions) driver traffic — the same order
    of metadata Spark's own RangePartitioner already samples.  Range
    boundaries are deterministic for a given input (seeded sketch), so
    the offset job and the final plan see identical partitioning.  At
    cluster scale, persist the input once across the two passes.
    """
    sized = df.selectExpr("doc_id", f"{_TOKENS} AS n_tokens")
    n_parts = int(sized.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = sized.repartitionByRange(
        n_parts, F.col("n_tokens").desc(), F.col("doc_id")
    )
    counts = dict(
        ranged.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .collect()
    )
    offsets, acc = {}, 0
    for pid in range(n_parts):
        offsets[pid] = acc
        acc += counts.get(pid, 0)
    offset_expr = "CASE " + " ".join(
        f"WHEN pid = {pid} THEN CAST({off} AS BIGINT)" for pid, off in offsets.items()
    ) + " END"

    from pyspark.sql.window import Window

    w = Window.partitionBy("pid").orderBy(F.col("n_tokens").desc(), F.col("doc_id"))
    return (
        ranged.withColumn("pid", F.spark_partition_id())
        .withColumn("rn", F.row_number().over(w))
        .selectExpr(
            "doc_id",
            "n_tokens",
            f"CAST(({offset_expr} + rn - 1) % {n_shards} AS BIGINT) AS shard",
        )
    )


def assign_shards_oracle_sql(table: str, n_shards: int = 8) -> str:
    """DuckDB twin: the plain global row_number the two-pass plan equals."""
    return (
        f"WITH t AS (SELECT doc_id, "
        "CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens "
        f"FROM {table}), "
        "r AS (SELECT doc_id, n_tokens, "
        "row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS rn FROM t) "
        f"SELECT doc_id, n_tokens, CAST((rn - 1) % {n_shards} AS BIGINT) AS shard FROM r"
    )


def shard_manifest(
    df: DataFrame, n_shards: int = 8, assignment: DataFrame | None = None
) -> DataFrame:
    """Per-shard delivery manifest: (shard, n_docs, n_tokens, fp) over
    :func:`assign_shards`' token-balanced assignment — the contract a
    training-data CONSUMER verifies before trusting a shard set (the
    verify-engine DNA applied to the prep output: a manifest row is a
    per-shard additive fingerprint, so a dropped/duplicated/corrupted
    document in any shard changes that shard's ``fp``).

    ``fp`` is the additive ``count:sum(h48) mod 2^61-1`` form over the
    48-bit md5 prefix of each document's text — order-insensitive, so
    the consumer can recompute it with any read parallelism
    (:func:`verify_shard_manifest`).  Scale shape: assign_shards' two-
    pass rank + ONE doc_id equi-join carrying (id, hv) pairs only + a
    map-side-combined shard aggregate; the text is hashed in the scan
    projection and never shuffled.
    """
    from pgverify_spark.operators.fingerprint import ADDITIVE_MOD

    shards = assign_shards(df, n_shards) if assignment is None else assignment
    h48 = hex_prefix_int_sql("md5(text)", DIALECT_SPARK)
    hashed = df.selectExpr("doc_id", f"CAST({h48} AS DECIMAL(38,0)) AS hv")
    return (
        shards.join(hashed, "doc_id")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr("CAST(sum(n_tokens) AS BIGINT)").alias("n_tokens"),
            F.expr(
                "concat_ws(':', CAST(count(1) AS STRING), "
                f"CAST(CAST(sum(hv) % {ADDITIVE_MOD} AS DECIMAL(38,0)) AS STRING))"
            ).alias("fp"),
        )
    )


def shard_manifest_oracle_sql(table: str, n_shards: int = 8) -> str:
    from pgverify_spark.functions.canonical import DIALECT_DUCKDB
    from pgverify_spark.operators.fingerprint import ADDITIVE_MOD

    h48 = hex_prefix_int_sql("md5(text)", DIALECT_DUCKDB)
    return (
        f"WITH s AS ({assign_shards_oracle_sql(table, n_shards)}), "
        f"h AS (SELECT doc_id, CAST({h48} AS DECIMAL(38,0)) AS hv FROM {table}) "
        "SELECT shard, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n_tokens) AS BIGINT) AS n_tokens, "
        "concat_ws(':', CAST(count(*) AS STRING), "
        f"CAST(CAST(sum(hv) % {ADDITIVE_MOD} AS DECIMAL(38,0)) AS STRING)) AS fp "
        "FROM s JOIN h USING (doc_id) GROUP BY shard"
    )


def write_shards(df: DataFrame, path: str, n_shards: int = 8) -> DataFrame:
    """Materialize the corpus as ``shard=<k>`` parquet directories plus
    the manifest at ``<path>/_manifest`` — the delivery artifact pair.
    Returns the manifest."""
    shards = assign_shards(df, n_shards).persist()
    (
        df.join(shards.select("doc_id", "shard"), "doc_id")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )
    # reuse the SAME materialized assignment for the manifest: one
    # token-rank pass total, and the manifest provably describes the
    # assignment the data write used
    manifest = shard_manifest(df, n_shards, assignment=shards)
    manifest.write.mode("overwrite").parquet(f"{path}/_manifest")
    shards.unpersist()
    # hand back the artifact just written: a caller action on the
    # return value reads parquet instead of re-running the unpersisted
    # rank+join plan from scratch
    return df.sparkSession.read.parquet(f"{path}/_manifest")


def verify_shard_manifest(spark, path: str) -> DataFrame:
    """Consumer-side check of a :func:`write_shards` artifact: recompute
    each shard's (n_docs, fp) from the shard files and diff against the
    stored manifest.  Returns the mismatching shards (empty = the
    delivery is intact); the additive form makes the recompute one
    shuffle-free aggregate pass at any read parallelism."""
    from pgverify_spark.operators.fingerprint import ADDITIVE_MOD

    h48 = hex_prefix_int_sql("md5(text)", DIALECT_SPARK)
    got = (
        spark.read.parquet(path)
        .selectExpr("shard", f"CAST({h48} AS DECIMAL(38,0)) AS hv")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("got_docs"),
            F.expr(
                "concat_ws(':', CAST(count(1) AS STRING), "
                f"CAST(CAST(sum(hv) % {ADDITIVE_MOD} AS DECIMAL(38,0)) AS STRING))"
            ).alias("got_fp"),
        )
    )
    want = spark.read.parquet(f"{path}/_manifest").select(
        "shard", F.col("n_docs").alias("want_docs"), F.col("fp").alias("want_fp")
    )
    return (
        want.join(got, "shard", "full_outer")
        .filter(
            "got_fp IS NULL OR want_fp IS NULL OR got_fp <> want_fp "
            "OR got_docs <> want_docs"
        )
        .select("shard", "want_docs", "got_docs", "want_fp", "got_fp")
    )


#: (split name, per-mille weight) — weights must sum to 1000.
DEFAULT_SPLITS = (("train", 900), ("val", 50), ("test", 50))


def split_assign_exprs(
    dialect: str,
    key: str = "doc_id",
    splits: tuple[tuple[str, int], ...] = DEFAULT_SPLITS,
) -> tuple[str, str]:
    """(bucket_expr, case_expr) — the md5(key)-mod-1000 bucket and the
    cumulative-weight CASE mapping buckets to split names.  The shared
    core of :func:`hash_split` / :func:`leakage_safe_split` (both
    dialects) and the curate-corpus cluster-pass elision (registry.py),
    kept in ONE place so the Spark/DuckDB twins cannot drift.  The CASE
    expects the bucket aliased as ``b`` in scope."""
    if sum(wt for _, wt in splits) != 1000:
        raise ValueError("split weights must sum to 1000 (per-mille)")
    cast = "STRING" if dialect == DIALECT_SPARK else "VARCHAR"
    h = hex_prefix_int_sql(f"md5(CAST({key} AS {cast}))", dialect, 12)
    case, lo = [], 0
    for name, wt in splits:
        case.append(f"WHEN b < {lo + wt} THEN '{name}'")
        lo += wt
    return f"{h} % 1000", f"CASE {' '.join(case)} END"


def hash_split(
    df: DataFrame, splits: tuple[tuple[str, int], ...] = DEFAULT_SPLITS
) -> DataFrame:
    """Deterministic split assignment summary: (split, n_docs, n_tokens).

    A doc's bucket is its id-hash mod 1000; cumulative weight ranges map
    buckets to splits.  Assignment depends only on the doc's own id —
    stable under corpus growth and engine-independent.
    """
    bucket, expr = split_assign_exprs(DIALECT_SPARK)
    return (
        df.selectExpr(
            f"{bucket} AS b",
            "CAST(size(split(trim(text), '\\\\s+')) AS BIGINT) AS n_tokens",
        )
        .selectExpr(f"{expr} AS split", "n_tokens")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").cast("long").alias("n_tokens"))
    )


def hash_split_oracle_sql(
    table: str, splits: tuple[tuple[str, int], ...] = DEFAULT_SPLITS
) -> str:
    bucket, expr = split_assign_exprs(DIALECT_DUCKDB)
    return (
        f"WITH t AS (SELECT {bucket} AS b, "
        "CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens "
        f"FROM {table}) "
        f"SELECT {expr} AS split, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens "
        f"FROM t GROUP BY {expr}"
    )


def curriculum_pack(
    df: DataFrame, budget_tokens: int = 512, max_bucket: int = 3
) -> DataFrame:
    """Quality-curriculum packing: documents bucketed by their Gopher
    fail count (bucket 0 = passes every rule, ..., ``max_bucket`` =
    that many or more failures), then concat-and-cut packed within
    each bucket — so a curriculum schedule can feed the cleanest bins
    first and the noisiest last, each bucket packed exactly like
    :func:`pack_sequences`.

    Output: (bucket, bin, n_docs, bin_tokens) — ``bin`` is where each
    document's first token lands when its bucket's docs are laid
    end-to-end in doc_id order and cut every ``budget_tokens``.

    Scale shape: the gate is the fused single-pass projection it always
    is; the join back to token counts is a doc_id equi-join (bucketable
    at scale); the running total windows per bucket — a handful of
    partitions, each internally ordered, same parallelism story as
    per-source packing.  All integer arithmetic, oracle-exact.
    """
    from pyspark.sql.window import Window

    from pgverify_spark.operators.text import gopher_gate

    gate = gopher_gate(df).selectExpr(
        "doc_id", f"CAST(least(n_fail, {max_bucket}) AS INT) AS bucket"
    )
    toks = df.selectExpr("doc_id", f"{_TOKENS} AS n_tokens")
    w = Window.partitionBy("bucket").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    binned = (
        toks.join(gate, "doc_id")
        .withColumn("cum", F.sum("n_tokens").over(w))
        .selectExpr(
            "bucket",
            "n_tokens",
            f"CAST((cum - n_tokens) DIV {budget_tokens} AS BIGINT) AS bin",
        )
    )
    return binned.groupBy("bucket", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("bin_tokens"),
    )


def curriculum_pack_oracle_sql(
    table: str, budget_tokens: int = 512, max_bucket: int = 3
) -> str:
    from pgverify_spark.operators.text import gopher_gate_oracle_sql

    gate = gopher_gate_oracle_sql(table)
    return (
        f"WITH g AS (SELECT doc_id, CAST(least(n_fail, {max_bucket}) AS INT) AS bucket "
        f"FROM ({gate}) gg), "
        "t AS (SELECT doc_id, "
        "CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens "
        f"FROM {table}), "
        "j AS (SELECT g.bucket, t.doc_id, t.n_tokens FROM t JOIN g ON t.doc_id = g.doc_id), "
        "c AS (SELECT bucket, n_tokens, "
        "sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM j) "
        f"SELECT bucket, CAST((cum - n_tokens) // {budget_tokens} AS BIGINT) AS bin, "
        "count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens "
        "FROM c GROUP BY bucket, CAST((cum - n_tokens) // "
        f"{budget_tokens} AS BIGINT)"
    )


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    splits: tuple[tuple[str, int], ...] = DEFAULT_SPLITS,
    max_iterations: int = 20,
) -> DataFrame:
    """Train/val/test assignment that cannot leak near-duplicates
    across splits: every member of a near-dup CLUSTER receives the same
    split, because the split hash is computed on the cluster
    representative (the cluster id for paired docs, the doc's own id
    otherwise).  Plain :func:`hash_split` puts a doc and its
    near-duplicate on opposite sides of the train/val boundary with
    probability 2·p·(1-p) — silent eval contamination.

    Input: the corpus plus near-dup ``pairs`` from any pair operator
    (MinHash-LSH, SimHash, semantic).  Output: (doc_id, split_key,
    split) — one row per document.

    Scale shape: clustering runs over only the PAIRED docs
    (dedup.dup_clusters, ids-only shuffles); the corpus takes one
    doc_id equi-join against that cluster relation (broadcastable when
    the dup rate is low, which it always is post-dedup) and a pure
    hash projection.  Assignment is stable under corpus growth for
    unpaired docs (depends on their own id) and changes for a doc only
    when its cluster membership changes — the correct invalidation.
    """
    from pgverify_spark.operators.dedup import dup_clusters

    # validate the weights BEFORE the iterative cluster pass — the
    # expression builder raises on bad splits, and dup_clusters runs
    # eager driver-side jobs that would all be wasted work
    bucket, case = split_assign_exprs(DIALECT_SPARK, key="split_key", splits=splits)
    clusters = dup_clusters(pairs, max_iterations)
    keyed = (
        df.select("doc_id")
        .join(clusters, "doc_id", "left")
        .selectExpr("doc_id", "coalesce(cluster_id, doc_id) AS split_key")
    )
    return keyed.selectExpr("doc_id", "split_key", f"{bucket} AS b").selectExpr(
        "doc_id", "split_key", f"{case} AS split"
    )


def leakage_safe_split_oracle_sql(
    table: str,
    pairs_sql: str,
    splits: tuple[tuple[str, int], ...] = DEFAULT_SPLITS,
) -> str:
    from pgverify_spark.operators.dedup import dup_clusters_oracle_sql

    clusters = dup_clusters_oracle_sql(pairs_sql)
    bucket, case = split_assign_exprs(DIALECT_DUCKDB, key="split_key", splits=splits)
    return (
        f"WITH cl AS ({clusters}), "
        f"keyed AS (SELECT t.doc_id, coalesce(cl.cluster_id, t.doc_id) AS split_key "
        f"FROM {table} t LEFT JOIN cl ON t.doc_id = cl.doc_id), "
        f"b AS (SELECT doc_id, split_key, {bucket} AS b FROM keyed) "
        f"SELECT doc_id, split_key, {case} AS split FROM b"
    )
