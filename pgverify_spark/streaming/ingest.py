"""Streaming parquet ingest with replay-idempotent batches and
sealed-batch compaction — the sink-hygiene loop.

Beyond-reference extension (the reference is batch-only and never
writes; SURVEY.md §1.4): a continuously-ingesting table accretes one
parquet file per task per trigger, and within days a 100 TB table's
scan cost is dominated by file-open/footer overhead instead of bytes.
Table formats (Delta/Iceberg) solve this with a transaction log +
OPTIMIZE; this module is the plain-parquet construction of the same
two guarantees:

1. **Replay idempotence** (:func:`streaming_ingest`): each micro-batch
   lands in its own ``batch_id=<N>`` partition directory via dynamic
   partition overwrite, so a foreachBatch replay after a failure
   overwrites the same directory instead of appending duplicates —
   the standard exactly-once-by-idempotence recipe.
2. **Compaction that cannot race replay** (:func:`seal_and_compact`):
   Structured Streaming never re-runs a batch id that is committed to
   the checkpoint, so any batch directory with id strictly below the
   newest committed id is SEALED — immutable forever.  Compaction
   merges only sealed directories into a negative-id generation
   directory (``batch_id=-<G>``, a namespace no real batch can ever
   collide with) and removes them; a replay of the one possibly
   -uncommitted batch still lands in its own positive-id directory.
   Run it from the foreachBatch hook (every K batches) or as a
   side-car maintenance job — both safe under the sealed rule.

Readers see one logical table the whole time:
:func:`read_ingested` = ``spark.read.parquet(store)`` minus the layout
column, whatever mix of raw and compacted generations exists.

Scale shape: ingest writes only the trigger's own rows; compaction
reads only sealed small files (``maintain``-style size planning) and
never touches a generation that is already right-sized.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgverify_spark.sources.maintain import list_data_files


def streaming_ingest(sdf: DataFrame, store_path: str):
    """foreachBatch sink writing each micro-batch to its own
    ``batch_id=<N>`` partition with dynamic overwrite (replay-
    idempotent).  Returns a configured ``writeStream`` — caller sets
    the checkpoint and calls ``start()``."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(int(batch_id)))
            .write.option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .partitionBy("batch_id")
            .parquet(store_path)
        )

    return sdf.writeStream.foreachBatch(sink).outputMode("append")


def read_ingested(spark: SparkSession, store_path: str) -> DataFrame:
    """The ingested table, generation layout hidden."""
    return spark.read.parquet(store_path).drop("batch_id")


def _batch_dirs(store_path: str) -> dict[int, str]:
    out = {}
    for d in os.listdir(store_path):
        if d.startswith("batch_id=") and os.path.isdir(os.path.join(store_path, d)):
            out[int(d.split("=", 1)[1])] = os.path.join(store_path, d)
    return out


def _covers_upto(spark: SparkSession, gen_dir: str) -> int:
    """The ``_covers_upto_<N>`` marker inside a generation directory
    (0 when absent — pre-marker generations recover nothing)."""
    from pgverify_spark.sources.maintain import _hadoop

    jvm, fs = _hadoop(spark, gen_dir)
    best = 0
    for st in fs.listStatus(jvm.org.apache.hadoop.fs.Path(gen_dir)):
        name = st.getPath().getName()
        if name.startswith("_covers_upto_"):
            best = max(best, int(name.rsplit("_", 1)[1]))
    return best


def _recover_interrupted_compaction(spark: SparkSession, store_path: str) -> int:
    """Finish the delete half of any compaction that crashed between
    the generation rename and the sealed-directory drops: each
    generation carries a ``_covers_upto_<N>`` marker (underscore files
    are invisible to parquet readers), asserting that every positive
    batch id below N existed at compaction time and was absorbed —
    batch ids are monotone and never reused, so a positive directory
    with id < N can only be a not-yet-deleted duplicate.  Delete it.
    Returns directories removed."""
    from pgverify_spark.sources.maintain import _hadoop

    jvm, fs = _hadoop(spark, store_path)
    dirs = _batch_dirs(store_path)
    threshold = max(
        [0] + [_covers_upto(spark, d) for n, d in dirs.items() if n < 0]
    )
    removed = 0
    for n, d in dirs.items():
        if 0 <= n < threshold:
            fs.delete(jvm.org.apache.hadoop.fs.Path(d), True)
            removed += 1
    return removed


def seal_and_compact(
    spark: SparkSession,
    store_path: str,
    upto_exclusive: int,
    target_bytes: int = 128 * 1024 * 1024,
    transform=None,
) -> dict:
    """Merge every SEALED batch directory (``0 <= batch_id <
    upto_exclusive`` — pass the newest checkpoint-committed id; those
    can never replay) into one new ``batch_id=-<G>`` generation, then
    drop the sealed directories.  Existing negative generations are
    left alone (they are already compacted; re-compacting generations
    into each other is a separate, equally-safe invocation with the
    same rule — they are immutable too).

    Crash discipline: the generation is built in a STAGING directory
    beside the store (readers never see a half-written generation) and
    renamed in with a ``_covers_upto_<N>`` marker recording the seal
    horizon; every entry first runs recovery, which deletes any sealed dir
    still present but covered by an existing generation.  So a crash
    at ANY point leaves either (a) no visible change (staging orphan,
    cleaned by the next overwrite), or (b) transient duplicates that
    the next invocation removes BEFORE compacting further — never
    permanent duplication.  The rename→deletes window itself is the
    same reader-visible non-atomicity every plain-parquet INSERT
    OVERWRITE has; a transactional format is the answer where readers
    race maintenance.

    Returns ``{"batches_sealed", "files_before", "files_after",
    "recovered_dirs"}``; a no-op when fewer than two sealed
    directories exist.

    ``transform`` (optional) maps the merged DataFrame before it is
    written — for compactions that are allowed to DROP rows provably
    dead to every future read (e.g. the capped sample store's per-day
    KMV trim, where a row outside its day's bottom-k over the sealed
    set can never re-enter any bottom-k of a superset).  The caller
    owns that proof; content-preserving compaction passes None.
    """
    from pgverify_spark.sources.maintain import _hadoop

    recovered = _recover_interrupted_compaction(spark, store_path)
    dirs = _batch_dirs(store_path)
    sealed = {n: d for n, d in dirs.items() if 0 <= n < upto_exclusive}
    if len(sealed) < 2:
        return {
            "batches_sealed": 0, "files_before": 0, "files_after": 0,
            "recovered_dirs": recovered,
        }
    gen = min([0] + [n for n in dirs if n < 0]) - 1
    files_before = sum(len(list_data_files(d)) for d in sealed.values())
    total_bytes = sum(
        sz for d in sealed.values() for _, sz in list_data_files(d)
    )
    n_out = max(1, -(-total_bytes // target_bytes))
    merged = spark.read.parquet(*sealed.values())
    if transform is not None:
        merged = transform(merged)
    staging = store_path.rstrip("/") + f".compact-{gen}"
    merged.coalesce(n_out).write.mode("overwrite").parquet(staging)
    jvm, fs = _hadoop(spark, store_path)
    # record only the horizon actually ABSORBED (max sealed id + 1),
    # never the caller's bound: an overstated upto_exclusive (e.g.
    # "seal everything" = a huge number) would otherwise turn the next
    # recovery pass into deletion of legitimate NEW batches below it
    absorbed_upto = min(int(upto_exclusive), max(sealed) + 1)
    covers = jvm.org.apache.hadoop.fs.Path(
        os.path.join(staging, f"_covers_upto_{absorbed_upto}")
    )
    fs.create(covers, True).close()
    out_dir = os.path.join(store_path, f"batch_id={gen}")
    if not fs.rename(
        jvm.org.apache.hadoop.fs.Path(staging),
        jvm.org.apache.hadoop.fs.Path(out_dir),
    ):
        raise IOError(f"compaction rename failed: {staging} -> {out_dir}")
    for d in sealed.values():
        # best-effort: a failed delete is exactly what recovery handles
        fs.delete(jvm.org.apache.hadoop.fs.Path(d), True)
    return {
        "batches_sealed": len(sealed),
        "files_before": files_before,
        "files_after": len(list_data_files(out_dir)),
        "recovered_dirs": recovered,
    }
