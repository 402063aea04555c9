"""Storage maintenance: targeted delete and small-file compaction.

Beyond-reference extension of the storage side (the reference never
writes data — ``verify.go`` only reads; same §1.4 argument as
``sources/zorder.py``): a 100 TB corpus is not append-only in practice.
Two maintenance operations dominate real deployments, and both have the
same scale invariant — **touch only the files that need touching**:

- :func:`targeted_delete` — the right-to-be-forgotten / takedown path:
  remove a driver-sized id set from a huge table.  A naive
  ``filter().write`` rewrites 100 TB to delete a thousand rows; this
  prunes candidate files from parquet footer min/max statistics of the
  id column (the same stats Z-order clustering sharpens — a zordered or
  id-sorted layout makes the affected set tiny), rewrites ONLY those
  files, and leaves every other byte physically untouched.
- :func:`compact_small_files` — the small-file problem: streaming
  ingests and incremental splices accrete kilobyte files whose per-file
  open/footer cost eventually dominates scans.  Compaction rewrites
  only the sub-threshold files into right-sized ones; big files are
  never read.

Both stage their rewrite into a fresh generation directory under the
table path and publish it with a manifest commit
(:mod:`pgverify_spark.sources.manifest`): readers resolve the file set
through the manifest, the commit is one atomic file creation, and
replaced files survive one further commit before GC — a reader racing
maintenance never sees a half-deleted table, a missing row, or a
vanished file.  A crash mid-maintenance leaves the original state
committed plus an unreferenced staging dir.  Pre-manifest (legacy
flat) tables are absorbed by a bootstrap commit on first touch.

Footer statistics are read with pyarrow on the driver — O(files)
metadata reads, the same planning cost any OPTIMIZE/VACUUM
implementation pays; paths are local-filesystem here (swap in an
fsspec filesystem for object stores).

After a delete, incremental verification composes:
``fingerprint.update_fingerprint_snapshot`` re-fingerprints exactly the
partitions the delete touched and ``verify_against_snapshot`` proves
every other partition bit-unchanged — deletion with an audit trail.
"""

from __future__ import annotations

import os
from bisect import bisect_left

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _hadoop(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, hpath.getFileSystem(spark._jsc.hadoopConfiguration())


def list_data_files(path: str) -> list[tuple[str, int]]:
    """(absolute path, bytes) for every parquet data file in ``path``."""
    out = []
    for f in sorted(os.listdir(path)):
        if f.endswith(".parquet") or (
            f.startswith("part-") and not f.endswith((".crc", "_SUCCESS"))
        ):
            p = os.path.join(path, f)
            if os.path.isfile(p):
                out.append((p, os.path.getsize(p)))
    return out


def _table_files(spark: SparkSession | None, path: str) -> list[tuple[str, int]]:
    """The table's current data files: manifest-resolved when ``path``
    carries one (so maintenance sees exactly the committed file set,
    not superseded generations awaiting GC), plain listing otherwise."""
    if spark is not None:
        from pgverify_spark.sources import manifest

        resolved = manifest.data_files(spark, path)
        if resolved is not None:
            return resolved
    return list_data_files(path)


def files_possibly_containing(
    path: str,
    id_col: str,
    ids: list[int],
    spark: SparkSession | None = None,
) -> tuple[list[str], int]:
    """Footer-stats candidate set: the files whose ``id_col`` min/max
    envelope contains at least one target id (a file with no stats is
    conservatively a candidate).  Returns (candidates, total files)."""
    import pyarrow.parquet as pq

    sids = sorted(set(ids))
    cands, total = [], 0
    for fpath, _ in _table_files(spark, path):
        total += 1
        lo = hi = None
        md = pq.ParquetFile(fpath).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        if id_col not in names:
            raise ValueError(f"{fpath} has no column {id_col!r}")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(names[id_col]).statistics
            if st is None or st.min is None:
                lo = None
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is None:
            cands.append(fpath)  # no stats: must assume affected
            continue
        i = bisect_left(sids, lo)
        if i < len(sids) and sids[i] <= hi:
            cands.append(fpath)
    return cands, total


def _commit_rewrite(
    spark: SparkSession,
    path: str,
    gen: str,
    replaced: list[str],
    schema_json: str | None = None,
) -> None:
    """Publish a maintenance rewrite: the current committed file set
    minus ``replaced`` (absolute paths) plus the staged generation's
    files, committed at FILE granularity so later maintenance can
    replace any subset regardless of which generation owns it.  A
    legacy (manifest-less) table gets a bootstrap commit first so its
    replaced files enter the GC lifecycle instead of lingering.

    FLAT-LAYOUT tables only (the corpus shape both callers target):
    file-level entries carry no partition-directory component, so a
    hive-partitioned table maintained here would lose its partition
    column on read — the day-partitioned snapshot states keep their
    own directory-level committers in ``operators/rollup.py``."""
    from pgverify_spark.sources import manifest

    if manifest.current_entries(spark, path) is None:
        # bootstrap_entries excludes ALL generation dirs — both `gen`
        # (just staged, committed below) and any crash debris
        manifest.commit(spark, path, manifest.bootstrap_entries(spark, path))
    base = path.rstrip("/")
    dropped = {f.rstrip("/") for f in replaced}
    kept = [
        f[len(base) + 1:]
        for f, _ in manifest.data_files(spark, path)
        if f.rstrip("/") not in dropped
    ]
    staged = [f"{gen}/{os.path.basename(f)}" for f, _ in list_data_files(f"{base}/{gen}")]
    manifest.commit(spark, path, kept + staged, schema_json=schema_json)


def targeted_delete(
    spark: SparkSession, path: str, ids: list[int], id_col: str
) -> dict:
    """Delete the rows whose ``id_col`` is in ``ids`` from the parquet
    directory ``path``, rewriting ONLY the files whose footer statistics
    admit a match.  ``ids`` is driver-sized by nature (a takedown list,
    not a table — pass an anti-join pipeline for table-sized deletes);
    the corpus-side I/O is the affected files only.

    Returns ``{"files_total", "files_rewritten", "rows_deleted"}``.
    Idempotent: a second run with the same ids finds the ids gone and
    rewrites the (already-clean) candidate files to the same content.
    The rewrite publishes through a manifest commit — read the table
    back with :func:`pgverify_spark.sources.manifest.read_state`.
    """
    cands, total = files_possibly_containing(path, id_col, ids, spark)
    if not cands:
        return {"files_total": total, "files_rewritten": 0, "rows_deleted": 0}
    from pgverify_spark.sources import manifest

    sub = spark.read.parquet(*cands)
    id_df = F.broadcast(
        spark.createDataFrame([(int(i),) for i in ids], f"{id_col} BIGINT")
    )
    kept = sub.join(id_df, id_col, "left_anti")
    n_before = sub.count()
    gen = manifest.new_generation()
    staging = f"{path.rstrip('/')}/{gen}"
    kept.write.parquet(staging)
    n_after = spark.read.parquet(staging).count()
    _commit_rewrite(
        spark, path, gen, cands,
        schema_json=manifest.read_back_schema(kept),
    )
    return {
        "files_total": total,
        "files_rewritten": len(cands),
        "rows_deleted": n_before - n_after,
    }


def generation_diff(
    spark: SparkSession, path: str, schema, config=None
) -> "DataFrame":
    """Audit the LAST maintenance commit: the multiset row diff between
    the previous committed state and the current one — for a
    ``targeted_delete`` exactly the removed rows (status ``only_left``),
    for :func:`compact_small_files` exactly EMPTY (content-preserving
    by contract), with no pre-write snapshot needed: the manifest's GC
    grace window guarantees the previous generation's files survive
    until the commit after next, so the audit is always possible for
    one window after any write.

    Scale shape: one :func:`~pgverify_spark.operators.diff.row_diff`
    between the two states — O(distinct rows) shuffle of (key, hash)
    pairs, DIFF-sized output.  Raises ``ValueError`` when ``path`` has
    fewer than two commits (nothing to audit)."""
    from pgverify_spark.operators.diff import row_diff
    from pgverify_spark.sources import manifest

    nums = manifest.manifest_numbers(spark, path)
    if len(nums) < 2:
        raise ValueError(
            f"generation_diff: {path!r} has {len(nums)} manifest commit(s); "
            "need two (the previous generation to audit against)"
        )
    prev = manifest.read_state(spark, path, nums[-2])
    cur = manifest.read_state(spark, path, nums[-1])
    return row_diff(prev, cur, schema, config)


def compact_small_files(
    spark: SparkSession,
    path: str,
    small_bytes: int = 32 * 1024 * 1024,
    target_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite the data files smaller than ``small_bytes`` into
    ~``target_bytes`` files; files already right-sized are never read.
    Publishes through the same manifest commit as
    :func:`targeted_delete`.  Returns ``{"files_total",
    "files_compacted", "files_written"}``."""
    from pgverify_spark.sources import manifest

    files = _table_files(spark, path)
    small = [(f, sz) for f, sz in files if sz < small_bytes]
    if len(small) < 2:
        return {
            "files_total": len(files),
            "files_compacted": 0,
            "files_written": 0,
        }
    n_out = max(1, -(-sum(sz for _, sz in small) // target_bytes))
    gen = manifest.new_generation()
    staging = f"{path.rstrip('/')}/{gen}"
    staged_df = spark.read.parquet(*[f for f, _ in small]).coalesce(n_out)
    staged_df.write.parquet(staging)
    written = len(list_data_files(staging))
    _commit_rewrite(
        spark, path, gen, [f for f, _ in small],
        schema_json=manifest.read_back_schema(staged_df),
    )
    return {
        "files_total": len(files),
        "files_compacted": len(small),
        "files_written": written,
    }
