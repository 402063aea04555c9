"""Bucketed storage: pre-shuffled tables for zero-exchange joins.

The biggest repeated cost in a 100 TB verification or curation pipeline
is re-shuffling the same fact table on the same key for every join or
(k, h) aggregation.  Spark's bucketed tables move that shuffle to WRITE
time: ``bucketBy(n, key)`` hash-partitions rows into a fixed number of
bucket files per partition, and the catalog records the layout, so any
later equi-join or aggregation on the bucket key reuses the stored
partitioning — the scan itself reports ``hashpartitioning(key, n)`` and
Catalyst plans a SortMergeJoin/HashAggregate with NO Exchange on that
side.  Two tables bucketed the same way join with no shuffle at all.

This is the storage-layout half of the engine's scale story, composing
with everything else: bucket both sides of a recurring
:func:`~pgverify_spark.operators.diff.row_diff` on the PK, or a fact
table on its join key, and the per-run cost drops from
O(shuffle both tables) to O(scan).

Caveats encoded here rather than left to the caller: bucket counts must
match on both sides (Spark ≥3.1 can coalesce mismatched counts when one
divides the other, but identical is the portable contract), and the
write must go through ``saveAsTable`` — a bare ``parquet(path)`` write
loses the bucket metadata.  The ``path`` option keeps data at an
explicit location (external table) so the catalog entry is metadata
only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int,
    path: str | None = None,
    sort_by: str | list[str] | None = None,
) -> None:
    """Write ``df`` as a bucketed parquet table named ``table``.

    ``sort_by`` additionally sorts rows within each bucket file, which
    lets a later merge join skip its sort and serves range predicates
    on the sort column from row-group stats.
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *keys)
    if sort_by is not None:
        sorts = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        w = w.sortBy(*sorts)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def append_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int,
    sort_by: str | list[str] | None = None,
) -> None:
    """Append rows to an existing bucketed table, preserving its layout.

    The bucket spec must be restated and MATCH the table's (Spark
    validates and refuses a mismatched append) — new rows hash into the
    same bucket files' layout, so every zero-Exchange join property of
    the original write keeps holding over the grown table.  This is the
    incremental-maintenance half of a standing index: a write of
    O(batch), not a rewrite of O(corpus).
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode("append").format("parquet").bucketBy(n_buckets, *keys)
    if sort_by is not None:
        sorts = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        w = w.sortBy(*sorts)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its layout metadata intact
    (``spark.read.parquet(path)`` on the same files would NOT carry the
    bucket spec — the catalog does)."""
    return spark.table(table)
