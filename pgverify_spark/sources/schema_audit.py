"""Footer-only schema-drift audit over a parquet directory.

Beyond-reference extension (the reference verifies row content between
live databases, SURVEY.md §2.3; it has no file-layout tooling): a long-
lived lake table accretes files written by different pipeline versions
— a column added mid-stream, one dropped, one whose writer changed its
physical type.  Spark's ``mergeSchema`` read PAPERS OVER the drift
(absent columns read as NULL, indistinguishable from genuinely-null
data), so curation needs an explicit audit: per column, how many files
carry it and under which types.

Scale shape — the 100 TB property is that NO DATA PAGES are ever read:

- ONE directory listing produces the file inventory (the same
  listing-is-cheap premise as the incremental-verify file catalog,
  ``operators/fingerprint.py``);
- the file list parallelizes into a DataFrame and each task reads only
  its files' FOOTERS via ``pyarrow.parquet.read_schema`` inside an
  Arrow-batched ``mapInPandas`` — kilobytes per file regardless of
  file size, distributed over however many thousand files the table
  has (never a driver-side loop over footers);
- the report is a #columns-row aggregate.

``tests/test_schema_audit.py`` pins the footer-only claim the same way
the file-catalog test does: garbage bytes spliced into a file's data
pages change nothing — only footer bytes matter.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _data_files(path: str) -> list[str]:
    """One listing: absolute paths of the parquet data files under
    ``path`` (top level; partition-dir recursion one level down)."""
    out: list[str] = []
    for name in sorted(os.listdir(path)):
        full = f"{path}/{name}"
        if name.startswith(("_", ".")):
            continue
        if os.path.isdir(full):
            out.extend(
                f"{full}/{child}"
                for child in sorted(os.listdir(full))
                if not child.startswith(("_", ".")) and child.endswith(".parquet")
            )
        elif name.endswith(".parquet"):
            out.append(full)
    return out


def file_schemas(spark: SparkSession, path: str) -> DataFrame:
    """(file, column, dtype, col_idx) for every column of every parquet
    data file under ``path`` — read from FOOTERS ONLY, distributed.

    ``dtype`` is the Arrow type string (the physical/logical type the
    writer recorded), which is exactly what drifts when a pipeline
    version changes a column's width or unit.
    """
    files = _data_files(path)
    if not files:
        raise ValueError(f"no parquet data files under {path!r}")
    fdf = spark.createDataFrame([(f,) for f in files], "file string").repartition(
        min(len(files), spark.sparkContext.defaultParallelism)
    )

    def scan(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for f in pdf["file"]:
                sch = pq.read_schema(f)  # footer-only: no data pages
                for i, (name, typ) in enumerate(zip(sch.names, sch.types)):
                    rows.append((f, name, str(typ), i))
            yield pd.DataFrame(
                rows, columns=["file", "column", "dtype", "col_idx"]
            )

    return fdf.mapInPandas(
        scan, "file string, column string, dtype string, col_idx int"
    )


def schema_drift_report(spark: SparkSession, path: str) -> DataFrame:
    """Per-column drift report over every parquet file under ``path``:
    (column, dtype, n_files, n_files_total, status) with status

    - ``ok``          — present in every file under one type,
    - ``partial``     — missing from some files (added or dropped
      mid-stream; a ``mergeSchema`` read silently NULL-fills these),
    - ``conflicting`` — more than one physical type across files (the
      row additionally tells which type appears in how many files).

    One row per (column, dtype) pair, so a conflicting column shows
    each of its variants with its file count — the operator's output
    is the work list for a schema-repair pass.
    """
    fs = file_schemas(spark, path)
    n_total = len(_data_files(path))  # already listed once; no job
    per_type = fs.groupBy("column", "dtype").agg(
        F.count(F.lit(1)).alias("n_files")
    )
    per_col = per_type.groupBy("column").agg(
        F.sum("n_files").alias("n_col_files"),
        F.count(F.lit(1)).alias("n_types"),
    )
    return (
        per_type.join(per_col, "column")
        .selectExpr(
            "column",
            "dtype",
            "CAST(n_files AS BIGINT) AS n_files",
            f"CAST({n_total} AS BIGINT) AS n_files_total",
            "CASE WHEN n_types > 1 THEN 'conflicting' "
            f"WHEN n_col_files < {n_total} THEN 'partial' "
            "ELSE 'ok' END AS status",
        )
    )
