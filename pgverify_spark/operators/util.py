"""Shared physical-plan helpers for operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def parallelize(df: DataFrame) -> DataFrame:
    """Round-robin repartition ONLY when the scan has fewer splits than the
    cluster has cores.  CPU-bound projections (md5 + canonical casts) over
    a small input (few files / few row groups) would otherwise pin to a
    handful of cores.  At 100 TB the scan has orders of magnitude more
    splits than cores and this is a no-op — no shuffle is ever added to a
    large input."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for the plan's output (file bytes for
    parquet scans; ``spark.sql.defaultSizeInBytes`` — effectively infinite
    — for sources without statistics, so unknown sizes take large-input
    paths)."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def barrier(df: DataFrame) -> DataFrame:
    """Optimization barrier between expression layers.

    Catalyst's CollapseProject merges adjacent projections by *inlining*
    the lower expression into every reference above — for a tokens array
    referenced by 3n lambda element_at's (or a shingle array referenced
    by 32 MinHash mins) that re-evaluates the full regexp/md5 pipeline
    per reference and turns a linear scan quadratic (measured 30s+ at
    sf0.1).  A round-robin repartition puts an exchange between the
    projects so each layer is computed once per row; it also spreads the
    CPU-heavy hashing across all cores.  Cost: one shuffle of (id, array)
    rows — linear in data size, the right trade at any scale."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)
