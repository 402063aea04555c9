"""Streaming data-quality constraint monitor.

Streaming twin of :mod:`pgverify_spark.operators.constraints`: every
row-predicate check reduces to conditional SUMs plus a row count — all
purely additive — so the monitor is a native Structured Streaming
global aggregate in update mode.  State is ONE row of counters
(n_checks + 1 bigints, forever) regardless of stream volume; each
micro-batch folds its partial sums into that row, and the emitted wide
row after the last batch equals the batch ``constraint_report`` over
the same data, so the registry pairs it with the batch oracle SQL.

``unique`` checks are NOT supported here: uniqueness accounting needs
per-key state (a ``dropDuplicates`` relation whose size grows with the
key domain), which contradicts the constant-state contract of a
monitor — run the batch suite for uniqueness, or bound the domain and
accept a dropDuplicates-fed count.  The constructor rejects them
loudly rather than silently degrading.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pgverify_spark.operators.constraints import (
    Constraint,
    _agg_exprs,
    report_from_wide,
)


def streaming_constraint_counts(
    sdf: DataFrame, constraints: list[Constraint]
) -> DataFrame:
    """Continuous wide counter row (v0..vN, n_rows) over a stream.

    Use update-mode emissions; counters only grow, so the final state
    is the max per counter (:func:`finalize_streaming_constraints`).
    """
    bad = [c.name for c in constraints if c.distinct_col is not None]
    if bad:
        raise ValueError(
            f"unique checks need per-key state, unsupported in the "
            f"streaming monitor: {bad}"
        )
    # a constant grouping key makes this a keyed streaming aggregate
    # with exactly one group (Spark requires a key for update-mode aggs
    # over streams; the single group IS the constant-size state row)
    return (
        sdf.selectExpr("1 AS __g", "*")
        .groupBy("__g")
        .agg(*[_to_agg_col(e) for e in _agg_exprs(constraints, "spark")])
        .drop("__g")
    )


def _to_agg_col(expr_sql: str):
    from pyspark.sql import functions as F

    return F.expr(expr_sql)


def finalize_streaming_constraints(
    emitted: DataFrame, constraints: list[Constraint]
) -> DataFrame:
    """Latest counter row (counters are monotonic → max) unpivoted into
    the same report shape as the batch ``constraint_report``."""
    from pyspark.sql import functions as F

    cols = [f"v{i}" for i in range(len(constraints))] + ["n_rows"]
    wide = emitted.agg(*[F.max(c).alias(c) for c in cols])
    return report_from_wide(wide, constraints)
