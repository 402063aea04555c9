"""Cross-table referential-integrity verification.

Beyond-reference extension in the reference's own spirit: pgverify checks
that the *same* table agrees across databases (``verify.go:23-88``); this
operator checks that *related* tables agree with each other — every
foreign key in the child resolves to a parent row.  Broken FK edges are
exactly the kind of drift a replication/migration verifier needs to
surface next to fingerprint mismatches.

Scale shape: one left join per edge against the distinct-projected parent
keys, immediately collapsed by a single aggregate to ONE row per edge —
the join output never materializes.  Parent key sets of dimension tables
are broadcast (AQE does this automatically under the size threshold);
fact-to-fact edges (lineitem->orders) fall back to a shuffled hash join
on uniformly distributed keys.  Cost is one scan of each side per edge;
a multi-edge report is a union of independent one-row plans, so Spark
schedules the edges concurrently.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fk_check(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    edge: str,
) -> DataFrame:
    """One-row integrity summary for a FK edge.

    Output: (edge, n_rows, n_nonnull, n_orphans, min_orphan, max_orphan).
    NULL foreign keys are counted separately and never orphans (SQL FK
    semantics); min/max orphan key give a deterministic repair pointer
    without collecting the orphan set.
    """
    parents = parent.select(F.col(parent_key).alias("__pk")).distinct()
    joined = child.select(F.col(child_key).alias("__ck")).join(
        parents.withColumn("__hit", F.lit(1)),
        F.col("__ck") == F.col("__pk"),
        "left",
    )
    miss = "__ck IS NOT NULL AND __hit IS NULL"
    return joined.agg(
        F.lit(edge).alias("edge"),
        F.count(F.lit(1)).alias("n_rows"),
        F.count("__ck").alias("n_nonnull"),
        F.sum(F.expr(f"CASE WHEN {miss} THEN 1 ELSE 0 END")).alias("n_orphans"),
        F.min(F.expr(f"CASE WHEN {miss} THEN __ck END")).alias("min_orphan"),
        F.max(F.expr(f"CASE WHEN {miss} THEN __ck END")).alias("max_orphan"),
    )


def fk_report(edges: list[tuple[DataFrame, DataFrame, str, str, str]]) -> DataFrame:
    """Union of :func:`fk_check` rows for every (child, parent,
    child_key, parent_key, edge) tuple — one independent one-row plan per
    edge, scheduled concurrently by Spark."""
    return reduce(
        DataFrame.unionByName, (fk_check(*edge) for edge in edges)
    )


def fk_check_oracle_sql(
    child_sql: str,
    parent_sql: str,
    child_key: str,
    parent_key: str,
    edge: str,
) -> str:
    """DuckDB twin of :func:`fk_check`; ``child_sql``/``parent_sql`` are
    table names or parenthesized subqueries."""
    miss = "__ck IS NOT NULL AND __hit IS NULL"
    return (
        f"SELECT '{edge}' AS edge, count(*) AS n_rows, count(__ck) AS n_nonnull, "
        f"CAST(sum(CASE WHEN {miss} THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans, "
        f"min(CASE WHEN {miss} THEN __ck END) AS min_orphan, "
        f"max(CASE WHEN {miss} THEN __ck END) AS max_orphan FROM "
        f"(SELECT {child_key} AS __ck FROM {child_sql} c) ch LEFT JOIN "
        f"(SELECT DISTINCT {parent_key} AS __pk, 1 AS __hit FROM {parent_sql} p) pa "
        "ON __ck = __pk"
    )


def fk_report_oracle_sql(edges: list[tuple[str, str, str, str, str]]) -> str:
    return " UNION ALL ".join(fk_check_oracle_sql(*edge) for edge in edges)
