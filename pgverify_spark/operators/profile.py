"""Exact per-column table profiling (the pre-verification triage step).

Beyond-reference extension: before fingerprinting two targets, a
profile answers "which column drifted" cheaply — null counts, exact
distinct cardinalities, and canonical min/max per column in ONE scan.
The reference jumps straight to whole-row hashes (SURVEY.md §2.1 #3);
a profile is the standard first look at an unfamiliar or drifting
table, and doubles as training-data QA (null spikes and cardinality
collapses are the two classic upstream-pipeline failures).

Column min/max are reported in the engine's *canonical text form*
(``functions.canonical.canon_sql``) and compared lexicographically —
byte-identical in Spark and DuckDB by the engine's core contract, so
the whole profile is oracle-checkable.

Scale shape: one aggregation pass.  The exact multi-column distinct
makes Spark plan an Expand (one replicated stream per counted column) —
inherent to exact profiles on ANY engine (DuckDB pays the same); the
at-scale variant swaps ``count(DISTINCT c)`` for
``approx_count_distinct(c)`` (HLL, mergeable, one stream total) in the
same plan shape, losing oracle-exactness only on the distinct column.
The final stack-to-long-rows is a zero-shuffle projection of a single
aggregated row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pgverify_spark.functions.canonical import DIALECT_DUCKDB, DIALECT_SPARK, canon_sql
from pgverify_spark.sources.schemas import TableSchema


def profile_table(df: DataFrame, schema: TableSchema) -> DataFrame:
    """Per-column profile: (col_name, n_nulls, n_distinct, min_c, max_c).

    ``min_c``/``max_c`` are lexicographic extremes of the canonical text
    form ('' for all-null columns).
    """
    d = DIALECT_SPARK
    aggs, stack = [], []
    for c, t in schema.cols:
        canon = canon_sql(c, t, d)
        aggs += [
            f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_{c}",
            f"CAST(count(DISTINCT {c}) AS BIGINT) AS nd_{c}",
            f"coalesce(min({canon}), '') AS mn_{c}",
            f"coalesce(max({canon}), '') AS mx_{c}",
        ]
        stack.append(f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}")
    wide = df.selectExpr(*aggs)
    return wide.selectExpr(
        f"stack({len(schema.cols)}, {', '.join(stack)}) "
        "AS (col_name, n_nulls, n_distinct, min_c, max_c)"
    )


def profile_table_oracle_sql(table: str, schema: TableSchema) -> str:
    d = DIALECT_DUCKDB
    parts = []
    for c, t in schema.cols:
        canon = canon_sql(c, t, d)
        parts.append(
            f"SELECT '{c}' AS col_name, "
            f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls, "
            f"CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct, "
            f"coalesce(min({canon}), '') AS min_c, "
            f"coalesce(max({canon}), '') AS max_c FROM {table}"
        )
    return " UNION ALL ".join(parts)
