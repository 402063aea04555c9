"""Row-level diff — extension beyond the reference's table-level verdict.

The reference only reports WHICH (schema, table, mode) mismatched
(``results.go:72-98``); when a 100 TB table disagrees you need to know
WHICH ROWS.  ``row_diff`` compares two sources of the same table and
returns one row per differing (key, row-hash) multiset entry.

Semantics: rows are reduced to (k, h) — canonical PK key and canonical
row hash (the same canonicalization the fingerprints use) — and compared
as multisets of (k, h) with counts, so duplicate keys and duplicate whole
rows are handled exactly.  Status values:

- ``only_left`` / ``only_right`` — row content present on one side only
  (an UPDATE appears as one ``only_left`` + one ``only_right`` under the
  same k; an INSERT/DELETE as a lone entry)
- ``count_mismatch`` — same row content, different duplicate count

Scale: both sides aggregate to (k, h, count) before the join — map-side
partial aggregation shrinks each side to distinct-row cardinality, the
join shuffles on (k, h) (no skew: md5 keys are uniform), and matching
rows are dropped as early as possible.  Output size is O(diff), not
O(table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pgverify_spark.config import VerifyConfig
from pgverify_spark.functions.canonical import (
    DIALECT_DUCKDB,
    DIALECT_SPARK,
    pk_key_sql,
    row_hash_sql,
)
from pgverify_spark.operators.util import parallelize as _parallelize
from pgverify_spark.sources.schemas import TableSchema


def _kh_counts(df: DataFrame, schema: TableSchema, config: VerifyConfig) -> DataFrame:
    cols = schema.hashed_cols(config.valid_column)
    k = pk_key_sql(schema.pk_cols(), DIALECT_SPARK, config.trunc_unit)
    h = row_hash_sql(cols, DIALECT_SPARK, config.trunc_unit)
    return _parallelize(df).selectExpr(f"{k} AS k", f"{h} AS h").groupBy("k", "h").count()


def row_diff(
    left: DataFrame,
    right: DataFrame,
    schema: TableSchema,
    config: VerifyConfig | None = None,
) -> DataFrame:
    """Multiset diff of two sources -> (k, h, left_count, right_count, status)."""
    config = config or VerifyConfig()
    l = _kh_counts(left, schema, config).withColumnRenamed("count", "left_count")
    r = _kh_counts(right, schema, config).withColumnRenamed("count", "right_count")
    joined = l.join(r, on=["k", "h"], how="full_outer")
    return (
        joined.filter(
            F.col("left_count").isNull()
            | F.col("right_count").isNull()
            | (F.col("left_count") != F.col("right_count"))
        )
        .select(
            "k",
            "h",
            F.coalesce("left_count", F.lit(0)).alias("left_count"),
            F.coalesce("right_count", F.lit(0)).alias("right_count"),
            F.when(F.col("right_count").isNull(), F.lit("only_left"))
            .when(F.col("left_count").isNull(), F.lit("only_right"))
            .otherwise(F.lit("count_mismatch"))
            .alias("status"),
        )
    )


def row_diff_oracle_sql(
    left_table: str,
    right_table: str,
    schema: TableSchema,
    config: VerifyConfig | None = None,
) -> str:
    """DuckDB twin of ``row_diff`` (same canonicalization code path)."""
    config = config or VerifyConfig()
    cols = schema.hashed_cols(config.valid_column)
    k = pk_key_sql(schema.pk_cols(), DIALECT_DUCKDB, config.trunc_unit)
    h = row_hash_sql(cols, DIALECT_DUCKDB, config.trunc_unit)

    def side(table: str) -> str:
        return (
            f"SELECT k, h, count(*) AS cnt FROM "
            f"(SELECT {k} AS k, {h} AS h FROM {table}) t GROUP BY k, h"
        )

    return (
        f"WITH l AS ({side(left_table)}), r AS ({side(right_table)}) "
        "SELECT COALESCE(l.k, r.k) AS k, COALESCE(l.h, r.h) AS h, "
        "COALESCE(l.cnt, 0) AS left_count, COALESCE(r.cnt, 0) AS right_count, "
        "CASE WHEN r.cnt IS NULL THEN 'only_left' "
        "WHEN l.cnt IS NULL THEN 'only_right' "
        "ELSE 'count_mismatch' END AS status "
        "FROM l FULL OUTER JOIN r ON l.k = r.k AND l.h = r.h "
        "WHERE l.cnt IS NULL OR r.cnt IS NULL OR l.cnt <> r.cnt"
    )
