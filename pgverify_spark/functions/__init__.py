from pgverify_spark.functions.canonical import (
    DIALECT_DUCKDB,
    DIALECT_SPARK,
    canon_sql,
    hex_prefix_int_sql,
    pk_key_sql,
    row_hash_sql,
)

__all__ = [
    "DIALECT_DUCKDB",
    "DIALECT_SPARK",
    "canon_sql",
    "hex_prefix_int_sql",
    "pk_key_sql",
    "row_hash_sql",
]
