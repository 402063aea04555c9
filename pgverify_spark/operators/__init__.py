from pgverify_spark.operators.fingerprint import (
    bookend_fingerprint,
    bucketed_fingerprint,
    fingerprint_oracle_sql,
    full_fingerprint,
    rowcount,
    sparse_fingerprint,
)

__all__ = [
    "bookend_fingerprint",
    "bucketed_fingerprint",
    "fingerprint_oracle_sql",
    "full_fingerprint",
    "rowcount",
    "sparse_fingerprint",
]
