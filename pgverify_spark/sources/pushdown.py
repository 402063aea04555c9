"""PostgreSQL-pushdown fingerprint queries — the reference's own path.

The reference's defining architecture is a *query generator*: for every
(table, mode) it synthesizes one SQL statement computing the fingerprint
inside the target database, so a single scalar crosses the wire
(``query.go:122-283``).  The Spark engine inverts that (read rows, hash
in Spark) — which works for files and lakehouses — but for live
PostgreSQL/CockroachDB targets the pushdown path is strictly cheaper:
this module generates the same family of fingerprint statements in PG
dialect, and ``JDBCTarget.pushdown_fingerprint`` runs them via Spark's
JDBC ``query`` option (one-row result, no table transfer).

Semantics mirror the reference builders exactly (cited per function);
the SQL text is generated fresh — canonical casts per ``column.go:24-36``,
column cast-expressions sorted lexicographically for deterministic hash
order (``query.go:136-137``), PG ``CONCAT`` null-skipping.

Note the pushdown fingerprints use PG's ``::TEXT`` renderings, so they
compare pushdown-vs-pushdown (the reference's contract: same SQL on
every target).  They are NOT byte-comparable with this engine's
Spark-native fingerprints, whose canonical forms deviate from PG where
PG's text output has no portable twin (SURVEY.md §7.3).
"""

from __future__ import annotations

from pgverify_spark.config import VerifyConfig
from pgverify_spark.sources.quoting import quote_ident, quote_qualified

#: PG types needing a non-default canonical cast (column.go:24-36).
_TIMESTAMPTZ = ("timestamp with time zone",)
_JSON = ("json",)
_JSONB = ("jsonb",)


def pg_text_cast(column: str, data_type: str, precision: str = "milliseconds") -> str:
    """Canonical text cast for one column (``column.go:24-36``).

    - ``timestamp with time zone`` -> epoch microseconds truncated to the
      configured precision (sub-precision differences compare equal)
    - ``json`` -> length of the canonical jsonb text (PG and CRDB order
      jsonb keys differently, so only the length is portable)
    - ``jsonb`` -> length of the text form
    - everything else -> ``::TEXT``
    """
    q = quote_ident(column)
    if data_type in _TIMESTAMPTZ:
        return (
            f"(extract(epoch from date_trunc('{precision}', {q}))::DECIMAL "
            "* 1000000)::BIGINT::TEXT"
        )
    if data_type in _JSON:
        return f"length({q}::JSONB::TEXT)::TEXT"
    if data_type in _JSONB:
        return f"length({q}::TEXT)::TEXT"
    return f"{q}::TEXT"


def _casts(columns: list[tuple[str, str]], config: VerifyConfig) -> list[str]:
    """Sorted canonical cast list — sorted by the cast *expression* so
    every engine hashes columns in the same order (query.go:136-137)."""
    return sorted(
        pg_text_cast(c, t, config.timestamp_precision)
        for c, t in columns
        if config.valid_column(c)
    )


def _pk_order_expr(pk_columns: list[tuple[str, str]], config: VerifyConfig) -> str:
    """Row ordering key: CONCAT of PK casts, optionally md5-hashed to
    sidestep collation-dependent text ordering (config.go:53-57,
    query.go:136-145)."""
    casts = sorted(
        pg_text_cast(c, t, config.timestamp_precision) for c, t in pk_columns
    )
    key = f"CONCAT({', '.join(casts)})"
    return f"MD5({key})" if config.hash_primary_keys else key


def _row_hash_subquery(
    schema: str,
    table: str,
    columns: list[tuple[str, str]],
    pk_columns: list[tuple[str, str]],
    config: VerifyConfig,
    order: str = "ASC",
    limit: int | None = None,
    where: str | None = None,
) -> str:
    casts = _casts(columns, config)
    key = _pk_order_expr(pk_columns, config)
    sql = (
        f"SELECT MD5(CONCAT({', '.join(casts)})) AS hash "
        f'FROM {quote_qualified(schema, table)}'
    )
    if where:
        sql += f" WHERE {where}"
    sql += f" ORDER BY {key} {order}"
    if limit is not None:
        sql += f" LIMIT {limit}"
    return sql


def build_full_hash_query(
    schema: str,
    table: str,
    columns: list[tuple[str, str]],
    pk_columns: list[tuple[str, str]],
    config: VerifyConfig | None = None,
) -> str:
    """Whole-table ordered fingerprint (``buildFullHashQuery``,
    query.go:122-158): md5 of per-row md5s concatenated in PK order."""
    config = config or VerifyConfig()
    inner = _row_hash_subquery(schema, table, columns, pk_columns, config)
    return f"SELECT md5(string_agg(hash, '')) AS fp FROM ({inner}) AS eachhash"


def build_bookend_hash_query(
    schema: str,
    table: str,
    columns: list[tuple[str, str]],
    pk_columns: list[tuple[str, str]],
    config: VerifyConfig | None = None,
) -> str:
    """First-N + last-N fingerprint (``buildBookendHashQuery``,
    query.go:232-278): each bookend reduced to md5(string_agg), the two
    1-row relations cross-joined and combined."""
    config = config or VerifyConfig()
    n = config.bookend_limit
    start = _row_hash_subquery(schema, table, columns, pk_columns, config, "ASC", n)
    end = _row_hash_subquery(schema, table, columns, pk_columns, config, "DESC", n)
    return (
        "SELECT md5(CONCAT(starthash::TEXT, endhash::TEXT)) AS fp FROM "
        f"(SELECT md5(string_agg(hash, '')) AS starthash FROM ({start}) AS s) AS sh, "
        f"(SELECT md5(string_agg(hash, '')) AS endhash FROM ({end}) AS e) AS eh"
    )


def build_sparse_hash_query(
    schema: str,
    table: str,
    columns: list[tuple[str, str]],
    pk_columns: list[tuple[str, str]],
    config: VerifyConfig | None = None,
) -> str:
    """Deterministic ~1/mod sample fingerprint (``buildSparseHashQuery``,
    query.go:163-229): rows whose PK-key md5 prefix, reinterpreted as a
    signed 64-bit integer, is divisible by sparse_mod."""
    config = config or VerifyConfig()
    casts = sorted(
        pg_text_cast(c, t, config.timestamp_precision) for c, t in pk_columns
    )
    key = f"CONCAT({', '.join(casts)})"
    selector = (
        f"(('x' || substr(md5({key}), 1, 16))::bit(64)::bigint % {config.sparse_mod}) = 0"
    )
    inner = _row_hash_subquery(
        schema, table, columns, pk_columns, config, where=selector
    )
    return f"SELECT md5(string_agg(hash, '')) AS fp FROM ({inner}) AS eachhash"


def build_rowcount_query(schema: str, table: str) -> str:
    """``SELECT count(*)::TEXT`` (``buildRowCountQuery``, query.go:281-283)."""
    return f'SELECT count(*)::TEXT AS fp FROM {quote_qualified(schema, table)}'


PUSHDOWN_BUILDERS = {
    "full": build_full_hash_query,
    "bookend": build_bookend_hash_query,
    "sparse": build_sparse_hash_query,
}
