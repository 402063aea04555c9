"""SQL quoting helpers shared by the JDBC catalog and pushdown builders.

The reference interpolates identifiers and literals unescaped (same
query-generation sites, ``query.go:21-118``); escaping here hardens the
generated SQL against identifiers containing double quotes and filter
values containing single quotes — standard SQL doubling rules, valid in
PostgreSQL, CockroachDB and DuckDB.
"""

from __future__ import annotations


def quote_ident(name: str) -> str:
    """Double-quoted identifier with embedded quotes doubled."""
    return '"' + name.replace('"', '""') + '"'


def quote_qualified(schema: str, table: str) -> str:
    return f"{quote_ident(schema)}.{quote_ident(table)}"


def quote_literal(value: str) -> str:
    """Single-quoted string literal with embedded quotes doubled."""
    return "'" + value.replace("'", "''") + "'"
