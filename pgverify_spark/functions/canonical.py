"""Canonical text forms — the semantic heart of verification.

The reference casts every column to TEXT *identically across engines*
before hashing (reference ``column.go:24-36``); that cross-engine text
canonicalization is what makes fingerprints comparable.  This module is
the Spark-native equivalent: for every logical column type it emits a SQL
expression producing the **same canonical string in Spark SQL and in
DuckDB SQL** (DuckDB is the correctness oracle).  Parity holds by
construction because both dialects' expressions are generated from one
code path and diverge only where function *names* differ
(``unix_micros`` vs ``epoch_us``, ``transform`` vs ``list_transform``).

Deliberate deviations from PostgreSQL's text rendering (documented per
SURVEY.md §7.3 — PG byte-parity is only needed when comparing against a
PG-pushdown fingerprint, which is a separate JDBC mode):

- doubles/floats: fixed ``printf('%.6f')`` instead of PG
  shortest-round-trip (Spark's ``cast(string)`` renders ``1.0E20`` where
  DuckDB renders ``1e+20`` — a fixed-point format is the only form both
  engines produce byte-identically; ``+ 0.0`` normalizes ``-0.0``).
- timestamps: epoch **microseconds** truncated to the configured
  precision — same integer the reference computes via
  ``(extract(epoch from date_trunc(p, col))::DECIMAL * 1000000)::BIGINT``
  (``column.go:26-28``), rendered without PG's zone suffix.
- json/jsonb: the reference's *length proxy* (``column.go:29-32`` —
  PG and CRDB order jsonb keys differently, so only the length of the
  canonical text is portable).  Matching it keeps a Spark-read table
  comparable with a pushdown fingerprint of the same json-bearing table
  (``sources/pushdown.py``).  For ``jsonb`` the proxy is exact parity:
  JDBC delivers the database's normalized rendering, so ``length(col)``
  here equals the reference's ``length(col::TEXT)``.  For ``json`` (raw
  stored text) parity holds when the stored text is already normalized;
  a raw-whitespace difference shows up as a length difference — the
  same portability caveat the reference accepts.  Declaring the column
  ``string`` instead opts into the strictly stronger raw-byte hash for
  same-engine comparisons.
"""

from __future__ import annotations

DIALECT_SPARK = "spark"
DIALECT_DUCKDB = "duckdb"

#: microseconds per date_trunc unit (for bigint-nanos timestamp columns).
_UNIT_US = {
    "microsecond": 1,
    "millisecond": 1_000,
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
}


def _str_cast(expr: str, dialect: str) -> str:
    return f"CAST({expr} AS STRING)" if dialect == DIALECT_SPARK else f"CAST({expr} AS VARCHAR)"


def canon_sql(col: str, ltype: str, dialect: str, trunc_unit: str = "millisecond") -> str:
    """Canonical-text SQL expression for one column.

    ``ltype`` is the engine's logical type tag: one of ``boolean,
    tinyint, smallint, int, bigint, float, double, decimal, string, date,
    timestamp, timestamp_ntz, timestamp_ns, binary, json, jsonb,
    array<T>``.
    ``timestamp_ns`` is a bigint of epoch-nanoseconds on the Spark side
    (parquet TIMESTAMP(NANOS) read with nanosAsLong) but a real
    TIMESTAMP_NS on the DuckDB side.
    """
    if ltype in ("double", "float"):
        # Fixed-point decimal, reached THROUGH the shortest-round-trip
        # string: ``double -> string`` is the unique shortest repr of the
        # same value in both engines, and ``string -> decimal`` is exact
        # decimal arithmetic with identical tie rounding — whereas a
        # direct ``double -> decimal`` cast diverges (DuckDB scales by
        # 10^6 in floating point, garbling magnitudes >= 2^50; Java's
        # printf rounds shortest digits, not the exact value — both
        # found by the edge/fuzz parity tests).  TRY_CAST nulls values
        # beyond DECIMAL(38,6) range (~1e32) in both engines (concat_ws
        # then skips them identically); NaN/Inf are guarded because
        # DuckDB's TRY_CAST raises on NaN->decimal.  float widens to
        # double exactly in both engines; + 0.0 normalizes -0.0.
        c = f"CAST({col} AS DOUBLE)" if ltype == "float" else col
        sstr = _str_cast(f"{c} + 0.0", dialect)
        dec = _str_cast(f"TRY_CAST({sstr} AS DECIMAL(38,6))", dialect)
        # abs < 1e-7 short-circuit: such values all round to 0.000000,
        # and it keeps scientific notation with exponent <= -8 away from
        # DuckDB's string->decimal parser, which mis-rounds long-mantissa
        # strings there ('6.6552990120357385e-08' -> 0.000001); exponents
        # >= -7 parse correctly (verified digit-exact by the fuzz tests).
        return (
            f"CASE WHEN isnan({c}) THEN 'NaN' "
            f"WHEN abs({c}) = CAST('Infinity' AS DOUBLE) THEN "
            f"(CASE WHEN {c} > 0 THEN 'Infinity' ELSE '-Infinity' END) "
            f"WHEN abs({c}) < 1e-7 THEN '0.000000' "
            f"ELSE {dec} END"
        )
    if ltype in ("timestamp", "timestamp_ntz"):
        if dialect == DIALECT_SPARK:
            return f"CAST(unix_micros(date_trunc('{trunc_unit.upper()}', {col})) AS STRING)"
        return f"CAST(epoch_us(date_trunc('{trunc_unit}', {col})) AS VARCHAR)"
    if ltype == "timestamp_ns":
        if dialect == DIALECT_SPARK:
            us = _UNIT_US[trunc_unit]
            # bigint nanos -> epoch micros truncated to the unit, in two
            # steps mirroring what the oracle side computes on a real
            # TIMESTAMP_NS: (1) ns -> us truncated TOWARD ZERO (DuckDB's
            # ns->us cast is C integer division; PG has no sub-us
            # resolution at all, so this step only matters for sub-us
            # pre-1970 values), then (2) us -> unit FLOORED toward
            # -infinity (date_trunc semantics; plain ``div`` truncates
            # toward zero and diverges on pre-1970 values that aren't
            # exact unit multiples, e.g. 1969-12-31 23:59:59.9995).
            # Integer arithmetic throughout: a double-based floor(ns/1e3)
            # loses precision past 2^53 (nanos overflow doubles from
            # ~1970-04-07).
            u = f"({col} div 1000)"
            return (
                f"CAST(((({u} div {us}) - (CASE WHEN {u} < 0 AND "
                f"{u} % {us} != 0 THEN 1 ELSE 0 END)) * {us}) AS STRING)"
            )
        return f"CAST(epoch_us(date_trunc('{trunc_unit}', {col})) AS VARCHAR)"
    if ltype in ("json", "jsonb"):
        # length proxy (column.go:29-32); see the module docstring.
        return _str_cast(f"length({col})", dialect)
    if ltype == "binary":
        return f"lower(hex({col}))"
    if ltype.startswith("array<"):
        elem = ltype[6:-1]
        x = canon_sql("x", elem, dialect, trunc_unit)
        if dialect == DIALECT_SPARK:
            return f"concat('[', array_join(transform({col}, x -> {x}), ','), ']')"
        # coalesce: DuckDB's array_to_string is NULL on an empty list
        # (string_agg semantics) where Spark's array_join returns '';
        # the CASE keeps a NULL *array* canonicalizing to NULL (as in
        # Spark, where concat propagates it) rather than '[]'.
        return (
            f"(CASE WHEN {col} IS NULL THEN NULL ELSE "
            f"'[' || coalesce(array_to_string(list_transform({col}, x -> {x}), ','), '')"
            " || ']' END)"
        )
    if ltype == "string":
        return col
    # boolean/ints/decimal/date render identically via plain string cast
    # in both engines ('true'/'false', no exponent, ISO dates).
    return _str_cast(col, dialect)


def row_concat_sql(
    cols: list[tuple[str, str]],
    dialect: str,
    trunc_unit: str = "millisecond",
) -> str:
    """Canonical row string: ``concat_ws('', canon(c1), canon(c2), ...)``.

    Columns are concatenated in sorted-by-name order so the result is
    independent of physical column order (the reference sorts its
    cast-expression list for the same reason, ``query.go:136-137``).
    ``concat_ws`` skips NULLs in both dialects, matching PG ``CONCAT``
    NULL semantics (``query.go:141`` — Spark's plain ``concat`` would
    null the whole row and must not be used).

    Orders identically in Spark and DuckDB (both compare strings by
    binary UTF-8 bytes), so it doubles as a deterministic, md5-free
    ordering tiebreak (see ``bookend_fingerprint``).
    """
    canons = [canon_sql(c, t, dialect, trunc_unit) for c, t in sorted(cols)]
    return "concat_ws('', " + ", ".join(canons) + ")"


def row_hash_sql(
    cols: list[tuple[str, str]],
    dialect: str,
    trunc_unit: str = "millisecond",
) -> str:
    """Per-row scalar hash: ``md5(row_concat_sql(...))``."""
    return f"md5({row_concat_sql(cols, dialect, trunc_unit)})"


def pk_key_sql(
    pk_cols: list[tuple[str, str]],
    dialect: str,
    trunc_unit: str = "millisecond",
    hash_primary_keys: bool = False,
) -> str:
    """Row ordering key from the primary key columns.

    The reference orders by ``CONCAT(pk casts)`` (``query.go:136-145``);
    we join with ``'|'`` so multi-column keys cannot alias each other
    (``(1, 51)`` vs ``(15, 1)``).  With ``hash_primary_keys`` the key is
    md5-hashed — the reference's workaround for collation-dependent text
    ordering (``config.go:53-57``); here it just exercises the same
    ordering variant.
    """
    canons = [canon_sql(c, t, dialect, trunc_unit) for c, t in pk_cols]
    key = "concat_ws('|', " + ", ".join(canons) + ")"
    return f"md5({key})" if hash_primary_keys else key


def hex_prefix_int_sql(hex_expr: str, dialect: str, ndigits: int = 12) -> str:
    """Unsigned integer from the first ``ndigits`` hex chars of an md5 hex
    string, referencing ``hex_expr`` exactly once.

    Single-reference matters: ``hex_expr`` is often an inlined
    ``md5(...)`` (Catalyst's CollapseProject substitutes projected
    columns into every use), so a digit-by-digit spelling with 12
    references recomputes the md5 12x per row — measured as the entire
    cost gap between sparse and full fingerprints at sf0.1.

    The reference reinterprets the first 16 hex chars as a *signed*
    bigint via ``('x'||substr(md5(k),1,16))::bit(64)::bigint``
    (``query.go:193``); that signed reinterpret has no portable SQL
    spelling, so this engine defines its sampler on the first 48 bits
    (fits int64 unsigned, identical in Spark and DuckDB).  Deterministic
    and uniform, selecting a different-but-equally-valid ≈1/mod sample
    than the reference — acceptable because sample *consistency across
    targets* is the contract, not reference-identical row sets
    (SURVEY.md §7.3).
    """
    if not 1 <= ndigits <= 15:
        raise ValueError("ndigits must be in 1..15 to fit a signed int64")
    if dialect == DIALECT_SPARK:
        return f"CAST(conv(substr({hex_expr}, 1, {ndigits}), 16, 10) AS BIGINT)"
    return f"CAST('0x' || substr({hex_expr}, 1, {ndigits}) AS BIGINT)"
