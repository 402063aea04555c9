"""Declarative data-quality constraint suite (deequ-style).

Beyond-reference extension in the reference's own spirit: pgverify
answers "do two copies of this table agree?" (``verify.go:23-88``);
this operator answers the sibling question a migration/ingest pipeline
asks next — "does ONE copy satisfy its contract?".  A constraint suite
is a declarative list of checks (not-null, unique, accepted values,
numeric range, regex shape, arbitrary row predicate) evaluated against
a table, producing one (check_name, col_name, status, violations,
n_rows) row per check — the shape Amazon Deequ / Great Expectations
popularized, re-expressed as a single Spark aggregate.

Scale shape: ALL row-predicate checks fuse into ONE aggregation pass
over the table (a conditional ``sum`` per check inside the same agg —
map-side combined, one 1-row shuffle), then a constant-size ``stack``
unpivot on the single result row.  ``unique`` checks add
``count(DISTINCT col)`` to that same agg; as with the profiler
(profile.py) the distinct aggregates make Catalyst plan an Expand —
inherent to exact multi-distinct.  At 100 TB prefer one suite per
table scan (this operator) over one scan per check (Deequ's naive
mode): the marginal cost of an extra check is one codegen'd CASE, not
a scan.

Cross-engine exactness: every check reduces to integer counts, so the
DuckDB oracle twin (generated from the same Constraint list) matches
bit-for-bit.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Constraint:
    """One declarative check.

    ``violation_spark`` / ``violation_duckdb`` are boolean SQL
    expressions that are TRUE for a row that VIOLATES the check (NULL
    never counts as a violation except for ``not_null`` itself, per
    SQL constraint semantics).  ``distinct_col`` switches the check to
    uniqueness accounting (violations = n_nonnull - n_distinct)
    instead of a row predicate.
    """

    name: str
    column: str
    violation_spark: str | None = None
    violation_duckdb: str | None = None
    distinct_col: str | None = None


def not_null(column: str, name: str | None = None) -> Constraint:
    expr = f"{column} IS NULL"
    return Constraint(name or f"not_null_{column}", column, expr, expr)


def unique(column: str, name: str | None = None) -> Constraint:
    return Constraint(name or f"unique_{column}", column, distinct_col=column)


def accepted_values(
    column: str, values: tuple[str, ...], name: str | None = None
) -> Constraint:
    lit = ", ".join("'" + v.replace("'", "''") + "'" for v in values)
    expr = f"{column} IS NOT NULL AND {column} NOT IN ({lit})"
    return Constraint(name or f"accepted_values_{column}", column, expr, expr)


def in_range(
    column: str, lo: float | int, hi: float | int, name: str | None = None
) -> Constraint:
    expr = f"{column} IS NOT NULL AND ({column} < {lo} OR {column} > {hi})"
    return Constraint(name or f"in_range_{column}", column, expr, expr)


def matches(column: str, regex: str, name: str | None = None) -> Constraint:
    esc = regex.replace("'", "''")
    return Constraint(
        name or f"matches_{column}",
        column,
        f"{column} IS NOT NULL AND NOT ({column} RLIKE '{esc}')",
        f"{column} IS NOT NULL AND NOT regexp_matches({column}, '{esc}')",
    )


def satisfies(
    name: str, column: str, predicate: str, predicate_duckdb: str | None = None
) -> Constraint:
    """Row-level invariant: violation when the (dialect-neutral unless
    ``predicate_duckdb`` given) boolean ``predicate`` is FALSE or NULL
    for a row."""
    return Constraint(
        name,
        column,
        f"NOT coalesce({predicate}, FALSE)",
        f"NOT coalesce({predicate_duckdb or predicate}, FALSE)",
    )


def suite_from_spec(spec: list[dict]) -> list[Constraint]:
    """Build a suite from a declarative JSON-style spec (the CLI's
    ``--constraints`` file format)::

        [{"check": "not_null", "column": "o_custkey"},
         {"check": "unique", "column": "o_orderkey"},
         {"check": "accepted_values", "column": "o_orderstatus",
          "values": ["O", "F", "P"]},
         {"check": "in_range", "column": "o_totalprice", "lo": 0, "hi": 1e6},
         {"check": "matches", "column": "o_orderpriority", "regex": "^[1-5]-"},
         {"check": "satisfies", "name": "positive", "column": "value",
          "predicate": "value > 0"}]

    Each entry may carry an optional ``name`` override.  Unknown check
    kinds or missing keys raise ``ValueError`` with the offending entry.
    """
    out = []
    for entry in spec:
        try:
            kind = entry["check"]
            if kind == "not_null":
                c = not_null(entry["column"], entry.get("name"))
            elif kind == "unique":
                c = unique(entry["column"], entry.get("name"))
            elif kind == "accepted_values":
                c = accepted_values(
                    entry["column"], tuple(entry["values"]), entry.get("name")
                )
            elif kind == "in_range":
                c = in_range(
                    entry["column"], entry["lo"], entry["hi"], entry.get("name")
                )
            elif kind == "matches":
                c = matches(entry["column"], entry["regex"], entry.get("name"))
            elif kind == "satisfies":
                c = satisfies(
                    entry["name"], entry["column"], entry["predicate"],
                    entry.get("predicate_duckdb"),
                )
            else:
                raise KeyError(f"unknown check kind {kind!r}")
        except KeyError as e:
            raise ValueError(f"bad constraint spec entry {entry!r}: {e}") from e
        out.append(c)
    return out


def _agg_exprs(constraints: list[Constraint], dialect: str) -> list[str]:
    out = []
    for i, c in enumerate(constraints):
        if c.distinct_col is not None:
            out.append(
                f"CAST(count({c.distinct_col}) - count(DISTINCT {c.distinct_col}) "
                f"AS BIGINT) AS v{i}"
            )
        else:
            pred = c.violation_spark if dialect == "spark" else c.violation_duckdb
            out.append(
                f"CAST(sum(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT) AS v{i}"
            )
    out.append("count(*) AS n_rows")
    return out


def report_from_wide(wide: DataFrame, constraints: list[Constraint]) -> DataFrame:
    """Unpivot a 1-row (v0..vN, n_rows) counter relation into the
    per-check report shape (shared by the batch pass and the streaming
    monitor's final state)."""
    stack = ", ".join(
        f"'{c.name}', '{c.column}', v{i}" for i, c in enumerate(constraints)
    )
    return wide.selectExpr(
        "n_rows",
        f"stack({len(constraints)}, {stack}) AS (check_name, col_name, violations)",
    ).selectExpr(
        "check_name",
        "col_name",
        "CASE WHEN violations = 0 THEN 'pass' ELSE 'fail' END AS status",
        "violations",
        "n_rows",
    )


def constraint_report(df: DataFrame, constraints: list[Constraint]) -> DataFrame:
    """Evaluate ``constraints`` in one aggregation pass.

    Output: (check_name, col_name, status, violations, n_rows) — one row
    per constraint, ``status`` in {'pass', 'fail'}.
    """
    return report_from_wide(
        df.selectExpr(*_agg_exprs(constraints, "spark")), constraints
    )


def constraint_report_oracle_sql(table: str, constraints: list[Constraint]) -> str:
    agg = ", ".join(_agg_exprs(constraints, "duckdb"))
    selects = [
        f"SELECT '{c.name}' AS check_name, '{c.column}' AS col_name, "
        f"CASE WHEN v{i} = 0 THEN 'pass' ELSE 'fail' END AS status, "
        f"v{i} AS violations, n_rows FROM a"
        for i, c in enumerate(constraints)
    ]
    return f"WITH a AS (SELECT {agg} FROM {table}) " + " UNION ALL ".join(selects)


def _reason_exprs(
    constraints: list[Constraint], dialect: str
) -> tuple[list[str], str]:
    """Per-check reason terms + the joined ``reasons`` expression.

    Row-predicate checks contribute ``CASE WHEN <violation> THEN
    '<name>' END``; ``unique`` checks contribute the same over a
    per-value count window (``count(col) OVER (PARTITION BY col) > 1``
    — nulls never duplicate and the window is value-partitioned, never
    single-reducer).  Reason order is suite order, so the joined string
    is deterministic."""
    terms = []
    for c in constraints:
        if c.distinct_col is not None:
            col = c.distinct_col
            viol = (
                f"{col} IS NOT NULL AND "
                f"count({col}) OVER (PARTITION BY {col}) > 1"
            )
        else:
            viol = c.violation_spark if dialect == "spark" else c.violation_duckdb
        terms.append(f"CASE WHEN {viol} THEN '{c.name}' END")
    arr = ", ".join(terms)
    if dialect == "spark":
        joined = (
            f"concat_ws(',', filter(array({arr}), x -> x IS NOT NULL))"
        )
    else:
        joined = (
            f"array_to_string(list_filter([{arr}], x -> x IS NOT NULL), ',')"
        )
    return terms, joined


def quarantine_rows(
    df: DataFrame, constraints: list[Constraint], id_cols: list[str]
) -> DataFrame:
    """The dead-letter split: (id_cols..., reasons) for every row that
    violates at least one check, ``reasons`` the comma-joined names of
    every check it fails (suite order) — the row-level companion of
    :func:`constraint_report`, for routing bad records to a quarantine
    sink instead of failing the whole batch.

    Scale shape: all row-predicate checks fuse into ONE projection pass
    (a CASE per check inside a single array build, codegen'd); each
    ``unique`` check is attributed AGGREGATE-THEN-JOIN (r12, guide
    §2.3): a map-side-combined count of the check column alone yields
    the duplicated-value list (distinct-value-sized, column-pruned
    scan), which joins back onto the rows — the planner broadcasts it
    whenever duplicates are rare, which is the only regime a ``unique``
    check makes sense in.  The previous value-partitioned count window
    shuffled the ENTIRE row stream on the check column per unique check
    (at 100 TB: two full-table exchanges for this suite; now zero —
    measured 0.96 s -> 0.62 s at sf0.1, window exchanges 2 -> 0).
    Suites without unique checks stay exchange-free — and a
    row-predicate-only suite is STATELESS, so this operator streams
    as-is in append mode (the registered streaming twin).  Skew note: a
    ``unique`` check on a low-cardinality column yields a dup list near
    the column's cardinality (too big to broadcast — the planner falls
    back to a shuffle join, the old window's cost); such a column fails
    the check on nearly every row anyway — use
    :func:`constraint_report`'s distinct-count accounting there and
    quarantine on the keys that are plausibly unique.
    """
    out = df
    dup_marker: dict[int, str] = {}
    for i, c in enumerate(constraints):
        if c.distinct_col is None:
            continue
        col, m = c.distinct_col, f"_pgvs_dup{i}"
        dups = (
            df.groupBy(F.col(col).alias(f"{m}_v"))
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .select(f"{m}_v")
            .withColumn(m, F.lit(1))
        )
        out = out.join(dups, F.col(col) == F.col(f"{m}_v"), "left").drop(f"{m}_v")
        dup_marker[i] = m
    terms = []
    for i, c in enumerate(constraints):
        viol = (
            f"{dup_marker[i]} IS NOT NULL"
            if c.distinct_col is not None
            else c.violation_spark
        )
        terms.append(f"CASE WHEN {viol} THEN '{c.name}' END")
    arr = ", ".join(terms)
    joined = f"concat_ws(',', filter(array({arr}), x -> x IS NOT NULL))"
    return (
        out.selectExpr(*id_cols, f"{joined} AS reasons")
        .filter("reasons <> ''")
    )


def quarantine_rows_oracle_sql(
    table: str, constraints: list[Constraint], id_cols: list[str]
) -> str:
    _, joined = _reason_exprs(constraints, "duckdb")
    ids = ", ".join(id_cols)
    return (
        f"SELECT * FROM (SELECT {ids}, {joined} AS reasons FROM {table}) q "
        "WHERE reasons <> ''"
    )
