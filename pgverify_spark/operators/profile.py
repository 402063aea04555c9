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
from pyspark.sql import functions as F

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


#: Benford expected first-significant-digit shares in exact ppm:
#: round(log10(1 + 1/d) * 1e6).  Precomputed Python-side so neither
#: engine evaluates a transcendental at query time (the repo-wide
#: cross-engine-exactness rule); both dialects consume identical
#: integer literals.
BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910,
    5: 79181, 6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


def _first_digit_sql(col: str) -> str:
    """First significant digit of |col| via string inspection — no
    logs, no floats: strip sign/zeros/dot from the canonical decimal
    rendering and take the first digit char (identical semantics in
    Spark and DuckDB; 0/NULL rows are excluded by the caller)."""
    s = f"regexp_replace(CAST(abs(CAST({col} AS DECIMAL(38,6))) AS VARCHAR), '[.0]*', '')"
    return f"CAST(substr({s}, 1, 1) AS INT)"


def benford_audit(df: DataFrame, col: str) -> DataFrame:
    """First-significant-digit distribution of ``col`` vs Benford's law
    — the classic forensic screen for fabricated, truncated or
    unit-mangled numeric data (real multiplicative quantities follow
    log-uniform digit shares; synthetic or clipped ones don't).

    Output: one row per digit 1-9 with (digit, n, observed_ppm,
    expected_ppm, dev_ppm); dev summed /2e6 is the total-variation
    distance from Benford.  Zero/NULL values carry no leading digit and
    are excluded from the denominator.

    Scale shape: one scan collapsing to ≤ 9 partial rows per task
    (map-side combine), then constant-size arithmetic — the same
    constant-output-aggregate family as the fingerprints.  Digits come
    from the canonical decimal STRING, so no engine evaluates log10 at
    query time (expected shares are integer literals).
    """
    fd = _first_digit_sql(col).replace("VARCHAR", "STRING")
    counts = (
        df.filter(f"{col} IS NOT NULL AND CAST({col} AS DECIMAL(38,6)) <> 0")
        .selectExpr(f"{fd} AS digit")
        .groupBy("digit")
        .count()
    )
    expected = ", ".join(f"{d}, {p}" for d, p in sorted(BENFORD_PPM.items()))
    return (
        counts.selectExpr(
            "digit",
            "count AS n",
            "CAST(count * 1000000 DIV greatest(sum(count) OVER (), 1) AS BIGINT)"
            " AS observed_ppm",
            f"CAST(element_at(map({expected}), digit) AS BIGINT) AS expected_ppm",
        )
        .selectExpr(
            "digit", "n", "observed_ppm", "expected_ppm",
            "abs(observed_ppm - expected_ppm) AS dev_ppm",
        )
    )


def benford_audit_oracle_sql(table: str, col: str) -> str:
    fd = _first_digit_sql(col)
    cases = " ".join(
        f"WHEN digit = {d} THEN {p}" for d, p in sorted(BENFORD_PPM.items())
    )
    return (
        f"WITH c AS (SELECT {fd} AS digit, count(*) AS n FROM {table} "
        f"WHERE {col} IS NOT NULL AND CAST({col} AS DECIMAL(38,6)) <> 0 "
        "GROUP BY 1), "
        "p AS (SELECT digit, n, "
        "CAST(n * 1000000 // greatest(sum(n) OVER (), 1) AS BIGINT) AS observed_ppm, "
        f"CAST(CASE {cases} END AS BIGINT) AS expected_ppm FROM c) "
        "SELECT digit, n, observed_ppm, expected_ppm, "
        "abs(observed_ppm - expected_ppm) AS dev_ppm FROM p"
    )


def fd_violations(df: DataFrame, det: str, dep: str) -> DataFrame:
    """Functional-dependency check ``det -> dep``: does each determinant
    value map to exactly one dependent value?  The structural QA that
    catches denormalization drift (one order number with two dates, one
    user with two countries) that no single-column profile can see.

    Output: ONE row (n_keys, n_violating_keys, max_variants,
    n_rows_in_violation).

    Scale shape: one (det, dep)-distinct aggregate with map-side
    combine, a per-det count over that reduced relation, and a 1-row
    summary — the determinant's distinct cardinality bounds every
    post-scan relation.
    """
    from pyspark.sql import functions as F

    per_det = (
        df.selectExpr(f"{det} AS det", f"{dep} AS dep")
        .distinct()
        .groupBy("det")
        .agg(F.count(F.lit(1)).alias("variants"))
    )
    rows_per_det = df.selectExpr(f"{det} AS det").groupBy("det").count()
    j = per_det.join(rows_per_det, "det")
    return j.agg(
        F.expr("CAST(count(*) AS BIGINT) AS n_keys"),
        F.expr(
            "CAST(sum(CASE WHEN variants > 1 THEN 1 ELSE 0 END) AS BIGINT)"
            " AS n_violating_keys"
        ),
        F.expr("CAST(coalesce(max(variants), 0) AS BIGINT) AS max_variants"),
        F.expr(
            "CAST(coalesce(sum(CASE WHEN variants > 1 THEN count ELSE 0 END), 0)"
            " AS BIGINT) AS n_rows_in_violation"
        ),
    )


def fd_violations_oracle_sql(table: str, det: str, dep: str) -> str:
    return (
        f"WITH pd AS (SELECT det, count(*) AS variants FROM "
        f"(SELECT DISTINCT {det} AS det, {dep} AS dep FROM {table}) x GROUP BY det), "
        f"rp AS (SELECT {det} AS det, count(*) AS n FROM {table} GROUP BY 1) "
        "SELECT CAST(count(*) AS BIGINT) AS n_keys, "
        "CAST(sum(CASE WHEN variants > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_keys, "
        "CAST(coalesce(max(variants), 0) AS BIGINT) AS max_variants, "
        "CAST(coalesce(sum(CASE WHEN variants > 1 THEN n ELSE 0 END), 0) AS BIGINT) "
        "AS n_rows_in_violation "
        "FROM pd JOIN rp USING (det)"
    )


def json_profile(df: DataFrame, col: str = "props") -> DataFrame:
    """Schema profile of a semi-structured JSON column: one row per
    top-level key — (key, n, n_null, n_distinct, min_v, max_v) with
    values compared in their string rendering — the drift monitor for
    the part of the table that has NO schema: a producer that starts
    emitting a new key, nulling one out, or re-typing values shows up
    as a new/changed row here while the relational profile stays blind.

    Scale shape: one scan, ``from_json`` to ``map<string,string>`` and
    a map explode (fan-out = keys per row, the data's own size), then
    ONE hash aggregate on key with map-side combine; distinct counts
    ride the same aggregate (Spark plans count(DISTINCT) as a two-level
    expand — still key-partitioned, no extra scan).  Rows whose JSON
    fails to parse contribute nothing (both engines' semantics).

    Oracle: DuckDB ``json_keys`` + ``unnest`` + dynamic-path
    ``json_extract_string`` — keys containing double quotes would break
    that path spelling; the contract assumes sane key names.

    Duplicate-key convention (FIRST WINS, both engines): a
    (pathological but valid) object like ``{"a":1,"a":2}`` counts the
    key ONCE per row and contributes its FIRST value.  Spark 4's
    ``from_json(map<...>)`` silently RETAINS duplicate entries (the
    ``mapKeyDedupPolicy`` conf does not apply to the JSON parser), so
    a bare explode double-counted the key and saw both values while
    DuckDB's ``json_extract_string`` returns only the first — the
    keep-first fold below dedups per row JVM-side (higher-order
    ``aggregate``/``exists`` over ``map_entries`` — per-row, O(k²) in
    keys-per-row, NO shuffle added), and the oracle's rid+DISTINCT
    mirrors the count-once half.
    """
    entry_t = "ARRAY<STRUCT<key: STRING, value: STRING>>"
    dedup_first = (
        f"aggregate(map_entries(from_json({col}, 'map<string,string>')), "
        f"CAST(array() AS {entry_t}), "
        "(acc, e) -> CASE WHEN exists(acc, x -> x.key = e.key) "
        "THEN acc ELSE array_append(acc, e) END)"
    )
    pairs = df.selectExpr(f"inline({dedup_first}) AS (key, v)")
    return pairs.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)").alias("n_null"),
        F.expr("CAST(count(DISTINCT v) AS BIGINT)").alias("n_distinct"),
        F.expr("min(v)").alias("min_v"),
        F.expr("max(v)").alias("max_v"),
    )


def json_profile_oracle_sql(table: str, col: str = "props") -> str:
    return (
        # json_valid guard = Spark's from_json-returns-NULL semantics
        # (malformed rows contribute nothing); rid + DISTINCT makes
        # duplicate top-level keys count once PER ROW — matching the
        # Spark side's keep-first fold — without collapsing distinct
        # rows that happen to carry identical JSON text
        f"WITH rows_ AS (SELECT row_number() OVER () AS rid, {col} "
        f"FROM {table} WHERE json_valid({col})), "
        f"keyed AS (SELECT DISTINCT rid, {col}, unnest(json_keys({col})) AS key "
        "FROM rows_), "
        f"pairs AS (SELECT key, json_extract_string({col}, "
        "'$.\"' || key || '\"') AS v FROM keyed) "
        "SELECT key, CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, "
        "CAST(count(DISTINCT v) AS BIGINT) AS n_distinct, "
        "min(v) AS min_v, max(v) AS max_v "
        "FROM pairs GROUP BY key"
    )
