"""Verification orchestrator — the reference's top-level workflow in Spark.

Reference flow (``verify.go:23-88``): connect to every target, fan out one
goroutine per target, per table introspect columns + run each test mode,
merge scalar outputs into a mutex-guarded ``Results`` map, then check
consistency and render a pivoted report.

Spark inversion: each (target, table, mode) fingerprint is a 1-row
DataFrame; all of them are combined with ``unionByName`` into ONE logical
plan, so a single action executes every fingerprint and Spark's scheduler
provides the cross-target/cross-table parallelism the reference got from
goroutines (``verify.go:66-77``).  The merge step (``results.go:46-69``)
disappears into the union; the consistency check (``results.go:72-98``)
becomes a grouped distinct-count; the ASCII report (``results.go:101-166``)
becomes a pivot.

Scale: the union plan contains one scan per (table, mode).  Per-table
caching of the (k, h) projection is deliberately NOT default — at 100 TB
re-scanning parquet is usually cheaper than caching; pass
``cache_tables=True`` for small JDBC sources where the scan dominates.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgverify_spark.config import ERROR_OUTPUT, VerifyConfig
from pgverify_spark.operators.fingerprint import (
    FINGERPRINT_OPS,
    FUSABLE_MODES,
    fused_fingerprints,
)
from pgverify_spark.session import ensure_required_confs
from pgverify_spark.sources.parquet import ParquetTarget

RESULT_COLUMNS = ("target", "schema", "tbl", "mode", "output")


@dataclass
class VerifyResult:
    """Collected verification outcome (the reference's Results + errors)."""

    results: DataFrame  # (target, schema, tbl, mode, output)
    errors: list[str]
    #: the already-collected result rows — report() pivots these
    #: directly instead of re-collecting ``results`` (one scalar per
    #: cell by construction; re-collecting a local relation schedules a
    #: real job for nothing)
    rows: list = None

    @property
    def ok(self) -> bool:
        return not self.errors

    def report(self) -> DataFrame:
        """Pivoted report without re-collecting the local results
        relation (``WriteAsTable``, results.go:101-166)."""
        if self.rows is None:
            return report_table(self.results)
        return _report_from_rows(self.results.sparkSession, self.rows)


#: (target, schema, table, mode) identity of one fingerprint sub-plan.
Cell = tuple[str, str, str, str]


def _target_results(
    spark: SparkSession,
    target: ParquetTarget,
    config: VerifyConfig,
    name: str | None = None,
    plan_cache: dict | None = None,
) -> list[tuple[Cell, DataFrame]]:
    """Per-target fingerprint sub-plans (runTestsOnTarget, verify.go:90-106),
    each carrying its cell identity so a runtime failure can be pinned to
    the cell (the reference seeds every cell with "(err)" up front for
    the same reason, verify.go:108-136).  ``name`` is the reporting name
    (the configured alias when present, verify.go:46-48).

    ``plan_cache`` (shared across the targets of one ``verify()`` call)
    memoizes the *untagged* fingerprint DataFrames by the target's own
    ``cache_identity(table)`` (plus the mode tuple): two targets reading
    the same table the same way produce byte-identical sub-plans, and
    building the canonical-hash expression tree is the dominant
    driver-side cost of a small verify run.  Execution-side this is the
    same dedup Spark's ReusedExchange would do; caching just skips the
    redundant plan *construction*."""
    name = target.name if name is None else name
    parts: list[tuple[Cell, DataFrame]] = []
    for table in target.list_tables(spark, config):
        tag = lambda fp_df, mode, t=table: fp_df.select(
            F.lit(name).alias("target"),
            F.lit(target.schema).alias("schema"),
            F.lit(t).alias("tbl"),
            F.lit(mode).alias("mode"),
            F.col("fp").alias("output"),
        )
        if getattr(target, "use_pushdown", False):
            # Reference-style execution: the fingerprint SQL runs inside
            # the target database and one scalar comes back per cell
            # (sources/pushdown.py); Spark never reads the table.  Modes
            # the PG builders don't cover fall through to "(err)".
            for mode in config.test_modes:
                try:
                    fp = target.pushdown_fingerprint(spark, table, mode, config)
                except Exception:
                    fp = ERROR_OUTPUT
                cell = (name, target.schema, table, mode)
                parts.append(
                    (cell, tag(spark.createDataFrame([(fp,)], "fp string"), mode))
                )
            continue

        def err_cells(t=table):
            # no PK / unreadable table: the reference skips it with an
            # error, leaving the seeded "(err)" output in place
            # (verify.go:108-136, 194-198)
            return [
                (
                    (name, target.schema, t, mode),
                    tag(spark.createDataFrame([(ERROR_OUTPUT,)], "fp string"), mode),
                )
                for mode in config.test_modes
            ]

        try:
            # Memoization is gated on the target declaring its own cache
            # identity (ParquetTarget/FileTarget).  Building the key from
            # generic attributes here is wrong twice over: JDBC targets
            # have a different primary_key signature (calling it raised
            # inside this try, silently degrading every JDBC cell to
            # "(err)"), and a path-only key collides across formats or
            # reader options, which would compare a plan against itself.
            identity = (
                target.cache_identity(table)
                if hasattr(target, "cache_identity")
                else None
            )
            # Key by the FULL plan-shaping config, not just test_modes:
            # verify(plan_cache=...) lets a caller reuse one dict across
            # calls, and two configs differing in e.g. hash_primary_keys
            # or timestamp_precision produce different fingerprints for
            # the same table identity.
            cache_key = (
                None
                if identity is None
                else (identity, config.plan_cache_key())
            )
            fps: dict[str, DataFrame] | None = None
            if plan_cache is not None and cache_key is not None:
                fps = plan_cache.get(cache_key)
            if fps is None:
                schema = target.table_schema(spark, table)
                df = target.read(spark, table)
                # Mode fusion: full/rowcount/additive all aggregate the
                # same (k, h) projection, so when >1 of them is requested
                # they run as ONE scan + one aggregate
                # (fused_fingerprints); each cell's branch projects its
                # fp_<mode> column, and exchange reuse computes the shared
                # subplan once within the union's single action.  At
                # 100 TB this removes one full table scan per extra fused
                # mode — the dominant cost of a verify run.
                fused = tuple(m for m in config.test_modes if m in FUSABLE_MODES)
                fps = {}
                if len(fused) > 1:
                    fdf = fused_fingerprints(df, schema, config, fused)
                    for mode in fused:
                        fps[mode] = fdf.selectExpr(f"fp_{mode} AS fp")
                else:
                    fused = ()
                for mode in config.test_modes:
                    if mode not in fused:
                        fps[mode] = FINGERPRINT_OPS[mode](df, schema, config)
                if plan_cache is not None and cache_key is not None:
                    plan_cache[cache_key] = fps
            table_parts = [
                ((name, target.schema, table, mode), tag(fp_df, mode))
                for mode, fp_df in fps.items()
            ]
        except Exception:
            # schema inference / plan build already failed (missing PK,
            # corrupt footer, unsupported type)
            table_parts = err_cells()
        parts.extend(table_parts)
    return parts


def verify(
    spark: SparkSession,
    targets: list[ParquetTarget],
    config: VerifyConfig | None = None,
    plan_cache: dict | None = None,
) -> VerifyResult:
    """Run every (target, table, mode) fingerprint and check consistency.

    ``plan_cache``: optionally pass a dict that OUTLIVES this call to
    reuse fingerprint sub-plans across repeated verify() runs of the
    same targets (a long-running service / scheduled re-verification).
    Safe because a cached entry is a *plan*, not data — re-execution
    rescans the files — keyed on the target's full cache_identity
    (path, format, options, schema DDL, pk) plus the mode tuple.  The
    one staleness hazard is a file whose SCHEMA changes in place
    between calls; pass a fresh dict (or None, the default) when that
    can happen."""
    ensure_required_confs(spark)
    config = config or VerifyConfig()
    config.validate()
    # Per-target plan build fans out on driver threads — the reference's
    # goroutine-per-target (verify.go:66-77).  Execution parallelism comes
    # from Spark regardless; this overlaps the *metadata* work (JDBC
    # catalog/PK introspection round-trips, parquet footer reads), which
    # is serial, driver-side latency otherwise.
    from concurrent.futures import ThreadPoolExecutor

    # Reporting names: the configured aliases when the count matches the
    # target count, else the targets' own names (config.go:59-62,
    # verify.go:46-48 — a mismatched alias list is ignored).
    if config.aliases and len(config.aliases) == len(targets):
        names = list(config.aliases)
    else:
        names = [t.name for t in targets]
    parts: list[tuple[Cell, DataFrame]] = []
    # Shared across targets (and, when the caller passed one, across
    # verify() calls): races are benign (two threads may build the
    # same entry; last write wins with an equivalent plan).
    if plan_cache is None:
        plan_cache = {}
    with ThreadPoolExecutor(max_workers=min(8, max(1, len(targets)))) as pool:
        for sub in pool.map(
            lambda tn: _target_results(spark, tn[0], config, tn[1], plan_cache),
            zip(targets, names),
        ):
            parts.extend(sub)
    if not parts:
        raise ValueError("no tables to verify")
    plan = reduce(DataFrame.unionByName, [df for _, df in parts])
    # One action executes every fingerprint (the union's independent
    # branches run as concurrent stages).  The outcome is tiny by
    # construction — one scalar per (target, table, mode) — so collect it
    # and hand downstream consumers (error check, report pivot) a local
    # DataFrame; otherwise each consumer's action would re-execute every
    # fingerprint scan.
    try:
        rows = plan.collect()
    except Exception:
        # A runtime failure (corrupt file, unreadable column) aborts the
        # whole union action; re-run cells individually so the failure is
        # pinned to its cell as the "(err)" sentinel while every healthy
        # cell still reports — the reference's seeded-error semantics
        # (results.go:12, verify.go:131).
        rows = []
        for cell, df in parts:
            try:
                rows.extend(df.collect())
            except Exception:
                rows.append((*cell, ERROR_OUTPUT))
    results = spark.createDataFrame(
        [tuple(r) for r in rows], "target string, schema string, tbl string, mode string, output string"
    )
    # Error-check the rows already in hand — re-collecting the local
    # relation would launch a (tiny but real) extra Spark job.
    errors = _errors_from_rows(rows, expected_targets=names)
    return VerifyResult(results=results, errors=errors, rows=rows)


def check_for_errors(results: DataFrame, expected_targets: list[str]) -> list[str]:
    """Consistency check (``(*Results).CheckForErrors``, results.go:72-98).

    Errors when a (schema, tbl, mode) cell has >1 distinct output, a
    target is missing, or any output is the ``(err)`` sentinel.  The
    result set is one scalar per (target, table, mode) by construction,
    so the check is plain driver-side Python — launching Spark jobs over
    a dozen rows would cost more in scheduling than the work itself.
    """
    return _errors_from_rows(results.collect(), expected_targets)


def _errors_from_rows(rows, expected_targets: list[str]) -> list[str]:
    """check_for_errors over already-collected (target, schema, tbl,
    mode, output) rows — Row objects or plain tuples (the cell-pinned
    error fallback emits tuples), hence positional access."""
    cells: dict[tuple[str, str, str], tuple[set, set]] = {}
    for r in rows:
        target, schema, tbl, mode, output = r[0], r[1], r[2], r[3], r[4]
        targets, outputs = cells.setdefault((schema, tbl, mode), (set(), set()))
        targets.add(target)
        outputs.add(output)
    errors: list[str] = []
    for (schema, tbl, mode), (targets, outputs) in sorted(cells.items()):
        cell = f"{schema}.{tbl} mode={mode}"
        if ERROR_OUTPUT in outputs:
            errors.append(
                f"{cell}: test failed on at least one target ({sorted(targets)})"
            )
        if len(outputs) > 1:
            errors.append(f"{cell}: outputs differ across targets: {sorted(outputs)}")
        if len(targets) < len(expected_targets):
            missing = sorted(set(expected_targets) - targets)
            errors.append(f"{cell}: missing targets {missing}")
    return errors


def report_table(results: DataFrame) -> DataFrame:
    """Pivoted report: one row per (schema, tbl, target), one column per
    mode, sorted on all columns (``WriteAsTable``, results.go:101-166).

    Pivoted driver-side: ``groupBy().pivot()`` without explicit values
    runs an extra distinct job just to discover the mode columns, and the
    input is a tiny scalar-per-cell set by construction.
    """
    return _report_from_rows(results.sparkSession, results.collect())


def _report_from_rows(spark: SparkSession, rows) -> DataFrame:
    """Pivot already-collected (target, schema, tbl, mode, output) rows
    (Row objects or plain tuples, hence positional access)."""
    modes = sorted({r[3] for r in rows})
    cells: dict[tuple[str, str, str], dict[str, str]] = {}
    for r in rows:
        cells.setdefault((r[1], r[2], r[0]), {})[r[3]] = r[4]
    out = sorted(
        ((*key, *[cell.get(m) for m in modes]) for key, cell in cells.items()),
        key=lambda t: tuple((v is None, v) for v in t),
    )
    fields = ", ".join(
        f"{name} string" for name in ("schema", "tbl", "target", *modes)
    )
    return spark.createDataFrame(out, fields)
