"""Deterministic sampling operators for training-data pipelines.

Beyond-reference extensions (the reference verifies tables, it does not
curate them): reproducible corpus sampling.  Random sampling is wrong
for verification and for reproducible dataset curation — two runs (or
two engines) would pick different rows — so selection is content-hashed:
a row is kept iff the first 48 bits of ``md5(key)`` fall under the
per-stratum rate.  The same construction as the reference's sparse
fingerprint sampler (``query.go:163-229``; here per-stratum and
rate-based rather than mod-based).

Scale shape: a pure filter + projection — no shuffle, no sort, no state.
The scan prunes to the key/stratum columns plus whatever the caller
projects; the md5 predicate is evaluated JVM-side in whole-stage codegen
and the filter collapses the output to ~rate x input before anything
else happens.  At 100 TB this is the cheapest possible operator shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pgverify_spark.functions.canonical import (
    DIALECT_DUCKDB,
    DIALECT_SPARK,
    hex_prefix_int_sql,
)

#: Selection-space denominator: rates are applied as integer thresholds
#: out of 2^20 buckets, so a rate is honored to ~1e-6 resolution and the
#: threshold arithmetic is exact (no float comparison at the boundary).
_BUCKETS = 1 << 20


def _keep_sql(key_col: str, rate_expr: str, dialect: str) -> str:
    """Deterministic keep-predicate: hash-bucket(key) < rate * 2^20."""
    cast = "STRING" if dialect == DIALECT_SPARK else "VARCHAR"
    sel = hex_prefix_int_sql(f"md5(CAST({key_col} AS {cast}))", dialect)
    return f"({sel} % {_BUCKETS}) < {rate_expr}"


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sample: keep each row of stratum ``s``
    with probability ``rates.get(s, default_rate)``, selected by content
    hash of ``key_col`` (reproducible across runs, engines and cluster
    layouts).

    The standard curation move for mixing training data (e.g. downsample
    ``lang='en'`` to 10 %, keep all ``lang='de'``): one declarative
    filter, so Catalyst pushes the stratum test into the scan and
    partition-prunes when the source is partitioned by the stratum.
    """
    return df.filter(_sample_predicate(key_col, strata_col, rates, default_rate, DIALECT_SPARK))


def _sample_predicate(
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float,
    dialect: str,
) -> str:
    cast = "STRING" if dialect == DIALECT_SPARK else "VARCHAR"
    branches = " ".join(
        f"WHEN CAST({strata_col} AS {cast}) = '{s}' THEN {int(r * _BUCKETS)}"
        for s, r in sorted(rates.items())
    )
    threshold = f"(CASE {branches} ELSE {int(default_rate * _BUCKETS)} END)"
    return _keep_sql(key_col, threshold, dialect)


def stratified_sample_oracle_sql(
    table: str,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> str:
    pred = _sample_predicate(key_col, strata_col, rates, default_rate, DIALECT_DUCKDB)
    return f"SELECT * FROM {table} WHERE {pred}"
