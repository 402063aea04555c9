"""Registry-wide physical-plan audit: the 100 TB guardrails, asserted.

Every registered query's executed plan is checked for the three shapes
that silently stop scaling long before they stop working:

- ``CartesianProduct`` — an O(n*m) join that no cluster size saves.
- A ``Window`` fed directly by ``Exchange SinglePartition`` — a global
  sort/rank that collapses the table onto one reducer.
- ``BatchEvalPython`` — a row-at-a-time Python UDF on the executor hot
  path (Arrow-batched ``ArrowEvalPython``/``MapInPandas`` are fine).

Operators that *deliberately* keep a small-relation or baseline shape
are whitelisted with the reason inline — the test exists so the next
operator added can't regress the fleet silently.
"""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entry

#: name -> reason. A whitelisted query may exhibit WINDOW_SINGLE.
WINDOW_SINGLE_OK = {
    # sum(n) OVER () runs over the per-source counts relation:
    # |sources| rows by construction, never the corpus.
    "mixture_sample_documents": "window over #sources-row aggregate",
    # same shape with n = per-source token sums
    "token_mixture_sample_documents": "window over #sources-row aggregate",
    # exact ntile baseline kept next to the approx_percentile scale
    # path documented in topk.py.
    "equidepth_histogram_orders": "exact ntile baseline",
    # sum(n) OVER () runs over the first-digit counts relation:
    # ≤ 9 rows by construction (digits 1-9), never the corpus.
    "benford_audit_orders": "window over ≤9-row digit-count aggregate",
    # sum(n) OVER () runs over the per-bucket counts relation:
    # ≤ buckets+1 rows by construction, never the corpus.
    "distribution_drift_orders": "window over ≤buckets-row aggregate",
    # rank window runs over the rate_ppm hash-threshold sample, never
    # the corpus (membership is a pure row predicate pushed to the scan).
    "sampled_quantiles_orders": "window over rate-bounded deterministic sample",
    # same rank window, reading the persisted rate-bounded sample store
    "streaming_sampled_quantiles_orders": "window over rate-bounded sample store",
}


def _window_over_single(plan: str) -> bool:
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if re.search(r"\bWindow(GroupLimit)?\b", ln):
            for j in range(i + 1, min(i + 4, len(lines))):
                if "Exchange SinglePartition" in lines[j]:
                    return True
    return False


@pytest.mark.parametrize("name", sorted(entry.queries()))
def test_plan_guardrails(name, spark, sf_dir):
    df = entry.queries()[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian join"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    if name not in WINDOW_SINGLE_OK:
        assert not _window_over_single(plan), (
            f"{name}: Window over Exchange SinglePartition — global "
            "single-reducer sort/rank"
        )


def test_registry_name_lists_resolve():
    """Every name in the driver-priority rotation and the bench headline
    must exist in the registry — _entries() and bench.py skip unknown
    names SILENTLY, so a typo would quietly drop a query from the
    driver's correctness window or the bench suite."""
    from pgverify_spark.registry import _DRIVER_PRIORITY, HEADLINE_QUERIES

    names = set(entry.queries())
    missing_priority = [n for n in _DRIVER_PRIORITY if n not in names]
    missing_headline = [n for n in HEADLINE_QUERIES if n not in names]
    assert not missing_priority, f"priority names not in registry: {missing_priority}"
    assert not missing_headline, f"headline names not in registry: {missing_headline}"
    # no duplicates either (a duplicate would double-count bench time)
    assert len(set(HEADLINE_QUERIES)) == len(HEADLINE_QUERIES)
    assert len(set(_DRIVER_PRIORITY)) == len(_DRIVER_PRIORITY)


def test_no_decimal_output_columns():
    """Render-hazard lint: no oracle-paired query may emit a DECIMAL
    output column.  The driver's order-insensitive value hash renders a
    DECIMAL cell through float on one side only, so any cell whose
    decimal string carries trailing zeros (``Decimal('239577.7750')``
    vs ``239577.775``) hash-mismatches even when the values are exactly
    equal — the CORRECTNESS_r03 failure mode (a perfect 7/43
    discriminator across that round's window).  Terminal outputs must
    cast to DOUBLE (see registry._DOUBLE_OUTPUT_COLS); internal
    arithmetic stays DECIMAL-exact."""
    import duckdb

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    hazards = {}
    for name, sql in entry.oracle_sql().items():
        rel = con.sql(f"SELECT * FROM ({sql}) _q LIMIT 0")
        dec = [
            (c, str(ty))
            for c, ty in zip(rel.columns, rel.types)
            if "DECIMAL" in str(ty)
        ]
        if dec:
            hazards[name] = dec
    assert not hazards, (
        "oracle output schemas contain DECIMAL columns (driver render "
        f"hazard — cast terminal outputs to DOUBLE in both twins): {hazards}"
    )


def test_oracle_paired_except_documented():
    """Exactly two registry entries are rows-only by nature (stateful
    streaming fingerprint, iterative BPE learner); everything else must
    carry a DuckDB oracle twin."""
    unpaired = sorted(set(entry.queries()) - set(entry.oracle_sql()))
    assert unpaired == [
        "bpe_merges_documents",
        "streaming_stateful_bucket_fingerprint_events",
    ]
