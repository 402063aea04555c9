"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``

Times each headline query end-to-end (plan + execute + collect) on a
warm SparkSession.  Warm-up: a trivial job (executor spin-up) plus one
run of every headline query at sf0.001, which populates the JVM's
whole-stage-codegen cache for each plan shape — so numbers reflect
steady-state query execution (what a long-running cluster sees), not
one-time JIT/analysis cost.  The target-SF data itself stays cold.

PROTOCOL (FROZEN as of round 4 — do not change; per-query comparisons
are valid r4-onward only): warm-up as above, then per query min of two
timed runs, ``spark.catalog.clearCache()`` between queries.  The same
headline queries' DuckDB oracle twins are timed in one pass on the same
parquet at the same SF (threads = SPARK_GRAFT_CPUS) and reported as
``oracle_value`` / ``oracle_queries`` so the Spark:oracle ratio is
self-contained in each round's BENCH output.  Set
``SPARK_GRAFT_SKIP_ORACLE=1`` to skip the oracle pass.

AMENDMENT (round 12, r11 VERDICT item 7): default replicates 2 -> 3
(``SPARK_GRAFT_BENCH_REPS``).  Headline numbers stay the per-query MIN
across replicates, so r4-onward comparability is preserved; only the
recorded ratio band tightens.

AMENDMENT (round 6, r5 ADVICE item 1): the stored-index ANN entries
(registry.bench_oracle_setup()) memoize their index build Spark-side,
so their min-of-two times a pure probe; their DuckDB twins are now
timed the same way — the build is materialized ONCE untimed and the
timed SQL probes the stored relations.  Ratios for those three rows
are probe-vs-probe from r6 on (r4/r5 compared Spark probe to DuckDB
build+probe, flattering Spark).

Output: exactly ONE JSON line (the driver archives only the stdout
tail, and a second full record pushed the compact one out of the
window in r4).  Set ``SPARK_GRAFT_BENCH_FULL=1`` to also print the
full record with per-query oracle timings as a PRECEDING line.

NOISE BAND (measured r9, closing the r8 "+14% r1_15 drift" question):
a controlled A/B (suite with vs without the in-JVM embedded-Derby
entry, plus a same-config replicate, idle host, oracle pass skipped)
measured A=12.58 / B1=13.41 / B2=12.07 s on the r1_15 subtotal and
53.7 / 57.6 / 50.4 s on the total — the IDENTICAL-config replicate
pair (B1 vs B2) swings wider than the with/without-Derby delta, so
the Derby build does NOT tax the suite and round-over-round subtotal
moves within ~±11% are run noise.  The noise is concentrated in the
three LSH/semantic-dedup entries (±2 s each, cache/GC-timing
sensitive); single-query deltas under ~2x should not be read as
regressions without a replicate.  ``SPARK_GRAFT_SKIP_QUERIES`` (comma-
separated names) is the builder-side A/B control — never set in
driver/recorded runs.

Same-code spread, late-r9 (four full clean runs of the identical
83-query suite over one afternoon, idle host, full protocol):
spark_vs_oracle_ratio 0.68 / 0.75 / 0.81 / 0.88, r1_15 subtotal
11.0-15.2 s.  The single-run ratio is a coarse instrument; judge
round-over-round movement against this band, and per-query claims
against SCALE_CHECK's replicated probes.

r10 re-measurement of the spread (three clean runs of the grown
86/89-query suite in one day): 0.81 / 1.08 / 0.92 — wider than the r9
band, and the DuckDB oracle total itself moved 85.1 -> 91.0 s between
runs, i.e. the HOST drifted, not the code (the flagged per-query moves
were all in the documented noise-sensitive LSH/iterative entries, and
no move survived a replicate).  Same conclusion, stronger: single-run
ratios are weather; cross-run deltas under ~1.35x are not evidence.

Late-r10 points after the suite grew to 102-106 entries (sketch
family, attribution family, HLL-IVM, the cardinality mode): three
clean runs 88.8/108.0 -> 0.82, 94.1/107.5 -> 0.88, 99.0/105.5 -> 0.94
— inside the published band; the Spark total creeps with suite growth
(the third run includes attribution_report and json_profile rows) while
the oracle total holds, the expected composed-entry constant.

Round-11 builder point (first run under the replicate protocol, idle
host, suite grown 107 -> 110): Spark 94.4 s vs DuckDB 103.7 s ->
ratio 0.91, band [0.906, 1.073] from the two passes.  The r10 flagged
rows all resolved: sparse_fingerprint 1.05 s (the 1.70 "regression"
was weather, as the replicate predicted), equidepth_histogram and
attribution_report both under the 1.0 s compact cutoff (the latter
after the lazy-sharing A/B — see funnel.attribution_report),
incident_report 3.29 s with its shared-diff persist.

AMENDMENT (round 11, r10 VERDICT item 6): REPLICATES.  Single-run
ratios are weather (see the spread notes above), so the recorded run
now repeats the whole frozen per-pass protocol ``SPARK_GRAFT_BENCH_REPS``
times (default 2; set 1 for quick builder iteration) with alternating
Spark/oracle passes.  Headline per-query numbers and the
``spark_vs_oracle_ratio`` come from the per-query MIN across
replicates (the least-noise estimate of steady-state cost); the new
``ratio_min`` / ``ratio_max`` fields carry each replicate pass's own
ratio, so a round-over-round move outside the recorded band is
evidence while a move inside it is noise — judged from ONE bench
record instead of hand-run replicates.  The per-pass protocol itself
is unchanged (warm-up, min of two timed runs, clearCache between
queries), so per-query history stays comparable r4-onward.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


#: Compact-line byte budget.  The driver archives EXACTLY the last
#: 2000 bytes of stdout (measured: BENCH_r06 and BENCH_r07 "tail"
#: fields are both precisely 2000 bytes, decapitated mid-key — the
#: earlier "~4 KB window" guess was wrong by 2x).  1800 leaves 200
#: bytes of headroom for the trailing newline / stray log bytes so the
#: archived record parses ("parsed" non-null) and per-query history
#: survives in the round archive.
COMPACT_LIMIT = 1800


def compact_record(out: dict, timings: dict[str, float], limit: int = COMPACT_LIMIT) -> str:
    """One self-contained JSON line that always fits the driver's tail.

    Starts from the full record minus the per-query oracle dict, then —
    only if needed — drops per-query Spark timings below an escalating
    cutoff, folding them into a ``queries_omitted`` summary (count +
    summed seconds) so the total stays reconstructible.  Totals,
    subtotals, oracle total and the ratio are never dropped."""
    compact = {k: v for k, v in out.items() if k != "oracle_queries"}
    for cutoff in (0.0, 0.3, 0.5, 0.75, 1.0, 2.0, None):
        # cutoff None = the everything-dropped fallback: queries == {}
        # and no float('inf') leaks into the record (json.dumps renders
        # Infinity, which strict JSON parsers reject)
        kept = (
            {} if cutoff is None
            else {q: round(t, 3) for q, t in timings.items() if t >= cutoff}
        )
        compact["queries"] = kept
        compact.pop("queries_omitted", None)
        if len(kept) < len(timings):
            omitted_sec = sum(t for q, t in timings.items() if q not in kept)
            compact["queries_omitted"] = {
                "n": len(timings) - len(kept),
                "sec": round(omitted_sec, 3),
            }
            if cutoff is not None:
                compact["queries_omitted"]["below_sec"] = cutoff
        line = json.dumps(compact)
        if len(line) <= limit:
            return line
    return line


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from pgverify_spark import registry
    from pgverify_spark.session import get_spark

    spark = get_spark("pgverify-spark-bench")
    spark.range(1_000_000).select("id").summary().collect()  # warm up executors

    queries = registry.spark_queries()
    headline = [name for name in registry.HEADLINE_QUERIES if name in queries]
    # Builder-side A/B control (r8 VERDICT item 1: isolate whether the
    # in-JVM embedded-Derby build taxes the rest of the suite).  NOT
    # part of the frozen protocol — when unset (the driver's run, every
    # recorded BENCH_r*.json) the suite is unchanged.
    skip = {
        q.strip()
        for q in os.environ.get("SPARK_GRAFT_SKIP_QUERIES", "").split(",")
        if q.strip()
    }
    if skip:
        headline = [name for name in headline if name not in skip]

    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name in headline:  # compile each plan shape (codegen cache)
            queries[name](spark, warm_dir).collect()
        spark.catalog.clearCache()

    def spark_pass() -> dict[str, float]:
        # Two timed runs per query, keep the faster: run 1 absorbs
        # one-time session costs against the target SF (file-index
        # listing, plan-stats analysis), run 2 is steady state; min()
        # also damps GC noise.  clearCache between queries: several
        # operators persist load-bearing intermediates (LSH shingles,
        # signatures); queries are independent, so letting ~50 queries'
        # blocks accumulate only adds GC/eviction noise to later
        # timings (measured ~15% suite-level inflation).
        t: dict[str, float] = {}
        for name in headline:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                queries[name](spark, sf_dir).collect()
                best = min(best, time.perf_counter() - t0)
            t[name] = round(best, 4)
            spark.catalog.clearCache()
        return t

    oracle_con = None

    def oracle_pass() -> dict[str, float]:
        # The identical DuckDB twins on the identical parquet, min of
        # two timed runs each (mirrors the Spark protocol; the OS page
        # cache is warm from the Spark pass either way).
        nonlocal oracle_con
        import duckdb

        if oracle_con is None:
            oracle_con = duckdb.connect()
            oracle_con.execute(
                f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}"
            )
            for t in (
                "region nation customer supplier part orders lineitem events "
                "documents embeddings".split()
            ):
                oracle_con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')"
                )
            # Stored-index ANN rows: build the DuckDB index relations
            # once, untimed; every pass times the probe-only twin —
            # like-for-like with the Spark side's memoized stored index
            # (see PROTOCOL AMENDMENT r6).
            for name in headline:
                if name in probe_twins:
                    for stmt in probe_twins[name][0]:
                        oracle_con.execute(stmt)
                    break
        t: dict[str, float] = {}
        for name in headline:
            sql = probe_twins[name][1] if name in probe_twins else oracles.get(name)
            if sql is None:
                continue
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                oracle_con.execute(sql).fetchall()
                best = min(best, time.perf_counter() - t0)
            t[name] = round(best, 4)
        return t

    oracles = registry.oracle_queries()
    probe_twins = registry.bench_oracle_setup()
    skip_oracle = bool(os.environ.get("SPARK_GRAFT_SKIP_ORACLE"))
    # default 3 from r12 (r11 VERDICT item 7): the reps=2 band was wide
    # enough (0.911-1.300) to flag noise as regression; a third rep
    # tightens it at ~+50% bench cost.  Min semantics are unchanged, so
    # per-query comparisons remain valid across rounds.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

    # REPLICATES (r11 amendment): alternate full Spark/oracle passes so
    # host drift hits both engines alike; headline numbers are the
    # per-query min across replicates, the band is the per-pass ratios.
    spark_reps: list[dict[str, float]] = []
    oracle_reps: list[dict[str, float]] = []
    for _ in range(reps):
        spark_reps.append(spark_pass())
        if not skip_oracle:
            oracle_reps.append(oracle_pass())
    timings = {
        name: round(min(t[name] for t in spark_reps), 4) for name in headline
    }
    oracle_timings = (
        {
            name: round(min(t[name] for t in oracle_reps), 4)
            for name in oracle_reps[0]
        }
        if oracle_reps
        else {}
    )

    # Like-for-like subtotal over the round-1 15-query suite, so
    # round-over-round totals stay comparable as the suite widens.
    r1_suite = (
        "full_fingerprint_lineitem bucketed_fingerprint_lineitem "
        "bookend_fingerprint_lineitem sparse_fingerprint_lineitem "
        "rowcount_fingerprint_lineitem full_fingerprint_orders "
        "row_diff_orders verify_report_two_targets "
        "minhash_lsh_pairs_documents ngram_jaccard_pairs_documents "
        "simhash_near_pairs_documents cosine_topk_embeddings "
        "text_stats_documents multimodal_features_documents "
        "hourly_rollup_events"
    ).split()

    out = {
        "metric": "pgverify_spark headline suite wall time",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "reps": reps,
        "subtotals": {
            "r1_15_queries": round(
                sum(timings[q] for q in r1_suite if q in timings), 4
            ),
            "n_queries": len(timings),
        },
    }
    if oracle_timings:
        out["oracle_value"] = round(sum(oracle_timings.values()), 4)
        out["oracle_queries"] = oracle_timings
        common = [q for q in timings if q in oracle_timings]
        spark_common = sum(timings[q] for q in common)
        oracle_common = sum(oracle_timings[q] for q in common)
        out["spark_vs_oracle_ratio"] = round(
            spark_common / oracle_common, 4
        ) if oracle_common else None
        # per-pass ratio band: pass i's Spark total over pass i's oracle
        # total on the common set — each point a self-consistent run, so
        # the band brackets what single-run weather looks like TODAY
        pass_ratios = []
        for s_t, o_t in zip(spark_reps, oracle_reps):
            s = sum(s_t[q] for q in common)
            o = sum(o_t[q] for q in common)
            if o:
                pass_ratios.append(round(s / o, 4))
        if pass_ratios:
            out["ratio_min"] = min(pass_ratios)
            out["ratio_max"] = max(pass_ratios)
    # The driver archives only the last ~4 KB of stdout and consumers
    # parse one-JSON-record-per-run, so emit exactly ONE line: the
    # compact record (no per-query oracle dict; cheap per-query Spark
    # timings folded into a queries_omitted summary whenever the line
    # would outgrow the tail window — BENCH_r06 archived mid-key at 72
    # queries).  The full record is opt-in and printed FIRST so the
    # tail line stays the compact one.
    if os.environ.get("SPARK_GRAFT_BENCH_FULL"):
        print(json.dumps(out))
    print(compact_record(out, timings))
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
