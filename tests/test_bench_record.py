"""bench.py compact-record contract: the single JSON stdout line must
always fit the driver's tail window — measured at EXACTLY 2000 bytes
(BENCH_r06 and BENCH_r07 "tail" fields are both precisely 2000 bytes,
archived mid-key) — and stay self-contained."""

import json

from bench import COMPACT_LIMIT, compact_record

#: The real, measured driver archive window.  COMPACT_LIMIT must sit
#: strictly below it with headroom for the trailing newline.
DRIVER_TAIL_BYTES = 2000


def test_compact_limit_fits_real_driver_tail():
    assert COMPACT_LIMIT <= DRIVER_TAIL_BYTES - 100


def _out(timings):
    return {
        "metric": "pgverify_spark headline suite wall time",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": 0.1,
        "subtotals": {"r1_15_queries": 15.55, "n_queries": len(timings)},
        "oracle_value": 83.04,
        "oracle_queries": {q: 1.0 for q in timings},
        "spark_vs_oracle_ratio": 0.89,
    }


def test_compact_record_small_suite_keeps_everything():
    timings = {f"q{i}": 0.1 * i for i in range(1, 6)}
    rec = json.loads(compact_record(_out(timings), timings))
    assert rec["queries"] == {q: round(t, 3) for q, t in timings.items()}
    assert "queries_omitted" not in rec
    assert "oracle_queries" not in rec  # full dict never in the compact line


def test_compact_record_fits_limit_at_r6_scale_and_beyond():
    # 120 queries with realistically long registry names — worse than the
    # 72-query r6 suite that overflowed.
    timings = {
        f"full_fingerprint_variant_{i:03d}_documents_roundtrip": 0.05 + (i % 40) / 10
        for i in range(120)
    }
    line = compact_record(_out(timings), timings)
    assert len(line) <= COMPACT_LIMIT
    rec = json.loads(line)
    # totals stay reconstructible: kept + omitted == suite total
    omitted = rec.get("queries_omitted", {"n": 0, "sec": 0.0})
    assert omitted["n"] + len(rec["queries"]) == len(timings)
    assert abs(sum(rec["queries"].values()) + omitted["sec"] - rec["value"]) < 0.01
    # headline fields survive compaction
    for key in ("value", "sf", "subtotals", "oracle_value", "spark_vs_oracle_ratio"):
        assert key in rec
    # every kept entry is at least as expensive as every omitted one
    if rec["queries"]:
        assert min(rec["queries"].values()) >= omitted.get("below_sec", 0.0) - 1e-9
