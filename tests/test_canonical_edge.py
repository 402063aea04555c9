"""Adversarial canonicalization parity: Spark and DuckDB must produce
byte-identical fingerprints on values far outside the tame testdata —
NaN / ±Inf / -0.0, extreme magnitudes, unicode and control characters,
NULLs in every column, empty strings and arrays.  A single divergent
canonical string flips the whole-table fingerprint, so these run the
real ``full``/``additive`` operators end-to-end on a parquet fixture
read by both engines.
"""

import math

import pytest

from pgverify_spark.config import VerifyConfig
from pgverify_spark.operators.fingerprint import (
    additive_fingerprint,
    fingerprint_oracle_sql,
    full_fingerprint,
)
from pgverify_spark.sources.schemas import TableSchema

CFG = VerifyConfig()

EDGE_SCHEMA = TableSchema(
    "edge",
    (
        ("id", "bigint"),
        ("d", "double"),
        ("s", "string"),
        ("b", "boolean"),
        ("i", "int"),
        ("arr", "array<bigint>"),
    ),
    ("id",),
)

EDGE_ROWS = [
    (1, float("nan"), "", True, 0, []),
    (2, float("inf"), "a|b|c", False, -2147483648, [0]),
    (3, float("-inf"), "ünïcôdé ☃ snowman", None, 2147483647, [-(2**63), 2**63 - 1]),
    (4, -0.0, "tab\tnewline\nquote'\"backslash\\", True, -1, None),
    (5, 0.0, None, False, None, [1, 1, 1]),
    (6, 1e300, "trailing space ", True, 42, [None, 7]),
    (7, -1e300, " leading space", False, 7, [7, None]),
    (8, 1e-300, "0", True, 0, [0, None, 0]),
    (9, 123456789.654321, "null", False, 1, []),
    (10, -0.1, "NaN", True, 2, [3]),
    (11, None, "ends with pipe|", None, None, None),
    (12, 2.5, "comma,semi;colon:", False, -42, [2**62]),
    # regression rows for divergences found by the fuzz pass: DuckDB's
    # float-scaled double->decimal near-tie flips, its long-mantissa
    # tiny-exponent parse bug, and magnitudes past 2^50
    (13, 6.6552990120357385e-08, "duck parse bug", True, 1, []),
    (14, 123456.0000005, "near tie up", False, 2, [1]),
    (15, 1.0000004999999999, "near tie down", True, 3, [2]),
    (16, 3137334561968212.0, "2^51-ish", False, 4, [3]),
    (17, -5.458509981143034e-11, "tiny negative", True, 5, [4]),
]


@pytest.fixture(scope="module")
def edge_path(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("edge") / "edge.parquet")
    df = spark.createDataFrame(
        EDGE_ROWS, "id bigint, d double, s string, b boolean, i int, arr array<bigint>"
    )
    df.coalesce(1).write.mode("overwrite").parquet(out)
    return out


@pytest.mark.parametrize("mode", ["full", "additive", "bookend"])
def test_edge_values_match_oracle(spark, duck, edge_path, mode):
    # bookend included: its (k, r) ordering leans on Spark and DuckDB
    # comparing raw canonical strings identically (binary UTF-8), which
    # the unicode/control-char rows exercise
    from pgverify_spark.operators.fingerprint import FINGERPRINT_OPS

    df = spark.read.parquet(edge_path)
    op = FINGERPRINT_OPS[mode]
    got = op(df, EDGE_SCHEMA, CFG).collect()[0].fp
    duck.execute(f"CREATE OR REPLACE VIEW edge AS SELECT * FROM '{edge_path}/*.parquet'")
    want = duck.execute(fingerprint_oracle_sql(mode, "edge", EDGE_SCHEMA, CFG)).fetchone()[0]
    assert got == want


def test_edge_rows_distinguishable(spark, duck, edge_path):
    """Sanity against over-canonicalization: every edge row must hash
    uniquely (e.g. NaN vs the string 'NaN', -0.0 vs 0.0 collapse is
    deliberate for floats but must not leak across columns)."""
    from pgverify_spark.functions.canonical import DIALECT_SPARK, row_hash_sql

    df = spark.read.parquet(edge_path)
    h = row_hash_sql(list(EDGE_SCHEMA.cols), DIALECT_SPARK, CFG.trunc_unit)
    hashes = [r[0] for r in df.selectExpr(f"{h} AS h").collect()]
    assert len(set(hashes)) == len(EDGE_ROWS)


def test_seeded_fuzz_rows_match_oracle(spark, duck, tmp_path):
    """500 seeded-random rows across the type surface, both engines."""
    import random

    rng = random.Random(20260813)
    rows = []
    for i in range(500):
        d = rng.choice(
            [
                rng.uniform(-1e6, 1e6),
                rng.uniform(-1, 1) * 10 ** rng.randint(-10, 10),
                float(rng.randint(-(2**52), 2**52)),
                None,
            ]
        )
        s = rng.choice(
            [
                "".join(rng.choices("abc|,\\'\"\t ", k=rng.randint(0, 12))),
                None,
                "",
            ]
        )
        rows.append(
            (
                i,
                d,
                s,
                rng.choice([True, False, None]),
                rng.choice([rng.randint(-(2**31), 2**31 - 1), None]),
                rng.choice([[rng.randint(-(2**40), 2**40) for _ in range(rng.randint(0, 4))], None]),
            )
        )
    path = str(tmp_path / "fuzz.parquet")
    spark.createDataFrame(
        rows, "id bigint, d double, s string, b boolean, i int, arr array<bigint>"
    ).coalesce(1).write.mode("overwrite").parquet(path)

    df = spark.read.parquet(path)
    got = full_fingerprint(df, EDGE_SCHEMA, CFG).collect()[0].fp
    duck.execute(f"CREATE OR REPLACE VIEW fuzz AS SELECT * FROM '{path}/*.parquet'")
    want = duck.execute(
        fingerprint_oracle_sql("full", "fuzz", EDGE_SCHEMA, CFG)
    ).fetchone()[0]
    assert got == want


def test_json_column_length_proxy(spark, duck, tmp_path):
    """Declared-json columns canonicalize via the reference's length
    proxy (column.go:29-32): same-length different-content json compares
    equal (the portable part), different length differs, and Spark
    matches the DuckDB oracle byte-for-byte."""
    schema = TableSchema("jt", (("id", "bigint"), ("j", "string")), ("id",))
    cfg = VerifyConfig(column_types={"j": "json"})
    rows = [
        (1, "{}"),
        (2, '{"foo": "bar"}'),
        (3, '{"foo": "baz"}'),  # same length as row 2
        (4, '{"foo": ["bar", "baz"]}'),
        (5, None),
    ]
    path = str(tmp_path / "jt.parquet")
    spark.createDataFrame(rows, "id bigint, j string").coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)

    got = full_fingerprint(df, schema, cfg).collect()[0].fp
    duck.execute(f"CREATE OR REPLACE VIEW jt AS SELECT * FROM '{path}/*.parquet'")
    want = duck.execute(fingerprint_oracle_sql("full", "jt", schema, cfg)).fetchone()[0]
    assert got == want

    from pgverify_spark.functions.canonical import DIALECT_SPARK, row_hash_sql

    h = row_hash_sql(cfg.typed_cols([("j", "string")]), DIALECT_SPARK, cfg.trunc_unit)
    by_id = {r.id: r.h for r in df.selectExpr("id", f"{h} AS h").collect()}
    assert by_id[2] == by_id[3]  # length proxy: same-length json equal
    assert by_id[2] != by_id[4]  # different length differs
    # declared string instead: raw-byte hash distinguishes rows 2 and 3
    h_raw = row_hash_sql([("j", "string")], DIALECT_SPARK, cfg.trunc_unit)
    raw = {r.id: r.h for r in df.selectExpr("id", f"{h_raw} AS h").collect()}
    assert raw[2] != raw[3]


def test_timestamp_ns_pre_epoch_floor(spark, duck, tmp_path):
    """Pre-1970 TIMESTAMP(NANOS) values: Spark's bigint-nanos truncation
    must FLOOR (toward -infinity) like date_trunc does on the DuckDB/PG
    side — `div` truncates toward zero and diverges on negative
    non-unit-multiple values (e.g. 1969-12-31 23:59:59.9995)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    nanos = [
        -500_000,               # -0.5 ms -> floors to -1 ms
        -1_000_000,             # exact multiple
        -999_999,
        -1,
        0,
        1_500_000,
        # sub-microsecond magnitudes: DuckDB's NANOS parquet read
        # truncates ns->us TOWARD ZERO (-500 ns reads as 0 us, -1500 ns
        # as -1 us) before date_trunc floors — exactly the two-step
        # canonical.py formula; a one-step ns floor would give -1 us /
        # -2 us here and flip the fingerprint
        -500,
        -1_500,
        1_234_567,
        -3_600_000_000_001,     # 1 ns before a negative hour boundary
        -63_115_200_000_000_000,  # 1968-01-01, exact
        1_700_000_000_123_456_789,
    ]
    path = str(tmp_path / "ns.parquet")
    pq.write_table(
        pa.table(
            {
                "id": pa.array(range(len(nanos)), pa.int64()),
                "ts": pa.array(nanos, pa.timestamp("ns")),
            }
        ),
        path,
        use_deprecated_int96_timestamps=False,
        coerce_timestamps=None,
    )
    schema = TableSchema("nst", (("id", "bigint"), ("ts", "timestamp_ns")), ("id",))
    df = spark.read.parquet(path)
    assert dict(df.dtypes)["ts"] == "bigint"  # nanosAsLong in effect
    duck.execute(f"CREATE OR REPLACE VIEW nst AS SELECT * FROM '{path}'")
    for cfg in [VerifyConfig(), VerifyConfig(timestamp_precision="seconds"),
                VerifyConfig(timestamp_precision="hours")]:
        got = full_fingerprint(df, schema, cfg).collect()[0].fp
        want = duck.execute(fingerprint_oracle_sql("full", "nst", schema, cfg)).fetchone()[0]
        assert got == want, f"precision={cfg.timestamp_precision}"
