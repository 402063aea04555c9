"""Engine entry points must work on an externally built SparkSession.

The driver's correctness harness (and any library user) supplies its own
session without the engine's REQUIRED_CONFS; round 1 failed every
events/TIMESTAMP(NANOS) query because nothing at the engine boundary
enforced them.  (The regenerated testdata now stores ``events.ts`` as
TIMESTAMP(MICROS), but the UTC timezone conf is still correctness-
critical — the NTZ→instant cast behind every epoch-us bucket is
session-tz-sensitive — and ``nanosAsLong`` still gates genuine
TIMESTAMP(NANOS) sources, checked here on a synthetic file.)  These
tests strip the confs from the live session and assert the public entry
points still produce correct results.
"""

import pytest

from pgverify_spark.registry import spark_queries
from pgverify_spark.session import REQUIRED_CONFS, ensure_required_confs
from pgverify_spark.sources.parquet import ParquetTarget


@pytest.fixture()
def confless(spark):
    """Simulate a vanilla external session: required confs absent/wrong."""
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    yield spark
    ensure_required_confs(spark)


def test_ensure_required_confs_restores(confless):
    ensure_required_confs(confless)
    for k, v in REQUIRED_CONFS.items():
        assert confless.conf.get(k) == v


def test_parquet_read_confless_events(confless, sf_dir):
    # events.parquet is TIMESTAMP(MICROS): reads as timestamp_ntz and the
    # boundary must still repair the session for downstream tz-sensitive ops
    df = ParquetTarget("t", sf_dir).read(confless, "events")
    assert df.count() > 0
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"


def test_parquet_read_enforces_nanos(confless, tmp_path):
    # a genuine TIMESTAMP(NANOS) file is unreadable without nanosAsLong
    # (round 1's failure mode); the engine boundary applies the conf
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "id": pa.array([1, 2], pa.int64()),
                "ts": pa.array(
                    [1_700_000_000_123_456_789, 1_700_000_100_000_000_000],
                    pa.timestamp("ns"),
                ),
            }
        ),
        str(tmp_path / "evns.parquet"),
        use_deprecated_int96_timestamps=False,
        coerce_timestamps=None,
    )
    df = ParquetTarget("t", str(tmp_path)).read(confless, "evns")
    assert df.count() == 2
    assert dict(df.dtypes)["ts"] == "bigint"


@pytest.mark.parametrize(
    "name",
    [
        "full_fingerprint_events",
        "full_fingerprint_events_hours_precision",
        "hourly_rollup_events",
        "daily_rollup_events",
    ],
)
def test_registry_callable_on_confless_session(confless, sf_dir, name):
    # exactly what the driver does: call the registry entry on its own
    # session.  hours-precision additionally depends on the UTC timezone
    # (date_trunc is session-tz-sensitive), which the fixture set to
    # America/New_York.
    rows = spark_queries()[name](confless, sf_dir).collect()
    assert len(rows) >= 1


def test_confless_fingerprint_matches_conffull(confless, sf_dir):
    # tz-sensitive query must give the same fingerprint whether the caller
    # started from a broken session (entry point repairs it) or a good one
    q = spark_queries()["full_fingerprint_events_hours_precision"]
    fp_from_broken = q(confless, sf_dir).collect()[0]["fp"]
    ensure_required_confs(confless)
    fp_from_good = q(confless, sf_dir).collect()[0]["fp"]
    assert fp_from_broken == fp_from_good
