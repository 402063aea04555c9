"""SparkSession factory with scale-oriented defaults.

All engine entry points accept an externally built session; this module is
the one place that encodes the configuration the engine relies on
semantically (UTC session time zone, nanos-as-long parquet reads) plus the
scale-oriented defaults (AQE, skew handling).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Configs the engine depends on *semantically* (not tuning).
REQUIRED_CONFS = {
    # Fingerprints canonicalize timestamps to epoch micros; session tz must
    # be fixed so TIMESTAMP_LTZ/NTZ conversions are deterministic.
    "spark.sql.session.timeZone": "UTC",
    # testdata events.parquet uses TIMESTAMP(NANOS) which Spark cannot read
    # natively; read as bigint nanoseconds and canonicalize explicitly.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}

#: Tuning defaults — correct at local[32]/sf0.1 and sane at cluster scale
#: (AQE coalesces small shuffles and splits skewed ones at runtime).
TUNING_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # local-mode friendly; on a real cluster leave to AQE + defaults.
    "spark.sql.shuffle.partitions": "32",
    # Local/small-SF only: the testdata parquet files are ~10 MB, so the
    # default 128 MB split gives 1-3 input partitions and the row-hash
    # scan runs on 1-3 cores.  On a real cluster reading 100 TB, leave
    # this at the 128 MB default (set SPARK_GRAFT_MAX_PARTITION_BYTES).
    "spark.sql.files.maxPartitionBytes": os.environ.get(
        "SPARK_GRAFT_MAX_PARTITION_BYTES", "2097152"
    ),
    "spark.driver.memory": "8g",
    "spark.ui.enabled": "false",
}


def get_spark(app_name: str = "pgverify_spark", master: str | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's required confs."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name).master(master or f"local[{cpus}]")
    for k, v in {**TUNING_CONFS, **REQUIRED_CONFS}.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # getOrCreate may return a pre-existing session; enforce semantic confs.
    for k, v in REQUIRED_CONFS.items():
        spark.conf.set(k, v)
    return spark
