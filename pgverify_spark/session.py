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
    # parallelismFirst deliberately left at its default (true): an r12
    # A/B with the frozen bench protocol (scripts/opt_bench_subset.py,
    # reps=3, warm, clearCache between queries) measured byte-based
    # coalescing (false) at +19% on a 17-query subset (31.6 s vs
    # 25.6 s) — nearly every md5/canonicalization-heavy stage here is
    # CPU-bound per row, and coalescing below the core count serializes
    # it.  (A first-run-dominated profiler had suggested the opposite;
    # the warm best-of-3 bench is authoritative.)  At cluster scale the
    # advisory byte size still governs once partitions exceed
    # defaultParallelism, so large shuffles are sized correctly either
    # way.
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # local-mode friendly; on a real cluster leave to AQE + defaults.
    "spark.sql.shuffle.partitions": "32",
    "spark.driver.memory": "8g",
    "spark.ui.enabled": "false",
}


def _local_tuning_confs(master: str) -> dict[str, str]:
    """Extra tuning applied only in local mode (or via explicit env).

    The testdata parquet files are ~10 MB, so Spark's default 128 MB split
    gives 1-3 input partitions and a row-hash scan runs on 1-3 cores; a
    2 MB split spreads it over all local threads.  That value would be
    catastrophic on a real cluster (a 100 TB scan would plan ~50M tasks),
    so it is applied ONLY when the master is local[*] — a cluster session
    keeps Spark's 128 MB default unless SPARK_GRAFT_MAX_PARTITION_BYTES
    explicitly overrides it.
    """
    env = os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES")
    if env is not None:
        return {"spark.sql.files.maxPartitionBytes": env}
    if master.startswith("local"):
        return {"spark.sql.files.maxPartitionBytes": "2097152"}
    return {}


def ensure_required_confs(spark: SparkSession) -> SparkSession:
    """Apply the engine's semantic confs to an externally built session.

    All engine entry points accept a caller-supplied SparkSession; this is
    the enforcement point they share.  Both confs are runtime-settable, so
    this works on an already-created session (file-source and expression
    confs are read per-query, not at session construction).  Idempotent
    and cheap (py4j get/set per conf), called from ``ParquetTarget.read``,
    ``verify()`` and the registry wrappers.
    """
    for k, v in REQUIRED_CONFS.items():
        if spark.conf.get(k, None) != v:
            spark.conf.set(k, v)
    return spark


def get_spark(app_name: str = "pgverify_spark", master: str | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's required confs."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    resolved = master or f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(resolved)
    confs = {**TUNING_CONFS, **_local_tuning_confs(resolved), **REQUIRED_CONFS}
    for k, v in confs.items():
        builder = builder.config(k, v)
    # getOrCreate may return a pre-existing session; enforce semantic confs.
    return ensure_required_confs(builder.getOrCreate())
