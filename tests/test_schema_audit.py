"""Footer-only schema-drift audit (sources/schema_audit.py): the
invariants are (1) the report states exactly the drift two writer
versions injected, and (2) NO data pages are read — only footers."""
from __future__ import annotations

import os

from pgverify_spark.sources.schema_audit import file_schemas, schema_drift_report


def _write_two_generations(spark, path):
    a = spark.range(100).selectExpr(
        "id AS k", "CAST(id * 2 AS DOUBLE) AS v", "'x' AS tag"
    )
    a.repartition(2).write.parquet(path)
    b = spark.range(100).selectExpr(
        "id AS k", "CAST(id * 2 AS FLOAT) AS v", "id % 3 AS extra"
    )
    b.repartition(3).write.mode("append").parquet(path)


def test_schema_drift_report_states_injected_drift(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_two_generations(spark, path)
    rows = {
        (r.column, r.dtype): (r.n_files, r.n_files_total, r.status)
        for r in schema_drift_report(spark, path).collect()
    }
    assert rows[("k", "int64")] == (5, 5, "ok")
    # v: 2 files double + 3 files float -> conflicting, both variants listed
    assert rows[("v", "double")] == (2, 5, "conflicting")
    assert rows[("v", "float")] == (3, 5, "conflicting")
    # tag dropped by generation B, extra added by it -> partial
    assert rows[("tag", "string")] == (2, 5, "partial")
    assert rows[("extra", "int64")] == (3, 5, "partial")
    assert len(rows) == 5


def test_report_reads_footers_only(spark, tmp_path):
    """Splice garbage into every file's DATA region (header and footer
    untouched): the report must be byte-identical — proof the audit
    never opens a data page, the property that makes it O(footers) at
    100 TB."""
    path = str(tmp_path / "t")
    _write_two_generations(spark, path)
    before = sorted(map(tuple, schema_drift_report(spark, path).collect()))
    for name in os.listdir(path):
        if name.startswith(("_", ".")) or not name.endswith(".parquet"):
            continue
        f = f"{path}/{name}"
        size = os.path.getsize(f)
        # parquet layout: PAR1 | data pages | footer | len | PAR1 —
        # vandalize a slice well inside the data region
        start, n = 8, max(16, min(64, size // 8))
        assert start + n < size - 1024 or size < 2048
        if start + n >= size - 600:  # tiny file: skip, footer too close
            continue
        with open(f, "r+b") as fh:
            fh.seek(start)
            fh.write(b"\xde" * n)
    after = sorted(map(tuple, schema_drift_report(spark, path).collect()))
    assert after == before


def test_file_schemas_row_per_column(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.range(10).selectExpr("id", "id * 2 AS d").coalesce(1).write.parquet(path)
    rows = file_schemas(spark, path).collect()
    assert {(r.column, r.dtype, r.col_idx) for r in rows} == {
        ("id", "int64", 0),
        ("d", "int64", 1),
    }
