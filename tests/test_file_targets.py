"""Multi-format FileTarget: csv/json/orc read paths + round-trip
fingerprint identity with the parquet originals."""

import pytest

from pgverify_spark.config import VerifyConfig
from pgverify_spark.operators.fingerprint import full_fingerprint
from pgverify_spark.sources.files import FileTarget
from pgverify_spark.sources.parquet import ParquetTarget


def test_bad_format_rejected(tmp_path):
    with pytest.raises(ValueError, match="unsupported format"):
        FileTarget("t", str(tmp_path), format="avro")


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_roundtrip_fingerprint_identity(spark, sf_dir, tmp_path, fmt):
    table = "nation"
    src = ParquetTarget("src", sf_dir)
    df = src.read(spark, table)
    writer = df.write.format(fmt).mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.save(str(tmp_path / f"{table}.{fmt}"))

    schemas = (
        {table: "n_nationkey int, n_name string, n_regionkey int"}
        if fmt in ("csv", "json")
        else {}
    )
    tgt = FileTarget("rt", str(tmp_path), format=fmt, schemas=schemas)
    assert tgt.list_tables() == [table]
    cfg = VerifyConfig()
    fp_rt = full_fingerprint(tgt.read(spark, table), tgt.table_schema(spark, table), cfg)
    fp_src = full_fingerprint(df, src.table_schema(spark, table), cfg)
    assert fp_rt.collect()[0].fp == fp_src.collect()[0].fp
