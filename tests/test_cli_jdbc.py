"""CLI surface + JDBC SQL generation (golden-SQL tests mirroring the
reference's query_test.go strategy — no live database needed)."""

import subprocess
import sys

from pgverify_spark.config import VerifyConfig
from pgverify_spark.sources.jdbc import build_columns_query, build_tables_query


def test_tables_query_filters():
    cfg = VerifyConfig(
        exclude_schemas=("pg_catalog", "information_schema"),
        include_tables=("t1", "t2"),
    )
    sql = build_tables_query(cfg)
    assert "table_type != 'VIEW'" in sql
    assert "table_schema NOT IN ('pg_catalog', 'information_schema')" in sql
    assert "table_name IN ('t1', 't2')" in sql


def test_tables_query_inclusion_wins():
    cfg = VerifyConfig(include_schemas=("app",), exclude_schemas=("ignored",))
    sql = build_tables_query(cfg)
    assert "table_schema IN ('app')" in sql and "ignored" not in sql


def test_columns_query_shape():
    sql = build_columns_query("public", "orders")
    assert "LEFT OUTER JOIN information_schema.key_column_usage" in sql
    assert "LEFT OUTER JOIN information_schema.table_constraints" in sql
    assert "is_generated != 'ALWAYS'" in sql
    assert "c.table_name = 'orders'" in sql


def test_cli_end_to_end(sf_dir):
    """Agreeing targets -> exit 0 and a pivoted report on stdout."""
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "pgverify_spark.cli",
            sf_dir,
            sf_dir,
            "--tests",
            "rowcount,additive",
            "--include-tables",
            "region,nation",
            "--aliases",
            "a,b",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        env={"SPARK_GRAFT_CPUS": "4", "PATH": "/usr/bin:/bin", "HOME": "/root",
             "JAVA_HOME": __import__("os").environ.get("JAVA_HOME", "")},
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "rowcount" in proc.stdout and "region" in proc.stdout


def test_cli_detects_mismatch(spark, sf_dir, tmp_path):
    src = spark.read.parquet(f"{sf_dir}/region.parquet")
    bad_dir = tmp_path / "bad"
    src.filter("r_regionkey <> 2").write.parquet(str(bad_dir / "region.parquet"))
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "pgverify_spark.cli",
            sf_dir,
            str(bad_dir),
            "--tests",
            "rowcount",
            "--include-tables",
            "region",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        env={"SPARK_GRAFT_CPUS": "4", "PATH": "/usr/bin:/bin", "HOME": "/root",
             "JAVA_HOME": __import__("os").environ.get("JAVA_HOME", "")},
        cwd="/root/repo",
    )
    assert proc.returncode == 1
    assert "outputs differ" in proc.stderr
