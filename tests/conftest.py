import os

import duckdb
import pytest

from pgverify_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("pgverify-spark-tests")
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for f in os.listdir(SF_DIR):
        if f.endswith(".parquet"):
            name = f[: -len(".parquet")]
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM '{os.path.join(SF_DIR, f)}'"
            )
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
