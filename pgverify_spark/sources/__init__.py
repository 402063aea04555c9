from pgverify_spark.sources.parquet import ParquetTarget, load_table
from pgverify_spark.sources.schemas import TESTDATA_TABLES, TableSchema, logical_types

__all__ = ["ParquetTarget", "TESTDATA_TABLES", "TableSchema", "load_table", "logical_types"]
