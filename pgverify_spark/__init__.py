"""pgverify_spark — a PySpark-native table-verification and data-processing engine.

A from-scratch, idiomatic-Spark rebuild of the capabilities of
``cjfinnell/pgverify`` (reference: /root/reference, see SURVEY.md).  The
reference pushes fingerprint SQL into PostgreSQL-compatible databases
(reference ``verify.go:23-88``); this engine inverts that: Spark reads the
rows (Parquet / JDBC) and computes identical fingerprints with native
DataFrame operators, so verification also works over files, lakehouse
tables, and streams — and adds the large-scale data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) that a
100 TB training-data pipeline needs.
"""

from pgverify_spark.config import VerifyConfig
from pgverify_spark.session import get_spark

__all__ = ["VerifyConfig", "get_spark"]
__version__ = "0.1.0"
