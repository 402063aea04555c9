from pgverify_spark.plans.verify import VerifyResult, check_for_errors, report_table, verify

__all__ = ["VerifyResult", "check_for_errors", "report_table", "verify"]
