from etl_reconciliate_spark.target.table import TargetTable

__all__ = ["TargetTable"]
