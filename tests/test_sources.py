"""Source adapters: JDBC option surface (no driver ships offline — the
adapter must fail with a clear, actionable error, reference-parity S5)."""

import pytest

from etl_reconciliate_spark.sources.jdbc import read_jdbc_table


def test_jdbc_partitioned_requires_bounds(spark):
    with pytest.raises(ValueError, match="lower_bound and upper_bound"):
        read_jdbc_table(
            spark, "jdbc:postgresql://db/x", "t", partition_column="id"
        )


def test_jdbc_missing_driver_is_actionable(spark):
    with pytest.raises(Exception, match="driver"):
        read_jdbc_table(spark, "jdbc:nosuchdb://nowhere/x", "t")
