"""Physical-plan extraction shared by plan tests and scripts/dump_plans.py."""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The pre-execution formatted physical plan (AQE re-optimizes at
    runtime, but only starting FROM this plan)."""
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
