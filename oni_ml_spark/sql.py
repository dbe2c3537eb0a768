"""SQL surface: register the engine's tables as temp views and run SQL.

The reference has no user-facing SQL (SURVEY.md §1.1); Spark gives it for
free, and the oracle battery demonstrates dialect-portable queries running
identically on Spark SQL and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from oni_ml_spark.io import load_table

TESTDATA_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def register_testdata(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Expose the synthetic tables as temp views (nano-timestamps normalized)."""
    for name in tables or TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def sql(spark: SparkSession, query: str) -> DataFrame:
    return spark.sql(query)
