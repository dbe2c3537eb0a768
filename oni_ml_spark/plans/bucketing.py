"""Bucketed tables for shuffle-free repeated joins.

Writing both sides of a frequently-repeated equi join bucketed by the join
key (same bucket count) lets Spark plan a sort-merge join with NO exchange —
the co-location is baked into storage. The classic use here: the featurized
event table and the per-doc topic-mix table, both bucketed by doc/ip, when
scoring runs repeatedly against the same day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
