"""Skew / partition diagnostics — the first thing to look at when a stage
straggles on a real cluster.

Both profiles are one aggregate each (bounded output: one row per partition
/ per surviving key), so they are safe to run against a 100 TB input —
unlike .glom().map(len) RDD folklore, which materializes whole partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partition_profile(df: DataFrame) -> DataFrame:
    """(partition_id, n_rows) for the frame AS CURRENTLY PARTITIONED — the
    direct view of imbalance feeding a slow stage. One map-side-combined
    aggregate; output is one row per partition.

    Interpreting it: a healthy post-shuffle frame has rows spread within
    ~2x of the mean; one partition holding 100x the mean is key skew (fix
    with salting / AQE skew join), many near-empty partitions after a
    filter means too many shuffle partitions for the surviving data (AQE
    coalescing, or lower spark.sql.shuffle.partitions).
    """
    return (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.desc("n_rows"))
    )


def key_skew_profile(df: DataFrame, key_col: str, top_k: int = 20) -> DataFrame:
    """(key, n_rows, share) for the ``top_k`` heaviest values of
    ``key_col`` — the keys that will dominate any shuffle keyed on it.

    share = key's fraction of ALL rows, computed against an in-plan 1-row
    total (no collect). A single key holding >1/shuffle.partitions of the
    data guarantees at least one straggler task on a plain hash shuffle —
    the threshold at which salting (plans.skew.salted_join) or AQE skew
    handling starts paying for itself.
    """
    if top_k <= 0:
        raise ValueError("top_k must be positive")
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    # total = sum of the per-key counts (a |keys|-row aggregate), NOT a
    # second count over df — that would scan the 100 TB input twice
    total = counts.agg(F.sum("n_rows").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "key",
            "n_rows",
            F.round(F.col("n_rows") / F.col("__total"), 6).alias("share"),
        )
        .orderBy(F.desc("n_rows"), F.col("key"))
        .limit(top_k)
    )
