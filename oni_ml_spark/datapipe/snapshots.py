"""Corpus snapshot comparison — the change-data step of an incremental
training-data pipeline (what entered, what left, what was edited between
two crawls/exports), without a table format's commit log.

One full outer join on the id, comparing content DIGESTS (md5 of the
compared columns), never the payloads: the shuffle carries (id, 32-byte
digest) per side, so diffing two 100 TB snapshots moves key+digest only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_STATUSES = ("added", "removed", "changed", "unchanged")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    compare_cols: list[str] | str,
) -> DataFrame:
    """(id, status) for every id in either snapshot: ``added`` (new only),
    ``removed`` (old only), ``changed`` (both, digest differs),
    ``unchanged`` (both, digest equal).

    ``compare_cols`` are digested FIELD-WISE first (md5 per field, nulls as
    a reserved fixed token distinct from any hex digest), then the
    fixed-width per-field digests are digested together — field boundaries
    are unambiguous for ANY content, including values containing whatever
    separator a concat scheme would have used. Each side
    must be id-unique — duplicate ids would make the join fan out and
    report one id several times — and that is REJECTED up front with one
    bounded count aggregate per side, not silently tolerated.
    """
    cols = [compare_cols] if isinstance(compare_cols, str) else list(compare_cols)
    if not cols:
        raise ValueError("compare_cols must be non-empty")
    for side, df in (("old", old), ("new", new)):
        missing = [c for c in [id_col, *cols] if c not in df.columns]
        if missing:
            raise ValueError(f"{side} snapshot lacks columns {missing}")
        st = df.agg(
            (F.count(F.lit(1)) - F.count_distinct(F.col(id_col))).alias("dup"),
            F.sum(F.col(id_col).isNull().cast("long")).alias("nulls"),
        ).collect()[0]
        if st["nulls"]:
            raise ValueError(
                f"{side} snapshot has {st['nulls']} null id(s) — null ids "
                "cannot be matched across snapshots"
            )
        if st["dup"]:
            raise ValueError(
                f"{side} snapshot has {st['dup']} duplicate id(s) — the diff "
                "would fan out; dedupe first"
            )

    def digested(df: DataFrame, name: str) -> DataFrame:
        # per-field md5 (32 hex chars) or the "null" token — a prefix code:
        # 'n' is not a hex character, so a block is either exactly "null"
        # or exactly 32 hex chars, and no cross-field collision exists
        parts = [
            F.coalesce(F.md5(F.col(c).cast("string")), F.lit("null"))
            for c in cols
        ]
        return df.select(
            F.col(id_col).alias("id"), F.md5(F.concat(*parts)).alias(name)
        )

    o = digested(old, "__od")
    n = digested(new, "__nd")
    joined = o.join(n, "id", "full_outer")
    return joined.select(
        "id",
        F.when(F.col("__od").isNull(), F.lit("added"))
        .when(F.col("__nd").isNull(), F.lit("removed"))
        .when(F.col("__od") == F.col("__nd"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )


def diff_summary(diff: DataFrame) -> DataFrame:
    """(status, n) — the four-row rollup of a ``snapshot_diff`` result,
    with structural zeros for absent statuses (a report consumer can rely
    on exactly four rows)."""
    spark = diff.sparkSession
    statuses = spark.createDataFrame([(s,) for s in _STATUSES], "status string")
    counts = diff.groupBy("status").agg(F.count(F.lit(1)).alias("n"))
    return (
        statuses.join(counts, "status", "left")
        .select("status", F.coalesce("n", F.lit(0)).cast("long").alias("n"))
    )
