"""Corpus snapshot comparison — the change-data step of an incremental
training-data pipeline (what entered, what left, what was edited between
two crawls/exports), without a table format's commit log.

One full outer join on the id, comparing content DIGESTS (md5 of the
compared columns), never the payloads: the shuffle carries (id, 32-byte
digest) per side, so diffing two 100 TB snapshots moves key+digest only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_STATUSES = ("added", "removed", "changed", "unchanged")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    compare_cols: list[str] | str,
    validate: bool = True,
) -> DataFrame:
    """(id, status) for every id in either snapshot: ``added`` (new only),
    ``removed`` (old only), ``changed`` (both, digest differs),
    ``unchanged`` (both, digest equal).

    ``compare_cols`` are digested FIELD-WISE first (md5 per field, nulls as
    a reserved fixed token distinct from any hex digest), then the
    fixed-width per-field digests are digested together — field boundaries
    are unambiguous for ANY content, including values containing whatever
    separator a concat scheme would have used. Each side must be id-unique —
    duplicate ids would make the join fan out and report one id several
    times — and null/duplicate ids are REJECTED, not silently tolerated.

    The rejection is IN-PLAN (``validate=True``, the default): a
    ``count() over (partition by id)`` guard on each side's (id, digest)
    projection raises through ``raise_error`` during the diff job itself.
    No extra scan runs — the guard's per-id window needs exactly the
    hash-partition-by-id + sort-by-id the full-outer sort-merge join
    performs anyway, so validation rides the shuffle the diff already pays
    for (vs. the eager pre-count formulation, which read each 100 TB side
    twice). The error therefore surfaces when the result executes, wrapped
    in Spark's runtime-error type. ``validate=False`` skips the guard for
    inputs already known id-unique (e.g. the output of ``dedup_exact``).
    """
    cols = [compare_cols] if isinstance(compare_cols, str) else list(compare_cols)
    if not cols:
        raise ValueError("compare_cols must be non-empty")
    for side, df in (("old", old), ("new", new)):
        missing = [c for c in [id_col, *cols] if c not in df.columns]
        if missing:
            raise ValueError(f"{side} snapshot lacks columns {missing}")

    def digested(df: DataFrame, name: str, side: str) -> DataFrame:
        # per-field md5 (32 hex chars) or the "null" token — a prefix code:
        # 'n' is not a hex character, so a block is either exactly "null"
        # or exactly 32 hex chars, and no cross-field collision exists
        parts = [
            F.coalesce(F.md5(F.col(c).cast("string")), F.lit("null"))
            for c in cols
        ]
        out = df.select(
            F.col(id_col).alias("id"), F.md5(F.concat(*parts)).alias(name)
        )
        if not validate:
            return out
        per_id = F.count(F.lit(1)).over(Window.partitionBy("id"))
        guard = (
            F.when(
                F.col("id").isNull(),
                F.raise_error(
                    F.lit(
                        f"snapshot_diff: {side} snapshot has a null id — "
                        "null ids cannot be matched across snapshots"
                    )
                ),
            )
            .when(
                per_id > F.lit(1),
                F.raise_error(
                    F.concat(
                        F.lit(f"snapshot_diff: {side} snapshot has a duplicate id ("),
                        F.col("id").cast("string"),
                        F.lit(") — the diff would fan out; dedupe first"),
                    )
                ),
            )
            .otherwise(F.col("id"))
        )
        return out.select(guard.alias("id"), name)

    o = digested(old, "__od", "old")
    n = digested(new, "__nd", "new")
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
