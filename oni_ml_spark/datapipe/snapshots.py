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


def apply_changelog(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: list[str] | str,
    op_col: str = "op",
    seq_col: str = "seq",
    upsert_token: str = "upsert",
    delete_token: str = "delete",
) -> DataFrame:
    """Apply a CDC changelog (upserts + deletes, possibly out of order) to
    a snapshot — the table-format-less MERGE that ``sampling.merge_upsert``
    can't express because it has no delete verb.

    ``changes`` carries the snapshot's full schema plus ``op_col``
    (``upsert_token`` / ``delete_token``) and ``seq_col`` (a monotonic
    version: LSN, commit ts).  Per key only the HIGHEST-seq change counts;
    earlier changes for the same key are superseded whatever their arrival
    order — replaying a day's changelog gives the same answer as applying
    it live.  A key whose winning change is an upsert is replaced-or-
    inserted with that row's payload; a winning delete removes the key
    (deleting an absent key is a no-op, matching MERGE ... WHEN MATCHED
    THEN DELETE).

    Plan shape, sized for a 100 TB snapshot + a per-day changelog: the
    winner per key is ONE aggregate over the changelog
    (``max_by``-over-seq via max(struct), map-side combinable); the
    snapshot is touched by exactly one left-anti join against the distinct
    changed keys — shuffles carry changelog rows and snapshot keys, never
    the snapshot's payload.  No window over the snapshot, no full outer
    join.

    Rejected with one bounded aggregate before any work runs (same
    contract as merge_upsert): null keys, null seq, unknown op tokens, and
    duplicate (key, seq) pairs — a seq tie would make the winner
    nondeterministic.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")
    payload = [c for c in snapshot.columns if c not in keys]
    missing = [c for c in keys if c not in snapshot.columns]
    if missing:
        raise ValueError(f"key columns absent from snapshot: {missing}")
    want = sorted(snapshot.columns) + sorted([op_col, seq_col])
    if sorted(changes.columns) != sorted(want):
        raise ValueError(
            f"changes must carry the snapshot schema plus ({op_col}, {seq_col}): "
            f"expected {sorted(want)}, got {sorted(changes.columns)}"
        )

    null_key = (
        F.greatest(*[F.col(c).isNull().cast("int") for c in keys])
        if len(keys) > 1
        else F.col(keys[0]).isNull().cast("int")
    )
    bad_op = (~F.col(op_col).isin(upsert_token, delete_token)).cast("int")
    stats = changes.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(null_key).alias("null_keys"),
        F.sum(F.col(seq_col).isNull().cast("int")).alias("null_seq"),
        F.sum(F.coalesce(bad_op, F.lit(1))).alias("bad_ops"),
        F.count_distinct(*[F.col(c) for c in keys], F.col(seq_col)).alias("nd"),
    ).collect()[0]
    if stats["null_keys"]:
        raise ValueError(f"changes contain {stats['null_keys']} null-key row(s)")
    if stats["null_seq"]:
        raise ValueError(f"changes contain {stats['null_seq']} null-{seq_col} row(s)")
    if stats["bad_ops"]:
        raise ValueError(
            f"changes contain {stats['bad_ops']} row(s) with an op outside "
            f"({upsert_token!r}, {delete_token!r})"
        )
    dup = stats["n"] - stats["nd"]
    if dup:
        raise ValueError(
            f"changes contain {dup} duplicate ({'+'.join(keys)}, {seq_col}) "
            "row(s) — a seq tie makes the winning change nondeterministic"
        )

    # Winner per key: max_by over seq — unique per key (validated above),
    # so the winner is deterministic; the payload rides inside the value
    # struct without needing to be an orderable type (maps qualify).
    winner = changes.groupBy(*keys).agg(
        F.max_by(
            F.struct(F.col(op_col), *payload), F.col(seq_col)
        ).alias("__w")
    )
    latest = winner.select(
        *keys,
        F.col(f"__w.{op_col}").alias("__op"),
        *[F.col(f"__w.{c}").alias(c) for c in payload],
    )
    kept = snapshot.join(latest.select(*keys), keys, "left_anti")
    inserts = latest.where(F.col("__op") == upsert_token).select(*snapshot.columns)
    return kept.unionByName(inserts)
