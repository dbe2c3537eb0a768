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


def _validate_changelog(
    changes: DataFrame,
    keys: list[str],
    op_col: str,
    seq_col: str,
    upsert_token: str,
    delete_token: str,
    caller: str,
    non_seed=None,
    initial_seq=None,
) -> None:
    """Reject null keys, null seq, unknown op tokens, and duplicate
    (key, seq) pairs in ONE bounded aggregate (shared by ``apply_changelog``
    and ``scd2_history`` — a seq tie makes the winner / interval order
    nondeterministic in both). When ``non_seed`` (a boolean Column marking
    real changelog rows) and ``initial_seq`` are given, the SAME aggregate
    also rejects any real change at seq <= initial_seq — the seeded base
    snapshot must strictly precede every change, else the history would
    supersede a straggler that apply_changelog would honor."""
    null_key = (
        F.greatest(*[F.col(c).isNull().cast("int") for c in keys])
        if len(keys) > 1
        else F.col(keys[0]).isNull().cast("int")
    )
    bad_op = (~F.col(op_col).isin(upsert_token, delete_token)).cast("int")
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(null_key).alias("null_keys"),
        F.sum(F.col(seq_col).isNull().cast("int")).alias("null_seq"),
        F.sum(F.coalesce(bad_op, F.lit(1))).alias("bad_ops"),
        F.count_distinct(*[F.col(c) for c in keys], F.col(seq_col)).alias("nd"),
    ]
    if non_seed is not None:
        aggs.append(F.min(F.when(non_seed, F.col(seq_col))).alias("lo"))
    stats = changes.agg(*aggs).collect()[0]
    if non_seed is not None and stats["lo"] is not None and stats["lo"] <= initial_seq:
        raise ValueError(
            f"{caller}: changes contain seq {stats['lo']} <= initial_seq "
            f"{initial_seq} — the seeded base snapshot must strictly "
            "precede every change (lower initial_seq or fix the changelog)"
        )
    if stats["null_keys"]:
        raise ValueError(f"{caller}: changes contain {stats['null_keys']} null-key row(s)")
    if stats["null_seq"]:
        raise ValueError(
            f"{caller}: changes contain {stats['null_seq']} null-{seq_col} row(s)"
        )
    if stats["bad_ops"]:
        raise ValueError(
            f"{caller}: changes contain {stats['bad_ops']} row(s) with an op outside "
            f"({upsert_token!r}, {delete_token!r})"
        )
    dup = stats["n"] - stats["nd"]
    if dup:
        raise ValueError(
            f"{caller}: changes contain {dup} duplicate ({'+'.join(keys)}, {seq_col}) "
            "row(s) — a seq tie makes the winning change nondeterministic"
        )


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

    _validate_changelog(
        changes, keys, op_col, seq_col, upsert_token, delete_token, "apply_changelog"
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
    # Two consumers (anti-join keys + inserts) would each re-scan and
    # re-aggregate the changelog — no automatic subplan reuse in batch.
    # Pin the winner table: bounded by the changelog's distinct keys (the
    # state-table size), and validation already ran a job on this frame.
    latest = latest.localCheckpoint(eager=True)
    kept = snapshot.join(latest.select(*keys), keys, "left_anti")
    inserts = latest.where(F.col("__op") == upsert_token).select(*snapshot.columns)
    return kept.unionByName(inserts)


def scd2_history(
    changes: DataFrame,
    key_cols: list[str] | str,
    op_col: str = "op",
    seq_col: str = "seq",
    upsert_token: str = "upsert",
    delete_token: str = "delete",
    initial: DataFrame | None = None,
    initial_seq=0,
) -> DataFrame:
    """Slowly-changing-dimension Type-2 history from a CDC changelog: one
    row per VERSION of each key, with half-open validity ``[valid_from,
    valid_to)`` in seq units and an ``is_current`` flag — the audit-trail
    companion to ``apply_changelog`` (which keeps only each key's winner).

    Every upsert opens a version valid from its own seq; the version closes
    at the key's next change (upsert OR delete) and stays open
    (``valid_to`` null, ``is_current`` true) if nothing follows.  Deletes
    emit no row — they exist to terminate the preceding version.  Identical
    consecutive payloads are NOT collapsed: each upsert is a version, which
    preserves "row was re-confirmed at seq" information; collapse upstream
    if that is noise.  ``initial`` (optional) seeds the history with a base
    snapshot as upserts at ``initial_seq``; a change sharing a key's
    ``initial_seq`` is caught by the duplicate-(key, seq) validation.

    Plan shape at the 100 TB target: ONE window (``lead(seq)`` per key)
    over changelog±snapshot rows, partitioned by key — per-key version
    counts are small, so no reducer sees more than a key's own history;
    payloads ride the single hash-partition-by-key exchange once.  Input
    contract (null key/seq, unknown ops, (key, seq) ties) is rejected by
    the same one bounded aggregate as ``apply_changelog``.

    Validity reads as: the state ``as of`` seq t includes the version with
    ``valid_from <= t < valid_to`` (see ``as_of_snapshot``), so
    ``as_of_snapshot(scd2_history(log, k, initial=base), t)`` equals
    ``apply_changelog(base, log_up_to_t, k)`` for every t — the invariant
    the tests assert.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")
    want_payload = [c for c in changes.columns if c not in (*keys, op_col, seq_col)]
    missing = [c for c in (*keys, op_col, seq_col) if c not in changes.columns]
    if missing:
        raise ValueError(f"changes lack columns {missing}")
    if initial is not None:
        if sorted(initial.columns) != sorted([*keys, *want_payload]):
            raise ValueError(
                "initial snapshot schema must be the changes schema minus "
                f"({op_col}, {seq_col}): expected {sorted([*keys, *want_payload])}, "
                f"got {sorted(initial.columns)}"
            )
        if "__seed" in changes.columns:
            raise ValueError(
                "scd2_history: column '__seed' collides with the internal "
                "seed marker — rename it first"
            )
        # The seed must strictly precede the changelog: a straggler change
        # at seq <= initial_seq would be SUPERSEDED by the seed version in
        # the history while apply_changelog would let it override the base
        # snapshot — silently breaking the as_of == apply_changelog
        # invariant. A __seed marker lets _validate_changelog fold that
        # check into its ONE bounded aggregate over the union (which also
        # catches duplicate keys inside the seed itself).
        seed = initial.select(
            *keys,
            *want_payload,
            F.lit(upsert_token).alias(op_col),
            F.lit(initial_seq).cast(dict(changes.dtypes)[seq_col]).alias(seq_col),
            F.lit(True).alias("__seed"),
        )
        marked = (
            changes.select(*keys, *want_payload, op_col, seq_col)
            .withColumn("__seed", F.lit(False))
            .unionByName(seed)
        )
        _validate_changelog(
            marked, keys, op_col, seq_col, upsert_token, delete_token,
            "scd2_history", non_seed=~F.col("__seed"), initial_seq=initial_seq,
        )
        changes = marked.drop("__seed")
    else:
        _validate_changelog(
            changes, keys, op_col, seq_col, upsert_token, delete_token, "scd2_history"
        )
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col))
    return (
        changes.withColumn("__next", F.lead(seq_col).over(w))
        .where(F.col(op_col) == upsert_token)
        .select(
            *keys,
            *want_payload,
            F.col(seq_col).alias("valid_from"),
            F.col("__next").alias("valid_to"),
            F.col("__next").isNull().alias("is_current"),
        )
    )


def as_of_snapshot(history: DataFrame, seq) -> DataFrame:
    """Time-travel read of a ``scd2_history`` table: the rows whose
    validity interval covers ``seq`` (``valid_from <= seq < valid_to``;
    open-ended versions cover everything from their start).  A pure filter
    — predicate-pushdown-friendly when the history is persisted, and the
    half-open intervals mean each key matches at most one version."""
    for c in ("valid_from", "valid_to", "is_current"):
        if c not in history.columns:
            raise ValueError(f"not a scd2_history frame: missing column {c!r}")
    covered = (F.col("valid_from") <= F.lit(seq)) & (
        F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(seq))
    )
    return history.where(covered).drop("valid_from", "valid_to", "is_current")
