"""Streaming keyed-upsert sink over plain parquet — MERGE INTO semantics
for a pipeline without a transactional table format.

Parquet cannot update in place, so the sink maintains a tiny versioned
layout under one root:

    root/v00000001/...parquet     (immutable full snapshots)
    root/v00000002/...
    root/_LATEST                  (atomic pointer: the current version)

Each micro-batch reads the current snapshot, merges the batch in with one
per-key largest-order-wins window over (stored ∪ batch) — MERGE semantics
that stay correct under micro-batch replay — writes the merged result as
the NEXT version directory, then swaps the pointer with an atomic rename. Readers always go
through the pointer, so they see a complete old snapshot or a complete new
one — never a half-written directory. A crash between write and swap
leaves an orphan version directory the next successful batch overwrites;
replaying a micro-batch (foreachBatch's at-least-once contract) is
idempotent because upserting identical rows again yields the same
snapshot.

Scale note: every batch rewrites the full snapshot — the right shape for
dimension/state tables up to millions of rows (model tables, dedup
ledgers, feature snapshots), NOT for the 100 TB fact stream itself (append
those, or use a real table format). The rewrite is one distributed job;
nothing funnels through the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_POINTER = "_LATEST"
_APPLIED = "_applied_batch"


def _version_dirs(root: str) -> list[str]:
    try:
        entries = os.listdir(root)
    except FileNotFoundError:
        return []
    return [e for e in entries if e.startswith("v") and e[1:].isdigit()]


def _read_pointer(root: str) -> int:
    """0 only for a GENUINELY empty table. A missing/corrupt pointer file
    next to existing version directories is raised, not treated as empty —
    silently re-initializing would make the next batch overwrite the whole
    table with just itself (the driver-restart-on-another-node trap: the
    pointer lives on the driver-local filesystem, so `root` must be a path
    every driver sees — shared mount or single-node; document'd limitation
    of a table-format-less sink)."""
    try:
        with open(os.path.join(root, _POINTER)) as fh:
            return int(fh.read().strip())
    except (FileNotFoundError, ValueError) as e:
        if _version_dirs(root):
            raise RuntimeError(
                f"upsert table at {root} has version directories but no "
                "readable _LATEST pointer — refusing to treat it as empty "
                "(recover by writing the highest committed version number "
                "into _LATEST)"
            ) from e
        return 0


def _swap_pointer(root: str, version: int) -> None:
    tmp = os.path.join(root, f".{_POINTER}.tmp")
    with open(tmp, "w") as fh:
        fh.write(str(version))
    os.replace(tmp, os.path.join(root, _POINTER))  # atomic on POSIX


def read_upsert_table(spark: SparkSession, root: str) -> DataFrame | None:
    """Current snapshot of an upsert table (None before the first commit).
    Always resolves through the atomic pointer."""
    v = _read_pointer(root)
    if v == 0:
        return None
    return spark.read.parquet(os.path.join(root, f"v{v:08d}"))


def _check_schema(current: DataFrame | None, batch_df: DataFrame) -> None:
    if current is not None and sorted(current.columns) != sorted(batch_df.columns):
        raise ValueError(
            "stream schema does not match the stored table "
            f"({sorted(batch_df.columns)} vs {sorted(current.columns)})"
        )


def _commit_snapshot(
    root: str,
    merged: DataFrame,
    keep_versions: int,
    batch_marker: str | None = None,
    extra_frames: dict[str, DataFrame] | None = None,
) -> None:
    """The shared commit protocol of every sink in this module: write the
    merged frame as the next version directory, swap the atomic pointer,
    drop directories older than ``keep_versions``. Fixes to crash/retention
    semantics belong HERE, once.

    ``batch_marker`` (used by sinks whose merge is NOT idempotent, e.g.
    ``stats_writer``; format ``"<query_token>\\n<batch_id>"``) records the
    applied micro-batch INSIDE the version directory before the pointer
    swap, so marker and data commit or vanish together — a crash between
    them leaves the pointer on the previous consistent (snapshot, marker)
    pair.

    ``extra_frames`` ({name: frame}) are side tables committed WITH the
    snapshot — written as parquet under ``vdir/<name>`` before the pointer
    swap. Names must start with ``_`` so parquet partition discovery hides
    them from ``read_upsert_table`` readers of the snapshot itself."""
    v = _read_pointer(root) + 1
    vdir = os.path.join(root, f"v{v:08d}")
    merged.write.mode("overwrite").parquet(vdir)
    for name, frame in (extra_frames or {}).items():
        if not name.startswith("_"):
            raise ValueError(
                f"extra frame name {name!r} must start with '_' (anything "
                "else would be read back as part of the snapshot)"
            )
        frame.write.mode("overwrite").parquet(os.path.join(vdir, name))
    if batch_marker is not None:
        with open(os.path.join(vdir, _APPLIED), "w") as fh:
            fh.write(batch_marker)
    _swap_pointer(root, v)
    import shutil

    for entry in sorted(_version_dirs(root)):
        if int(entry[1:]) <= v - keep_versions:
            shutil.rmtree(os.path.join(root, entry), ignore_errors=True)


def _counts_merge(join_col: str):
    """Default `_accumulate_batch` merge: bounded full-outer coalesce-sum
    of two (join_col, n_cur) count tables."""

    def merge(current: DataFrame, part: DataFrame) -> DataFrame:
        return (
            current.withColumnRenamed("n_cur", "__prev")
            .join(part.withColumnRenamed("n_cur", "__new"), join_col, "full_outer")
            .select(
                join_col,
                (
                    F.coalesce("__prev", F.lit(0)) + F.coalesce("__new", F.lit(0))
                ).alias("n_cur"),
            )
        )

    return merge


def _accumulate_batch(
    batch_df: DataFrame,
    batch_id: int,
    root: str,
    keep_versions: int,
    query_token: str,
    make_part,
    merge_fn,
    side_table: str,
    payload: list,
    payload_schema: str,
    payload_col: str,
    what: str,
    mismatch_msg,
) -> None:
    """THE accumulate-merge-commit protocol every accumulating sink runs
    per micro-batch (numeric + categorical drift histograms, the
    reservoir sample): replay guard (exactly-once via the in-version
    marker + lineage token), empty-batch skip, ONE bounded partial
    reduction of the batch (``make_part``), schema check, provenance
    guards (a root whose current version lacks the committed
    ``side_table``, or committed a DIFFERENT ``payload``, refuses —
    merging state accumulated under one binning / dictionary /
    configuration with another's silently corrupts it), a bounded
    ``merge_fn(current, part)``, and an atomic commit that carries the
    payload with the state. Fixes to any of those semantics belong HERE,
    once."""
    if batch_id <= _read_applied(root, query_token):
        return  # replayed micro-batch: already folded into the state
    if not batch_df.take(1):
        return
    spark = batch_df.sparkSession
    part = make_part(batch_df)
    current = read_upsert_table(spark, root)
    _check_schema(current, part)
    if current is None:
        merged = part
    else:
        stored = _read_side_list(spark, root, side_table, payload_col)
        if stored is None:
            raise ValueError(
                f"accumulated state at {root} has no committed {side_table} "
                f"table — root of unknown {what} (written by another "
                "sink?); refusing to merge; start a new root"
            )
        if stored != payload:
            raise ValueError(mismatch_msg(stored))
        merged = merge_fn(current, part)
    # the payload travels WITH the state (committed before the pointer
    # swap), so readers never have to trust a re-supplied list
    payload_frame = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payload)], payload_schema
    )
    _commit_snapshot(
        root,
        merged,
        keep_versions,
        batch_marker=f"{query_token}\n{batch_id}",
        extra_frames={side_table: payload_frame},
    )


def _read_side_list(
    spark: SparkSession, root: str, side_table: str, payload_col: str
) -> list | None:
    """The payload committed with the CURRENT state version (None before
    the first commit, or for a root written by an older/other sink).
    Bounded read: |payload| rows, returned in committed index order."""
    v = _read_pointer(root)
    if v == 0:
        return None
    path = os.path.join(root, f"v{v:08d}", side_table)
    if not os.path.isdir(path):
        return None
    rows = spark.read.parquet(path).collect()
    return [r[payload_col] for r in sorted(rows, key=lambda r: r["i"])]


def _validate_keep_versions(keep_versions: int) -> None:
    if keep_versions < 1:
        raise ValueError(
            "keep_versions must be >= 1 — retention would delete the "
            "snapshot the pointer was just swapped to"
        )


def _validate_sink_args(keep_versions: int, query_token: str) -> None:
    _validate_keep_versions(keep_versions)
    if not query_token or "\n" in query_token:
        raise ValueError("query_token must be non-empty and newline-free")


def upsert_writer(
    root: str,
    key_cols: list[str] | str,
    order_col: str,
    keep_versions: int = 2,
):
    """foreachBatch function maintaining a keyed-upsert parquet table:
    ``stream.writeStream.foreachBatch(upsert_writer(...))``.

    A micro-batch can carry several updates for one key; ``order_col``
    picks the survivor deterministically (largest order value, ties to
    latest unimportant — the (key, order) pair should be unique, e.g. an
    event timestamp or a monotonically increasing sequence). The final
    table state is therefore independent of how the stream was chopped
    into micro-batches: per key, the row with the globally largest
    ``order_col`` wins.

    ``keep_versions`` old snapshots are retained for in-flight readers;
    older version directories are deleted after the pointer swap.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    _validate_keep_versions(keep_versions)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        current = read_upsert_table(spark, root)
        _check_schema(current, batch_df)
        # replay-safe MERGE in ONE window: per key, the largest-order row
        # of (stored ∪ batch) wins — dedups multi-update batches AND keeps
        # a replayed OLD batch from regressing a newer stored row (the
        # anti-join MERGE form could), idempotent under any replay order.
        both = batch_df if current is None else current.unionByName(batch_df)
        w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
        merged = (
            both.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        _commit_snapshot(root, merged, keep_versions)

    return write_batch


def topk_writer(
    root: str,
    group_cols: list[str] | str,
    order_col: str,
    tie_col: str,
    k: int,
    ascending: bool = False,
    keep_versions: int = 2,
):
    """foreachBatch function maintaining a per-group top-k LEADERBOARD
    table over the same versioned-snapshot layout as ``upsert_writer``:
    ``stream.writeStream.foreachBatch(topk_writer(...))``, read back with
    ``read_upsert_table``.

    Semantics: ``tie_col`` identifies the entity (a document, a user); per
    (group, entity) the best-``order_col`` row seen so far survives
    (an entity improving its score REPLACES its old row, it does not
    occupy two slots), then ``grouped_topk`` keeps the k best entities
    per group with a dense ``rank``. State is bounded at k rows per group
    regardless of stream length.

    Replay-safe by monotonicity, no dedup bookkeeping needed: the stored
    k-th best only ever improves, so a replayed old row is either an
    entity's non-best duplicate (loses its per-entity window) or ranks at
    or below the k-th best that once beat it (pruned again) — replaying
    any prefix of batches reproduces the same snapshot. The final state
    equals batch ``grouped_topk`` over everything the stream delivered —
    independent of micro-batch chopping (asserted in
    tests/test_streaming.py).

    Determinism contract (same as ``upsert_writer``'s (key, order)
    uniqueness): (group, entity, order) must determine the ROW — two rows
    for one entity sharing the same order value but differing in payload
    would leave the per-entity window an arbitrary pick, and the snapshot
    (and replays of it) could then flip payloads with partition order.
    Use an order column that never ties per entity (event timestamp,
    sequence number) when payload columns ride along.
    """
    from oni_ml_spark.datapipe.ranking import grouped_topk

    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    if k <= 0:
        raise ValueError("k must be positive")
    _validate_keep_versions(keep_versions)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        current = read_upsert_table(spark, root)
        if current is not None:
            current = current.drop("rank")
        _check_schema(current, batch_df)
        both = batch_df if current is None else current.unionByName(batch_df)
        # per-entity best first (direction follows the leaderboard order),
        # then the bounded per-group top-k
        direction = F.col(order_col).asc() if ascending else F.col(order_col).desc()
        we = Window.partitionBy(*groups, tie_col).orderBy(direction)
        best = (
            both.withColumn("__rn", F.row_number().over(we))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        merged = grouped_topk(
            best, groups, order_col, k, ascending=ascending, tie_col=tie_col
        )
        _commit_snapshot(root, merged, keep_versions)

    return write_batch


def _read_applied(root: str, query_token: str | None) -> int:
    """Micro-batch id recorded in the CURRENT version directory (-1 before
    the first commit). Reads through the pointer, so it always pairs with
    the snapshot ``read_upsert_table`` returns.

    The marker also carries the writing stream's ``query_token``: batch ids
    are only monotonic WITHIN one streaming query's checkpoint lineage, so
    comparing ids across different queries (a rebuilt checkpoint restarts
    at 0, a backfill job numbers independently) would silently skip real
    batches. A token mismatch raises instead of guessing; ``None`` skips
    the check (read-only callers that never compare ids)."""
    v = _read_pointer(root)
    if v == 0:
        return -1
    try:
        with open(os.path.join(root, f"v{v:08d}", _APPLIED)) as fh:
            stored_token, batch = fh.read().split("\n", 1)
            applied = int(batch.strip())
    except (FileNotFoundError, ValueError) as e:
        raise RuntimeError(
            f"stats table at {root} v{v:08d} has no readable {_APPLIED} "
            "marker — was this root written by a different sink? Refusing "
            "to guess replay state (a wrong guess double-counts sums)"
        ) from e
    if query_token is not None and stored_token != query_token:
        raise RuntimeError(
            f"stats table at {root} was last written by stream "
            f"{stored_token!r}, not {query_token!r} — batch ids are not "
            "comparable across streaming queries (a reset checkpoint "
            "restarts at 0 and would silently skip batches). Start a new "
            "root, or pass the original query_token to resume its lineage."
        )
    return applied


def stats_writer(
    root: str,
    key_cols: list[str] | str,
    value_cols: list[str] | str,
    keep_versions: int = 2,
    query_token: str = "default",
):
    """foreachBatch function maintaining an INCREMENTAL AGGREGATE STATE
    table (datapipe.incremental) over the versioned-snapshot layout:
    ``stream.writeStream.foreachBatch(stats_writer(...))``.

    Each micro-batch is partial-aggregated (count/sum/sumsq/min/max per
    key) and merged into the stored state — per-key statistics over the
    WHOLE stream history, maintained at state-table cost per batch, never
    rescanning history. Read the state back with ``read_upsert_table`` and
    finish it with ``incremental.finalize_aggregates``.

    Unlike the upsert/topk sinks, the merge here is NOT idempotent (a
    summed batch replayed would double-count), so this sink records the
    applied micro-batch id inside each committed version and SKIPS any
    batch with id <= the recorded one — foreachBatch replays reuse the
    original batch id, making the state exactly-once under restart/replay.
    Duplicate ROWS delivered in genuinely distinct batches are the
    source's contract (Spark's file/kafka sources are exactly-once per
    record into foreachBatch); the sink cannot distinguish them from real
    repeats.

    ``query_token`` names the CHECKPOINT LINEAGE the batch ids belong to
    (batch ids are only monotonic within one streaming query's checkpoint;
    use the checkpoint path or a stable job name). A marker written under a
    different token RAISES instead of comparing ids — the Delta
    txnAppId/txnVersion discipline: a rebuilt checkpoint restarts ids at 0,
    and silently honoring the old marker would drop every batch until the
    id catches up.

    State size = one row per distinct key — a dimension-table-sized frame
    rewritten per batch, the layout's documented scope. The 100 TB fact
    stream is what flows THROUGH; it is never stored.
    """
    from oni_ml_spark.datapipe.incremental import (
        merge_aggregate_state,
        partial_aggregates,
    )

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    vals = [value_cols] if isinstance(value_cols, str) else list(value_cols)
    _validate_sink_args(keep_versions, query_token)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= _read_applied(root, query_token):
            return  # replayed micro-batch: already folded into the state
        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        part = partial_aggregates(batch_df, keys, vals)
        current = read_upsert_table(spark, root)
        _check_schema(current, part)
        merged = part if current is None else merge_aggregate_state(current, part)
        _commit_snapshot(
            root, merged, keep_versions, batch_marker=f"{query_token}\n{batch_id}"
        )

    return write_batch


def read_appended(spark: SparkSession, root: str) -> DataFrame | None:
    """All data appended by a ``dedup_append_writer`` sink (None before the
    first commit), with an ``ingest_batch`` column recovered from the
    directory layout."""
    data_dir = os.path.join(root, "data")
    committed = _read_applied(_dedup_ledger(root), None)
    if committed < 0:
        return None
    df = spark.read.option("basePath", data_dir).parquet(data_dir)
    # a crash can leave a data dir for a batch whose ledger commit never
    # happened — those rows are not yet ingested (the replay will rewrite
    # them), so reads expose only batches the ledger marker covers
    return df.where(F.col("ingest_batch") <= committed)


def _dedup_ledger(root: str) -> str:
    return os.path.join(root, "ledger")


def dedup_append_writer(
    root: str,
    key_cols: list[str] | str,
    query_token: str = "default",
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
    use_bloom: bool = True,
    keep_versions: int = 2,
):
    """foreachBatch function for APPEND-ONLY exactly-once ingest dedup —
    the fact-stream shape the upsert/topk/stats sinks are explicitly not:
    data is never rewritten, only the keys-sized ledger is.

    Layout under ``root``: ``data/ingest_batch=<id>/`` holds each applied
    micro-batch's NEW rows (rows whose key was never seen before — first
    batch wins); ``ledger/`` is a versioned snapshot (the
    ``upsert_writer`` layout) of every ingested key plus the applied
    batch-id marker. Per batch: keys not in the ledger are appended to
    ``data``, then the ledger commits with the marker — data write happens
    FIRST, so a crash between them replays the batch, recomputes the same
    new-rows set against the unchanged ledger, and overwrites the same
    directory: exactly-once end to end. Read the ingested corpus back with
    ``read_appended`` (which hides data directories whose ledger commit
    never landed).

    The 100 TB scale shape: the fact table only ever APPENDS (one
    directory per batch — compact with io.compact_parquet if batches are
    small); the per-batch work is one anti join of the batch against the
    ledger, pre-filtered by a Bloom filter over the ledger keys
    (``use_bloom``) so the join shuffle carries the batch's true dups +
    the fpp sliver rather than every ledger key. The filter is maintained
    INCREMENTALLY: each version directory carries the bitmap covering its
    ledger (``_bloom/``, committed atomically with the snapshot by the
    same pointer swap), and a batch extends it by OR-ing in just its own
    new keys (``plans.bloom.update_bloom_filter``) — per-batch filter
    cost is ∝ the batch, never the accumulated ledger. ``num_bits`` /
    ``num_hashes`` apply to the FIRST build only; afterwards the stored
    filter's parameters are authoritative (size them for the ledger's
    eventual key count — ``expected_fpp``). The ledger rewrite per batch
    is keys-only — the documented dimension-table scope.

    Input contract: rows must be key-unique WITHIN a batch (validated —
    an arbitrary within-batch survivor would be nondeterministic under
    replay); keys must be non-null. ``query_token`` follows the
    ``stats_writer`` checkpoint-lineage discipline.
    """
    from oni_ml_spark.plans.bloom import (
        bloom_anti_join,
        build_bloom_filter,
        update_bloom_filter,
    )

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    _validate_sink_args(keep_versions, query_token)
    ledger_root = _dedup_ledger(root)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= _read_applied(ledger_root, query_token):
            return  # replayed micro-batch: already appended + in the ledger
        if not batch_df.take(1):
            return
        if "ingest_batch" in batch_df.columns:
            raise ValueError(
                "batch carries a reserved 'ingest_batch' column — rename it"
            )
        spark = batch_df.sparkSession
        missing = [k for k in keys if k not in batch_df.columns]
        if missing:
            raise ValueError(f"batch lacks key column(s) {missing}")
        null_key = (
            F.greatest(*[F.col(k).isNull().cast("int") for k in keys])
            if len(keys) > 1
            else F.col(keys[0]).isNull().cast("int")
        )
        # pin: the batch feeds validation + anti join + write
        batch_df = batch_df.localCheckpoint(eager=True)
        stats = batch_df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(null_key).alias("nulls"),
            F.count_distinct(*[F.col(k) for k in keys]).alias("nd"),
        ).collect()[0]
        if stats["nulls"]:
            raise ValueError(
                f"batch contains {stats['nulls']} null-key row(s) — null "
                "keys cannot be deduplicated"
            )
        if stats["n"] != stats["nd"]:
            raise ValueError(
                f"batch contains {stats['n'] - stats['nd']} duplicate-key "
                "row(s) — in-batch survivor choice would be nondeterministic "
                "under replay; dedupe the batch upstream (e.g. upsert_writer "
                "semantics) before the append sink"
            )
        ledger = read_upsert_table(spark, ledger_root)
        if ledger is not None:
            # schema-drift guard (the sibling sinks' _check_schema, adapted
            # to append-only data): a widened/narrowed restart would write
            # mixed-schema files, and a non-mergeSchema read samples ONE
            # footer — columns silently vanish or null out. Footer-only read.
            existing = dict(
                spark.read.parquet(os.path.join(root, "data"))
                .drop("ingest_batch")
                .dtypes
            )
            incoming = dict(batch_df.dtypes)
            if existing != incoming:
                raise ValueError(
                    "batch schema does not match the appended table "
                    f"({sorted(incoming.items())} vs {sorted(existing.items())}) "
                    "— appending mixed schemas would corrupt read_appended"
                )
        stored_bloom = None
        if use_bloom and ledger is not None:
            bloom_dir = os.path.join(
                ledger_root, f"v{_read_pointer(ledger_root):08d}", "_bloom"
            )
            if os.path.isdir(bloom_dir):
                # pin: the 1-row filter feeds the probe's param read, the
                # probe itself, and the update's param read + merge — unpinned,
                # each would re-read the (up to 16 MiB) file as its own job
                stored_bloom = spark.read.parquet(bloom_dir).localCheckpoint(
                    eager=True
                )
            else:  # pre-incremental table (or use_bloom toggled on): one rebuild
                stored_bloom = build_bloom_filter(
                    ledger, keys, num_bits, num_hashes
                ).localCheckpoint(eager=True)
        if ledger is None:
            new_rows = batch_df
        elif use_bloom:
            new_rows = bloom_anti_join(batch_df, ledger, keys, bloom=stored_bloom)
        else:
            new_rows = batch_df.join(ledger, keys, "left_anti")
        # data first, ledger second: a crash between them replays into the
        # same (unchanged-ledger) state and overwrites this directory
        new_rows = new_rows.localCheckpoint(eager=True)  # feeds write + ledger
        new_rows.write.mode("overwrite").parquet(
            os.path.join(root, "data", f"ingest_batch={batch_id}")
        )
        keys_new = new_rows.select(*keys)
        merged = keys_new if ledger is None else ledger.unionByName(keys_new)
        extra = None
        if use_bloom:
            # extend the committed filter by this batch's new keys only —
            # never rescan the ledger (first batch: plain build over itself)
            next_bloom = (
                build_bloom_filter(keys_new, keys, num_bits, num_hashes)
                if stored_bloom is None
                else update_bloom_filter(stored_bloom, keys_new, keys)
            )
            extra = {"_bloom": next_bloom}
        _commit_snapshot(
            ledger_root,
            merged,
            keep_versions,
            batch_marker=f"{query_token}\n{batch_id}",
            extra_frames=extra,
        )

    return write_batch
