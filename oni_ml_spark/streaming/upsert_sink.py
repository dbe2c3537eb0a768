"""Streaming keyed-upsert sink over plain parquet — MERGE INTO semantics
for a pipeline without a transactional table format.

Parquet cannot update in place, so the sink maintains a tiny versioned
layout under one root:

    root/v00000001/...parquet     (immutable full snapshots)
    root/v00000002/...
    root/_LATEST                  (atomic pointer: the current version)

Each micro-batch reads the current snapshot, runs ``merge_upsert`` against
the (deduplicated) batch, writes the merged result as the NEXT version
directory, then swaps the pointer with an atomic rename. Readers always go
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


def _read_pointer(root: str) -> int:
    try:
        with open(os.path.join(root, _POINTER)) as fh:
            return int(fh.read().strip())
    except (FileNotFoundError, ValueError):
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

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        # survivor per key: largest order_col (row_number, not dropDuplicates
        # — dropDuplicates keeps an arbitrary row)
        w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
        updates = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        current = read_upsert_table(spark, root)
        if current is None:
            merged = updates
        else:
            if sorted(current.columns) != sorted(updates.columns):
                raise ValueError(
                    "stream schema does not match the stored table "
                    f"({sorted(updates.columns)} vs {sorted(current.columns)})"
                )
            # replay-safe MERGE: datapipe.sampling.merge_upsert's anti-join
            # form would let a REPLAYED old batch regress a newer stored
            # row; union + per-key argmax over order_col keeps whichever
            # side is newer, which is idempotent under any replay order
            both = current.unionByName(updates)
            w2 = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
            merged = (
                both.withColumn("__rn", F.row_number().over(w2))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        v = _read_pointer(root) + 1
        merged.write.mode("overwrite").parquet(os.path.join(root, f"v{v:08d}"))
        _swap_pointer(root, v)
        # retention: drop directories older than keep_versions
        import shutil

        for entry in sorted(os.listdir(root)):
            if entry.startswith("v") and entry[1:].isdigit():
                if int(entry[1:]) <= v - keep_versions:
                    shutil.rmtree(os.path.join(root, entry), ignore_errors=True)

    return write_batch
