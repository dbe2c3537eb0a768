"""Streaming corpus routing: classify every micro-batch with a FROZEN
hashed-feature multiclass model (``datapipe.classify.hashed_linear_argmax``
— fastText-style language / domain routing) and land the rows
label-partitioned, exactly-once.

Why a foreachBatch sink and not a plain streaming transform: the router is
two chained aggregations ((id, class) partial sums → per-doc argmax),
which Structured Streaming cannot run as a single continuous query; per
micro-batch it is the ordinary batch operator, so batch/stream parity
holds by construction (pinned by tests).

Layout under ``root``:
- ``data/ingest_batch=<id>/label=<cls>/`` — each applied batch's rows,
  partitioned by the routed label, so a per-language consumer's scan is
  PARTITION-PRUNED to its own directories (the point of routing at
  ingest: a 100 TB corpus read per-language never touches other
  languages' files);
- ``ledger/`` — a versioned snapshot (the ``upsert_sink`` commit
  protocol) of the running per-class row counts — the routing monitor —
  plus the applied-batch marker.

Exactly-once: data writes FIRST into its own ``ingest_batch=<id>``
directory with ``mode('overwrite')`` — a replayed batch recomputes the
same labels under the frozen model and overwrites the same directory —
then the ledger commits with the batch marker; ``read_routed`` exposes
only batches the marker covers, so a crash between the two steps is
invisible to readers and repaired by the replay.

Single-writer assumption (same discipline as ``upsert_sink``): exactly
ONE streaming query writes a given ``root``.  The applied-batch marker
makes any replay ORDER idempotent for that one writer — a replayed
batch-id at or below the marker is skipped before any work, so
interleaved replays cannot double-sum the ledger (pinned by test).  Two
CONCURRENT writers on one root would race the marker read (both could
see it unapplied and both merge the same batch's counts); run a second
query against its own root, or move the ledger to a transactional table
format.  Structured Streaming itself enforces this when the query owns
its checkpoint dir — the assumption only binds ad-hoc callers invoking
the writer function directly.

Scale shape per batch: one tokenize scan of the batch, one broadcast
model join, ONE (id, class) partial-sum aggregate, a |classes|-bounded
argmax, one partitioned write; the ledger merge is a |classes|-row
full-outer coalesce-sum.  Nothing rescans the accumulated stream.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oni_ml_spark.streaming.upsert_sink import (
    _commit_snapshot,
    _counts_merge,
    _read_applied,
    _validate_sink_args,
    read_upsert_table,
)

_RESERVED = ("label", "score_micro", "ingest_batch")


def routed_append_writer(
    root: str,
    weights: DataFrame,
    n_buckets: int,
    classes: list[str],
    id_col: str,
    text_col: str,
    *,
    biases: dict[str, int] | None = None,
    bigrams: bool = False,
    salt: int = 0,
    query_token: str = "default",
    keep_versions: int = 2,
):
    """foreachBatch function routing each micro-batch under a frozen
    multiclass model:

        writer = routed_append_writer(root, weights, 4096,
                                      ["en", "es", "fr"], "doc_id", "text")
        stream.writeStream.foreachBatch(writer)...

    ``weights``: the STATIC (bucket, cls, w_micro) model table (train once
    with ``train_hashed_linear_multiclass``, freeze, route forever — the
    stream never retrains).  Rows must be id-unique and id-non-null within
    a batch (validated: the router aggregates per id, so a duplicate would
    silently sum two documents' features into one verdict).
    ``query_token`` follows the sink module's checkpoint-lineage
    discipline."""
    from oni_ml_spark.datapipe.classify import hashed_linear_argmax

    _validate_sink_args(keep_versions, query_token)
    ledger_root = os.path.join(root, "ledger")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= _read_applied(ledger_root, query_token):
            return  # replayed micro-batch: data + ledger already landed
        if not batch_df.take(1):
            return
        clash = [c for c in _RESERVED if c in batch_df.columns]
        if clash:
            raise ValueError(
                f"routed_append_writer: batch carries reserved column(s) "
                f"{clash} — rename them"
            )
        if id_col not in batch_df.columns or text_col not in batch_df.columns:
            raise ValueError(
                f"routed_append_writer: batch lacks {id_col!r}/{text_col!r}"
            )
        # pin: the batch feeds validation + routing + the joined write
        batch_df = batch_df.localCheckpoint(eager=True)
        stats = batch_df.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.col(id_col)).alias("nd"),
            F.sum(F.col(id_col).isNull().cast("long")).alias("nulls"),
        ).first()
        if stats["nulls"]:
            raise ValueError(
                f"routed_append_writer: batch {batch_id} has {stats['nulls']} "
                f"null {id_col} row(s)"
            )
        if stats["nd"] != stats["n"]:
            raise ValueError(
                f"routed_append_writer: batch {batch_id} has duplicate "
                f"{id_col} values ({stats['n']} rows, {stats['nd']} distinct) "
                "— the router would sum distinct documents into one verdict"
            )
        routed = hashed_linear_argmax(
            batch_df, id_col, text_col, weights, n_buckets, classes,
            biases=biases, bigrams=bigrams, salt=salt,
        ).select(F.col("id").alias(id_col), "label", "score_micro")
        out = batch_df.join(routed, id_col)
        # data FIRST (overwrite-on-replay idempotent), ledger marker LAST
        bdir = f"{root}/data/ingest_batch={batch_id}"
        out.write.mode("overwrite").partitionBy("label").parquet(bdir)
        spark = batch_df.sparkSession
        # ledger counts from the JUST-WRITTEN batch directory, not from
        # `out` — re-consuming `out` would execute the whole routing
        # subtree (tokenize + broadcast join + two aggregations) a second
        # time; the read-back is batch-sized, and counting what actually
        # landed is the stronger invariant anyway
        counts = (
            spark.read.option("basePath", bdir).parquet(bdir)
            .groupBy("label").agg(F.count(F.lit(1)).alias("n_cur"))
        )
        current = read_upsert_table(spark, ledger_root)
        merged = (
            counts if current is None else _counts_merge("label")(current, counts)
        )
        _commit_snapshot(
            ledger_root, merged, keep_versions,
            batch_marker=f"{query_token}\n{batch_id}",
        )

    return write_batch


def read_routed(
    spark: SparkSession, root: str, label: str | None = None
) -> DataFrame | None:
    """The routed corpus (None before the first commit), ``ingest_batch``
    and ``label`` recovered from the directory layout; only batches whose
    ledger commit landed are exposed.  ``label`` filters to one class —
    and because the data is label-partitioned, the filter is PARTITION
    PRUNING: the scan lists only that label's directories."""
    data_dir = f"{root}/data"
    committed = _read_applied(os.path.join(root, "ledger"), None)
    if committed < 0:
        return None
    df = spark.read.option("basePath", data_dir).parquet(data_dir)
    df = df.where(F.col("ingest_batch") <= committed)
    if label is not None:
        df = df.where(F.col("label") == label)
    return df


def routing_counts(spark: SparkSession, root: str) -> DataFrame | None:
    """The running per-class row counts (the routing monitor — feed it to
    drift checks: a language mix shifting under a frozen model is the
    retrain signal).  |classes|-row table, read through the ledger
    pointer so it always matches what ``read_routed`` exposes.

    Exactly-once under the module's SINGLE-WRITER assumption: one
    streaming query per root.  Replays of any batch-id, in any
    interleaving, are skipped by the applied-batch marker before the
    ledger merge, so the counts cannot double-sum; concurrent writers on
    one root are outside the contract (see module docstring)."""
    return read_upsert_table(spark, os.path.join(root, "ledger"))
