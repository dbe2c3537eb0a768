"""Streaming data-contract gate with quarantine routing: validate every
micro-batch BEFORE the downstream sink sees it, and divert failing batches
whole (data + failure report) instead of killing a 24/7 ingest.

The batch-side siblings raise (`contracts.validate_expectations`, the
refresh-e2e discipline); a stream cannot afford that default — one
poisoned batch from a broken producer would stop ingest for every healthy
producer behind it.  So the gate writes the failing batch to
``quarantine_root/batch=<id>/data`` with a ``_report`` table naming the
failed rules, and the stream continues; ``on_fail='raise'`` restores the
hard-stop behavior for pipelines that prefer it.

Exactly-once composition: passing batches reach the wrapped writer
untouched, so ITS replay protocol (ledger markers, version commits) is
what it always was.  Quarantined batches write ``mode('overwrite')`` into
their own ``batch=<id>`` directory — a replayed failing batch lands
byte-identical instead of duplicating, and the report is written AFTER
the data (a report-bearing quarantine dir is complete).

Per batch the gate costs ONE bounded aggregate over the batch
(`contracts.run_expectations` — all rules in one pass); nothing about the
accumulated stream is rescanned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def gated_writer(
    inner_writer,
    rules,
    quarantine_root: str,
    *,
    on_fail: str = "quarantine",
):
    """Wrap a foreachBatch writer with the contract gate:

        writer = gated_writer(dedup_append_writer(root, "k"), contract,
                              "/data/quarantine/events")
        stream.writeStream.foreachBatch(writer)...

    ``rules``: `datapipe.contracts` expectations (one-aggregate batch
    validation).  ``on_fail='quarantine'`` diverts failing batches and
    returns; ``'raise'`` re-raises the gate error (stream stops)."""
    from oni_ml_spark.datapipe.contracts import _format_failures, run_expectations

    if on_fail not in ("quarantine", "raise"):
        raise ValueError(f"gated_writer: unknown on_fail {on_fail!r}")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        report = run_expectations(batch_df, rules).collect()
        failed = [r for r in report if not r["ok"]]
        if not failed:
            inner_writer(batch_df, batch_id)
            return
        if on_fail == "raise":
            raise ValueError(
                f"gated_writer: batch {batch_id}: {len(failed)} "
                f"expectation(s) failed — {_format_failures(failed)}"
            )
        bdir = f"{quarantine_root}/batch={batch_id}"
        batch_df.write.mode("overwrite").parquet(f"{bdir}/data")
        spark = batch_df.sparkSession
        spark.createDataFrame(
            [
                (r["rule"], r["column"], bool(r["ok"]), r["observed"], r["expected"])
                for r in report
            ],
            "rule string, column string, ok boolean, observed string, expected string",
        ).write.mode("overwrite").parquet(f"{bdir}/_report")

    return write_batch


def quarantined_batches(spark: SparkSession, quarantine_root: str) -> list[int]:
    """Batch ids with a COMPLETE quarantine record (report landed — the
    data-then-report write order makes the report the completeness
    marker), ascending."""
    jvm = spark._jvm
    jp = jvm.org.apache.hadoop.fs.Path(quarantine_root)
    fs = jp.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jp):
        return []
    out = []
    for st in fs.listStatus(jp):
        name = st.getPath().getName()
        if name.startswith("batch="):
            marker = jvm.org.apache.hadoop.fs.Path(
                f"{quarantine_root}/{name}/_report/_SUCCESS"
            )
            if fs.exists(marker):
                out.append(int(name[len("batch="):]))
    return sorted(out)


def read_quarantined(
    spark: SparkSession, quarantine_root: str, batch_id: int
) -> tuple[DataFrame, DataFrame]:
    """(data, report) of one quarantined batch — the repair loop's input:
    fix the rows, revalidate with the same rules, re-submit upstream."""
    if batch_id not in quarantined_batches(spark, quarantine_root):
        raise ValueError(
            f"read_quarantined: batch {batch_id} has no complete quarantine "
            f"record under {quarantine_root}"
        )
    bdir = f"{quarantine_root}/batch={batch_id}"
    return (
        spark.read.parquet(f"{bdir}/data"),
        spark.read.parquet(f"{bdir}/_report"),
    )
