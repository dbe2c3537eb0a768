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
byte-identical instead of duplicating — and the report is written AFTER
the data with any stale report retracted FIRST, so a report-bearing
quarantine dir always covers complete data even across a crash
mid-replay.  A batch the contract cannot even evaluate DETERMINISTICALLY
(a producer dropped or retyped a rule column; the batch's own data kills
a rule expression at evaluation) quarantines with a ``__contract_error``
report row instead of killing the stream; transient infrastructure
failures still fail the micro-batch so the streaming engine retries it.

Per batch the gate costs ONE bounded aggregate over the batch
(`contracts.run_expectations` — all rules in one pass); nothing about the
accumulated stream is rescanned.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException, PySparkException
from pyspark.sql import DataFrame, SparkSession

from oni_ml_spark.plans.compaction import _fs

# Spark error-condition families that are DETERMINISTIC functions of the
# batch's own data — a replay would fail identically, so quarantining is
# correct.  Everything outside this list is infra-suspect and must fail
# the micro-batch so Structured Streaming retries it.  Matching on the
# error CONDITION (Spark's stable, documented error-class registry)
# instead of the Python exception type, because the type is
# version-dependent: on PySpark 4.1 an ANSI cast error surfaces as
# NumberFormatException (a CapturedException), NOT SparkRuntimeException —
# a type-based gate either kills the stream on real data errors or
# quarantines healthy batches on infra noise, depending on version.
_DATA_ERROR_CONDITION_PREFIXES = (
    "CAST_",                      # CAST_INVALID_INPUT, CAST_OVERFLOW, ...
    "DIVIDE_BY_ZERO",
    "INTERVAL_DIVIDED_BY_ZERO",
    "ARITHMETIC_OVERFLOW",
    "INTERVAL_ARITHMETIC_OVERFLOW",
    "NUMERIC_VALUE_OUT_OF_RANGE",
    "INVALID_ARRAY_INDEX",        # ...and _IN_ELEMENT_AT
    "INVALID_INDEX_OF_ZERO",
    "INVALID_FRACTION_OF_SECOND",
    "MALFORMED_RECORD_IN_PARSING",
    "CANNOT_PARSE_",              # decimals, timestamps, protobuf...
    "DATETIME_OVERFLOW",
    "DATETIME_FIELD_OUT_OF_RANGE",
    "CONVERSION_INVALID_INPUT",
    "DUPLICATE_MAP_KEY",
    "MAP_KEY_DOES_NOT_EXIST",     # element_at on a map under ANSI
    "USER_RAISED_EXCEPTION",      # raise_error/assert_true inside a rule
)


def _error_condition(e: Exception) -> str | None:
    """The Spark error condition (error class) of ``e``, when it carries
    one.  getCondition is the 4.x name, getErrorClass the 3.x one."""
    for attr in ("getCondition", "getErrorClass"):
        getter = getattr(e, attr, None)
        if getter is None:
            continue
        try:
            cond = getter()
        except Exception:  # noqa: BLE001 — a broken getter is "no condition"
            return None
        # an explicit None from getCondition is authoritative — do NOT
        # fall through to the deprecated getErrorClass alias
        return str(cond) if cond else None
    return None


def _is_deterministic_data_error(e: Exception) -> bool:
    cond = _error_condition(e)
    return cond is not None and cond.startswith(_DATA_ERROR_CONDITION_PREFIXES)


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
        # one source read per batch: the gate's aggregate AND the inner
        # write (or quarantine write) both consume the pinned copy — the
        # upsert_sink convention
        batch_df = batch_df.localCheckpoint()
        try:
            report = run_expectations(batch_df, rules).collect()
            rows = [
                (r["rule"], r["column"], bool(r["ok"]), r["observed"], r["expected"])
                for r in report
            ]
            failed_msg = None
            if any(not r["ok"] for r in report):
                failed = [r for r in report if not r["ok"]]
                failed_msg = (
                    f"{len(failed)} expectation(s) failed — "
                    + _format_failures(failed)
                )
        except (ValueError, AnalysisException) as e:
            # a structurally un-evaluable batch is the most violated
            # contract of all — it must quarantine, not kill the stream.
            # ValueError: the gate's own pre-checks; AnalysisException: a
            # rule column the producer dropped or retyped (rlike over an
            # array fails analysis) — deterministic by construction
            rows = [("__contract_error", None, False, str(e), "contract evaluable")]
            failed_msg = f"contract not evaluable — {e}"
        except PySparkException as e:
            # Runtime failures classify by ERROR CONDITION, not exception
            # type (the type is Spark-version-dependent — see the module
            # prefix list): a deterministic data error (ANSI cast, divide
            # by zero...) would fail identically on replay, so it
            # quarantines; anything unclassified or non-data (executor
            # loss, shuffle fetch, OOM, Connect transport) re-raises so
            # the streaming engine retries the micro-batch — quarantining
            # a healthy batch on an infra blip would silently divert good
            # data.  Py4JJavaError (non-captured JVM faults) is not a
            # PySparkException and propagates naturally.
            if not _is_deterministic_data_error(e):
                raise
            cond = _error_condition(e)
            rows = [("__contract_error", None, False, f"[{cond}] {e}",
                     "contract evaluable")]
            failed_msg = f"contract not evaluable — [{cond}] {e}"
        if failed_msg is None:
            inner_writer(batch_df, batch_id)
            return
        if on_fail == "raise":
            raise ValueError(f"gated_writer: batch {batch_id}: {failed_msg}")
        spark = batch_df.sparkSession
        bdir = f"{quarantine_root}/batch={batch_id}"
        # replay hygiene: retract the completeness marker BEFORE touching
        # data, so a crash mid-rewrite can never leave a report-bearing
        # dir over partial data
        fs, _, jvm = _fs(spark, quarantine_root)
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{bdir}/_report"), True)
        batch_df.write.mode("overwrite").parquet(f"{bdir}/data")
        spark.createDataFrame(
            rows,
            "rule string, column string, ok boolean, observed string, expected string",
        ).write.mode("overwrite").parquet(f"{bdir}/_report")

    return write_batch


def quarantined_batches(spark: SparkSession, quarantine_root: str) -> list[int]:
    """Batch ids with a COMPLETE quarantine record (report landed — the
    data-then-report write order makes the report the completeness
    marker), ascending."""
    fs, jp, jvm = _fs(spark, quarantine_root)
    if not fs.exists(jp):
        return []
    out = []
    for st in fs.listStatus(jp):
        name = st.getPath().getName()
        suffix = name[len("batch="):]
        # digit guard: a stray batch=tmp / __HIVE_DEFAULT_PARTITION__ dir
        # must not crash the repair loop
        if name.startswith("batch=") and suffix.isdigit():
            marker = jvm.org.apache.hadoop.fs.Path(
                f"{quarantine_root}/{name}/_report/_SUCCESS"
            )
            if fs.exists(marker):
                out.append(int(suffix))
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
