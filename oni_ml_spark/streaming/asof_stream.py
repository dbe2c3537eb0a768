"""Stream-STREAM as-of join via applyInPandasWithState.

Both sides are streams: right rows (price updates, config changes,
checkpoints) buffer in per-key managed state; left rows match against the
latest buffered right row at-or-before their event time. Spark's built-in
stream-stream join cannot express "the single latest match" (it emits every
row inside the time bound), so this is the custom-stateful-operator path.

Semantics (deliberately simple and documented, in processing order):
- a left row matches the latest right row with rt <= t among rights
  processed in its micro-batch OR EARLIER. A right row that arrives in a
  later micro-batch than a left row it would have matched does NOT
  retroactively re-emit that left row — emit-on-arrival, not
  emit-on-watermark. Feed the right stream ahead of (or together with) the
  left stream when completeness matters.
- duplicate (key, rt) rights resolve deterministically (greatest serialized
  payload wins), matching the batch operator's tie rule.
- state per key = right rows within ``buffer_seconds`` of the newest right
  seen — bounded by update rate × horizon, never by stream length.

Supported right payload types: string / long / double / boolean (the state
buffer serializes rows as JSON strings; keep heavy payloads out of the
right stream and join them back by id downstream).

``as_of_join_stream_watermarked`` is the completeness-first variant: left
rows wait in state until the stream watermark passes their event time, so a
right row arriving within the watermark delay still matches retroactively.
The price is emission latency (one watermark delay) and that left rows
beyond the final watermark never flush — the same append-mode semantics as
Spark's windowed aggregations.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OK_TYPES = (T.StringType, T.LongType, T.IntegerType, T.DoubleType, T.BooleanType)


def as_of_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    buffer_seconds: float = 86_400.0,
) -> DataFrame:
    """Streaming twin of datapipe.temporal.as_of_join (backward direction).

    Returns every left row + ``__matched_time`` + ``right_cols``. Output
    column layout matches the batch operator so downstream code is
    side-agnostic.
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in (key, right_time)
    ]
    rfields = {f.name: f.dataType for f in right.schema.fields}
    for c in right_cols:
        if not isinstance(rfields[c], _OK_TYPES):
            raise ValueError(
                f"right column {c!r} has unsupported type {rfields[c]} "
                "(string/long/int/double/boolean only)"
            )

    # union the two streams with a side tag; payload rides as JSON so one
    # state/schema shape covers any right column set
    l_tagged = left.select(
        F.col(key).alias("__k"),
        F.col(left_time).cast("double").alias("__t"),
        F.lit(1).alias("__side"),
        F.to_json(F.struct(*left.columns)).alias("__payload"),
    )
    r_tagged = right.select(
        F.col(key).alias("__k"),
        F.col(right_time).cast("double").alias("__t"),
        F.lit(0).alias("__side"),
        F.to_json(F.struct(*[F.col(c) for c in right_cols])).alias("__payload"),
    )
    u = l_tagged.unionByName(r_tagged).filter(F.col("__t").isNotNull())

    out_fields = [T.StructField(f.name, f.dataType) for f in left.schema.fields]
    out_fields.append(T.StructField("__matched_time", T.DoubleType()))
    out_fields += [T.StructField(c, rfields[c]) for c in right_cols]
    out_schema = T.StructType(out_fields)
    state_schema = T.StructType(
        [
            T.StructField("rts", T.ArrayType(T.DoubleType())),
            T.StructField("payloads", T.ArrayType(T.StringType())),
        ]
    )
    left_names = [f.name for f in left.schema.fields]

    def join_group(group_key, pdf_iter, state: GroupState):
        import bisect

        rts, payloads = state.get if state.exists else ([], [])
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        if len(pdf) == 0:
            return
        # process the whole batch in time order (right before left on ties,
        # greatest payload last among duplicate rts — matches batch rules)
        pdf = pdf.sort_values(
            ["__t", "__side", "__payload"], kind="mergesort", ignore_index=True
        )
        buf = sorted(zip(rts, payloads))
        out_rows = []
        for t, side, payload in zip(pdf["__t"], pdf["__side"], pdf["__payload"]):
            if side == 0:
                # insort, not append: state may hold rts newer than this
                # batch's earliest rows (out-of-order arrival across batches)
                bisect.insort(buf, (float(t), payload))
            else:
                row = json.loads(payload)
                idx = np.searchsorted([b[0] for b in buf], t, side="right") - 1
                if idx >= 0:
                    rt, rpay = buf[idx]
                    row["__matched_time"] = rt
                    row.update(json.loads(rpay))
                else:
                    row["__matched_time"] = None
                out_rows.append(row)
        if buf:
            horizon = buf[-1][0] - buffer_seconds
            buf = [b for b in buf if b[0] >= horizon]
            state.update(([b[0] for b in buf], [b[1] for b in buf]))
        if out_rows:
            out = pd.DataFrame(out_rows)
            for name in [*left_names, "__matched_time", *right_cols]:
                if name not in out.columns:
                    out[name] = None
            # left timestamp columns round-trip through to_json as ISO
            # strings — parse them back for the Arrow conversion
            for f in out_schema.fields:
                if isinstance(f.dataType, T.TimestampType) and f.name in out.columns:
                    out[f.name] = pd.to_datetime(out[f.name])
            yield out[[*left_names, "__matched_time", *right_cols]]

    return u.groupBy("__k").applyInPandasWithState(
        join_group,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def as_of_join_stream_watermarked(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    watermark_delay: str = "10 seconds",
    buffer_seconds: float = 86_400.0,
) -> DataFrame:
    """Watermark-aligned stream-stream as-of: emit each left row only once
    the event-time watermark passes its time, so every right row the
    watermark still admits has been buffered before the match is decided.

    Event-time columns must be timestamps (the watermark is event-time).
    Left rows with t > final watermark stay in state forever (append-mode
    semantics); right buffer pruning follows ``buffer_seconds``.
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in (key, right_time)
    ]
    rfields = {f.name: f.dataType for f in right.schema.fields}
    for c in right_cols:
        if not isinstance(rfields[c], _OK_TYPES):
            raise ValueError(
                f"right column {c!r} has unsupported type {rfields[c]} "
                "(string/long/int/double/boolean only)"
            )

    l_tagged = left.select(
        F.col(key).alias("__k"),
        F.col(left_time).cast("timestamp").alias("__ts"),
        F.lit(1).alias("__side"),
        F.to_json(F.struct(*left.columns)).alias("__payload"),
    )
    r_tagged = right.select(
        F.col(key).alias("__k"),
        F.col(right_time).cast("timestamp").alias("__ts"),
        F.lit(0).alias("__side"),
        F.to_json(F.struct(*[F.col(c) for c in right_cols])).alias("__payload"),
    )
    u = (
        l_tagged.unionByName(r_tagged)
        .filter(F.col("__ts").isNotNull())
        .withWatermark("__ts", watermark_delay)
        .withColumn("__t", F.col("__ts").cast("double"))
    )

    out_fields = [T.StructField(f.name, f.dataType) for f in left.schema.fields]
    out_fields.append(T.StructField("__matched_time", T.DoubleType()))
    out_fields += [T.StructField(c, rfields[c]) for c in right_cols]
    out_schema = T.StructType(out_fields)
    state_schema = T.StructType(
        [
            T.StructField("rts", T.ArrayType(T.DoubleType())),
            T.StructField("rpayloads", T.ArrayType(T.StringType())),
            T.StructField("lts", T.ArrayType(T.DoubleType())),
            T.StructField("lpayloads", T.ArrayType(T.StringType())),
        ]
    )
    left_names = [f.name for f in left.schema.fields]

    def join_group(group_key, pdf_iter, state: GroupState):
        import bisect

        rts, rpays, lts, lpays = (
            state.get if state.exists else ([], [], [], [])
        )
        rbuf = sorted(zip(rts, rpays))
        lbuf = sorted(zip(lts, lpays))
        for pdf in pdf_iter:
            for t, side, payload in zip(pdf["__t"], pdf["__side"], pdf["__payload"]):
                bisect.insort(rbuf if side == 0 else lbuf, (float(t), payload))

        wm = state.getCurrentWatermarkMs() / 1000.0
        ready = [x for x in lbuf if x[0] <= wm]
        lbuf = [x for x in lbuf if x[0] > wm]

        out_rows = []
        for t, payload in ready:
            row = json.loads(payload)
            idx = bisect.bisect_right([b[0] for b in rbuf], t) - 1
            if idx >= 0:
                rt, rpay = rbuf[idx]
                row["__matched_time"] = rt
                row.update(json.loads(rpay))
            else:
                row["__matched_time"] = None
            out_rows.append(row)

        # prune rights the watermark AND the buffer horizon are both past;
        # keep anything a pending left might still need (min pending t)
        floor_t = min([x[0] for x in lbuf], default=wm) - buffer_seconds
        rbuf = [b for b in rbuf if b[0] >= min(floor_t, wm)] or rbuf[-1:]
        state.update(
            (
                [b[0] for b in rbuf], [b[1] for b in rbuf],
                [x[0] for x in lbuf], [x[1] for x in lbuf],
            )
        )
        if lbuf:
            # wake this key when the watermark passes its earliest pending
            # left, even if no new data arrives for it
            state.setTimeoutTimestamp(int(min(x[0] for x in lbuf) * 1000) + 1)

        if out_rows:
            out = pd.DataFrame(out_rows)
            for name in [*left_names, "__matched_time", *right_cols]:
                if name not in out.columns:
                    out[name] = None
            for f in out_schema.fields:
                if isinstance(f.dataType, T.TimestampType) and f.name in out.columns:
                    out[f.name] = pd.to_datetime(out[f.name])
            yield out[[*left_names, "__matched_time", *right_cols]]

    return u.groupBy("__k").applyInPandasWithState(
        join_group,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
