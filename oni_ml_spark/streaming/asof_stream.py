"""Stream-STREAM as-of join via applyInPandasWithState.

Both sides are streams: right rows (price updates, config changes,
checkpoints) buffer in per-key managed state; left rows match against the
latest buffered right row at-or-before their event time. Spark's built-in
stream-stream join cannot express "the single latest match" (it emits every
row inside the time bound), so this is the custom-stateful-operator path.

Two variants, one shared machinery:

- ``as_of_join_stream`` — emit-on-arrival: a left row matches rights
  processed in its micro-batch or earlier; a right arriving later does NOT
  retroactively re-emit it. Lowest latency; feed rights ahead of lefts when
  completeness matters.
- ``as_of_join_stream_watermarked`` — completeness-first: left rows wait in
  state until the event-time watermark passes their time
  (EventTimeTimeout wakes idle keys), so rights arriving within the
  watermark delay still match retroactively. Latency = one watermark
  delay; lefts beyond the final watermark never flush (append-mode
  semantics, same as windowed aggregations).

Shared semantics and limits:
- left rows with a NULL time are DROPPED (watermark/event-time semantics
  need a time; the batch ``datapipe.temporal.as_of_join`` instead emits
  them unmatched — a documented divergence).
- duplicate (key, rt) rights resolve deterministically by greatest
  serialized-JSON payload; NOTE this can differ from the batch operator's
  typed-tuple tie rule (e.g. "9.0" > "10.0" lexicographically). Matched
  TIME is identical either way.
- state per key is bounded: rights newer than (or the single latest at)
  the relevant horizon, never the stream's length.
- payload columns ride managed state as JSON strings, so both sides are
  restricted to string / long / int / double / boolean (+ timestamp on the
  left, repaired after the round-trip). Keep heavy payloads out and join
  them back by id downstream.
"""

from __future__ import annotations

import bisect
import json

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OK_TYPES = (T.StringType, T.LongType, T.IntegerType, T.DoubleType, T.BooleanType)
_OK_LEFT_TYPES = _OK_TYPES + (T.TimestampType,)


def _validated_right_cols(right: DataFrame, key: str, right_time: str, right_cols):
    cols = right_cols if right_cols is not None else [
        c for c in right.columns if c not in (key, right_time)
    ]
    rfields = {f.name: f.dataType for f in right.schema.fields}
    for c in cols:
        if not isinstance(rfields[c], _OK_TYPES):
            raise ValueError(
                f"right column {c!r} has unsupported type {rfields[c]} "
                "(string/long/int/double/boolean only)"
            )
    return cols, rfields


def _validate_left(left: DataFrame) -> None:
    for f in left.schema.fields:
        if not isinstance(f.dataType, _OK_LEFT_TYPES):
            raise ValueError(
                f"left column {f.name!r} has unsupported type {f.dataType}: "
                "the state buffer JSON round-trip supports "
                "string/long/int/double/boolean/timestamp"
            )


def _out_schema(left: DataFrame, right_cols, rfields) -> T.StructType:
    fields = [T.StructField(f.name, f.dataType) for f in left.schema.fields]
    fields.append(T.StructField("__matched_time", T.DoubleType()))
    fields += [T.StructField(c, rfields[c]) for c in right_cols]
    return T.StructType(fields)


def _tag_sides(left, right, key, left_time, right_time, right_cols, as_timestamp):
    from oni_ml_spark.transforms.time import time_as_double, time_as_timestamp

    # both branches dispatch on the column's actual type so TIMESTAMP_NTZ
    # inputs are handled session-timezone-independently: the double branch
    # via NTZ epoch arithmetic (a straight NTZ→DOUBLE cast is illegal), the
    # timestamp branch (watermark variant) via to_utc_timestamp rather than
    # a session-tz NTZ→LTZ cast
    lt = time_as_timestamp(left, left_time) if as_timestamp else time_as_double(left, left_time)
    rt = time_as_timestamp(right, right_time) if as_timestamp else time_as_double(right, right_time)
    l_tagged = left.select(
        F.col(key).alias("__k"), lt.alias("__ts"), F.lit(1).alias("__side"),
        F.to_json(F.struct(*left.columns)).alias("__payload"),
    )
    r_tagged = right.select(
        F.col(key).alias("__k"), rt.alias("__ts"), F.lit(0).alias("__side"),
        F.to_json(F.struct(*[F.col(c) for c in right_cols])).alias("__payload"),
    )
    return l_tagged.unionByName(r_tagged).filter(F.col("__ts").isNotNull())


def _match_one(payload: str, t: float, r_keys: list, r_payloads: list) -> dict:
    row = json.loads(payload)
    idx = bisect.bisect_right(r_keys, t) - 1
    if idx >= 0:
        row["__matched_time"] = r_keys[idx]
        row.update(json.loads(r_payloads[idx]))
    else:
        row["__matched_time"] = None
    return row


def _insort_pair(keys: list, values: list, k: float, v: str) -> None:
    """Insert keeping (k, v) pairs sorted by (k, v) — parallel lists so
    match lookups stay pure bisect instead of rebuilding key lists."""
    i = bisect.bisect_right(keys, k)
    # among equal keys, order by value (deterministic duplicate tie rule)
    while i > 0 and keys[i - 1] == k and values[i - 1] > v:
        i -= 1
    keys.insert(i, k)
    values.insert(i, v)


def _finalize(out_rows, left_names, right_cols, out_schema):
    out = pd.DataFrame(out_rows)
    for name in [*left_names, "__matched_time", *right_cols]:
        if name not in out.columns:
            out[name] = None
    # left timestamp columns round-trip through to_json as ISO strings —
    # parse them back for the Arrow conversion
    for f in out_schema.fields:
        if isinstance(f.dataType, T.TimestampType) and f.name in out.columns:
            out[f.name] = pd.to_datetime(out[f.name])
    return out[[*left_names, "__matched_time", *right_cols]]


def as_of_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    buffer_seconds: float = 86_400.0,
) -> DataFrame:
    """Streaming twin of datapipe.temporal.as_of_join (backward direction),
    emit-on-arrival semantics — see the module docstring. Output layout
    matches the batch operator (left columns + __matched_time + right_cols).
    """
    _validate_left(left)
    right_cols, rfields = _validated_right_cols(right, key, right_time, right_cols)
    u = _tag_sides(
        left, right, key, left_time, right_time, right_cols, as_timestamp=False
    ).withColumnRenamed("__ts", "__t")

    out_schema = _out_schema(left, right_cols, rfields)
    state_schema = T.StructType(
        [
            T.StructField("rts", T.ArrayType(T.DoubleType())),
            T.StructField("payloads", T.ArrayType(T.StringType())),
        ]
    )
    left_names = [f.name for f in left.schema.fields]

    def join_group(group_key, pdf_iter, state: GroupState):
        r_keys, r_payloads = (
            [list(x) for x in state.get] if state.exists else ([], [])
        )
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        if len(pdf) == 0:
            return
        # process the whole batch in time order, rights before lefts on ties
        pdf = pdf.sort_values(
            ["__t", "__side", "__payload"], kind="mergesort", ignore_index=True
        )
        out_rows = []
        for t, side, payload in zip(pdf["__t"], pdf["__side"], pdf["__payload"]):
            if side == 0:
                _insort_pair(r_keys, r_payloads, float(t), payload)
            else:
                out_rows.append(_match_one(payload, t, r_keys, r_payloads))
        if r_keys:
            horizon = r_keys[-1] - buffer_seconds
            cut = bisect.bisect_left(r_keys, horizon)
            r_keys, r_payloads = r_keys[cut:], r_payloads[cut:]
            state.update((r_keys, r_payloads))
        if out_rows:
            yield _finalize(out_rows, left_names, right_cols, out_schema)

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
) -> DataFrame:
    """Watermark-aligned stream-stream as-of — see the module docstring.

    Right-buffer retention is EXACT, not heuristic: every future or pending
    left has t > watermark (older rows are filtered by the watermark), so
    keeping the single latest right at-or-before the watermark plus
    everything newer preserves every possible match; state stays bounded by
    the watermark delay × right-update rate + 1.
    """
    _validate_left(left)
    right_cols, rfields = _validated_right_cols(right, key, right_time, right_cols)
    u = _tag_sides(
        left, right, key, left_time, right_time, right_cols, as_timestamp=True
    ).withWatermark("__ts", watermark_delay).withColumn(
        "__t", F.col("__ts").cast("double")
    )

    out_schema = _out_schema(left, right_cols, rfields)
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
        r_keys, r_payloads, l_keys, l_payloads = (
            [list(x) for x in state.get] if state.exists else ([], [], [], [])
        )
        for pdf in pdf_iter:
            for t, side, payload in zip(pdf["__t"], pdf["__side"], pdf["__payload"]):
                if side == 0:
                    _insort_pair(r_keys, r_payloads, float(t), payload)
                else:
                    _insort_pair(l_keys, l_payloads, float(t), payload)

        wm = state.getCurrentWatermarkMs() / 1000.0
        flush = bisect.bisect_right(l_keys, wm)
        out_rows = [
            _match_one(p, t, r_keys, r_payloads)
            for t, p in zip(l_keys[:flush], l_payloads[:flush])
        ]
        l_keys, l_payloads = l_keys[flush:], l_payloads[flush:]

        # exact retention: latest right <= wm + all rights > wm
        cut = max(bisect.bisect_right(r_keys, wm) - 1, 0)
        r_keys, r_payloads = r_keys[cut:], r_payloads[cut:]
        state.update((r_keys, r_payloads, l_keys, l_payloads))
        if l_keys:
            # wake this key once the watermark passes its earliest pending
            # left, even if no new data arrives for it
            state.setTimeoutTimestamp(int(l_keys[0] * 1000) + 1)

        if out_rows:
            yield _finalize(out_rows, left_names, right_cols, out_schema)

    return u.groupBy("__k").applyInPandasWithState(
        join_group,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
