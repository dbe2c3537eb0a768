"""Custom stateful streaming operators via applyInPandasWithState.

The brief's pattern for operators Structured Streaming lacks natively:
per-key Arrow-batched Python with explicit managed state. Demonstrated here
with streaming sessionization — per-user session numbering that persists
(last event time, session counter) across micro-batches, the stateful twin
of datapipe.sessions.sessionize.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def sessionize_stream(
    stream: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Streaming gap-based sessionization → (user, ts, session_no).

    State per user = (epoch of last event, running session counter); a new
    session starts when the gap since the last seen event exceeds
    ``gap_seconds``. State size is two scalars per key — bounded by the key
    cardinality, not the stream length. Within a micro-batch, events are
    processed in event-time order.
    """
    out_schema = T.StructType(
        [
            T.StructField("user", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("session_no", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("last_epoch", T.DoubleType()),
            T.StructField("session_no", T.LongType()),
        ]
    )

    def assign_sessions(key, pdf_iter, state: GroupState):
        if state.exists:
            last_epoch, session_no = state.get
        else:
            last_epoch, session_no = None, 0
        for pdf in pdf_iter:
            pdf = pdf.sort_values(ts_col)
            sessions = []
            for t in pdf[ts_col]:
                epoch = t.timestamp()
                if last_epoch is None or epoch - last_epoch > gap_seconds:
                    session_no += 1
                last_epoch = epoch
                sessions.append(session_no)
            yield pd.DataFrame(
                {
                    "user": [key[0]] * len(pdf),
                    "ts": pdf[ts_col].tolist(),
                    "session_no": sessions,
                }
            )
        state.update((float(last_epoch) if last_epoch is not None else 0.0, session_no))

    return (
        stream.select(user_col, ts_col)
        .groupBy(user_col)
        .applyInPandasWithState(
            assign_sessions,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
