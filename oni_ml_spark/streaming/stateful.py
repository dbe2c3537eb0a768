"""Custom stateful streaming operators via applyInPandasWithState.

The brief's pattern for operators Structured Streaming lacks natively:
per-key Arrow-batched Python with explicit managed state. Demonstrated here
with streaming sessionization — per-user session numbering that persists
(last event epoch, session counter) across micro-batches and query
restarts, the stateful twin of datapipe.sessions.sessionize.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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
    ``gap_seconds``. State size is two scalars per key — bounded by key
    cardinality, not stream length.

    The gap math runs on a true-epoch column computed Spark-side
    (``cast(ts as double)``), so results match the batch sessionizer in any
    session timezone — pandas-side naive-timestamp arithmetic would drift
    across DST transitions. All rows of a key's micro-batch are concatenated
    and sorted once (Arrow may deliver them as several chunks), then session
    numbers come from one vectorized cumsum.
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
            last_epoch, session_no = -math.inf, 0
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        if len(pdf) == 0:
            return
        pdf = pdf.sort_values("__epoch", kind="mergesort", ignore_index=True)
        epochs = pdf["__epoch"].to_numpy()
        prev = np.concatenate(([last_epoch], epochs[:-1]))
        new_session = (epochs - prev) > gap_seconds  # -inf prev → True
        sessions = session_no + np.cumsum(new_session)
        state.update((float(epochs[-1]), int(sessions[-1])))
        yield pd.DataFrame(
            {
                "user": pdf[user_col],
                "ts": pdf[ts_col],
                "session_no": sessions.astype("int64"),
            }
        )

    from oni_ml_spark.transforms.time import time_as_double

    with_epoch = stream.select(
        user_col, ts_col, time_as_double(stream, ts_col).alias("__epoch")
    )
    return with_epoch.groupBy(user_col).applyInPandasWithState(
        assign_sessions,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
