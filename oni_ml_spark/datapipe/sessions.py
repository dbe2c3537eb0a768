"""Event sessionization — gap-based session ids per user.

The classic event-analytics operator the reference lacks entirely: a new
session starts when the gap since the user's previous event exceeds the
timeout. One window (lag) + one running sum, both partitioned by user — the
shuffle is on user_id and every step after is within-partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from oni_ml_spark.datapipe.temporal import _as_key_list
from oni_ml_spark.transforms.time import time_as_double


def sessionize(
    df: DataFrame,
    user_col: str | list[str],
    ts_col: str,
    gap_seconds: int = 1800,
    session_col: str = "session_no",
) -> DataFrame:
    """Attach a per-user session number (1-based, ordered by event time).
    ``user_col`` may be one column or a list (composite entities, e.g.
    (user, device)).

    Ties on the timestamp stay in one session (lag sees the previous row in
    (ts) order; a deterministic secondary sort on the row's natural key can
    be added by callers needing total order).
    """
    ucols = _as_key_list(user_col, "sessionize")
    w = Window.partitionBy(*ucols).orderBy(ts_col)
    t = time_as_double(df, ts_col)
    gap = t - F.lag(t).over(w)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    new_session = F.when(prev_ts.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long"),
    )


def session_stats(
    df: DataFrame, user_col: str | list[str], ts_col: str, gap_seconds: int = 1800
) -> DataFrame:
    """Per-session aggregate: (user, session_no, n_events, start, end,
    duration_sec)."""
    ucols = _as_key_list(user_col, "session_stats")
    s = sessionize(df, user_col, ts_col, gap_seconds)
    return s.groupBy(*ucols, "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max(time_as_double(df, ts_col)) - F.min(time_as_double(df, ts_col)))
        .alias("duration_sec"),
    )
