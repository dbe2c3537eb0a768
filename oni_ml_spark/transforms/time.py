"""Time feature transforms — native arithmetic, no UDFs.

Reference: netflow/FlowWordCreation.scala:88-92 (fractional hour) and
utilities/TimeUtilities.scala:8-15 (HH:MM:SS → seconds past midnight).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fractional_hour(hour: Column | str, minute: Column | str, second: Column | str) -> Column:
    """hour + minute/60 + second/3600 as double (FlowWordCreation.scala:90-92)."""
    h = F.col(hour) if isinstance(hour, str) else hour
    m = F.col(minute) if isinstance(minute, str) else minute
    s = F.col(second) if isinstance(second, str) else second
    return h.cast("double") + m.cast("double") / 60 + s.cast("double") / 3600


def epoch_seconds(ts: Column | str) -> Column:
    """Timestamp → epoch seconds as double via TIMESTAMP (LTZ).

    CAVEAT — for TIMESTAMP_NTZ inputs the NTZ→LTZ step interprets the wall
    clock in the SESSION timezone, so on a session that is not UTC the
    result shifts by the zone offset (and is non-monotonic across DST).
    Use ``time_as_double`` instead whenever the frame is at hand: it
    dispatches on the actual column type, its NTZ branch is
    session-timezone-independent, and numeric columns keep their value (a
    double→timestamp round-trip would saturate past ±2^63 micros). This
    helper remains for Column-only call sites that guarantee an LTZ or
    UTC-session input.
    """
    t = F.col(ts) if isinstance(ts, str) else ts
    return t.cast("timestamp").cast("double")


_NTZ_EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def time_as_double(df, col: str) -> Column:
    """Column ``col`` of ``df`` as a double time axis, dispatching on type.

    - numeric → plain double cast (the value IS the time axis; routing a
      raw epoch-nanos long or a sequence number through a timestamp cast
      would saturate at ±~9.2e12 and silently equalize all large times)
    - TIMESTAMP_NTZ → exact epoch seconds via timestampdiff against the NTZ
      epoch literal — pure NTZ arithmetic, no session-timezone dependence
      (double stays micro-exact through year ~2255; matches DuckDB's
      tz-free epoch(ts) bit for bit)
    - TIMESTAMP (LTZ) → double cast (defined as the epoch, tz-free)
    - DATE/strings → through TIMESTAMP then double
    """
    dtype = dict(df.dtypes).get(col)
    if dtype == "timestamp_ntz":
        # F.col for the data column (a name containing backticks would break
        # SQL-string interpolation); only the constant epoch literal goes
        # through F.expr, which references no columns.
        return (
            F.timestamp_diff("MICROSECOND", F.expr(_NTZ_EPOCH), F.col(col))
            / F.lit(1000000.0)
        )
    if dtype == "timestamp":
        return F.col(col).cast("double")
    if dtype in ("date",) or (dtype or "").startswith(("string", "varchar")):
        return F.col(col).cast("timestamp").cast("double")
    return F.col(col).cast("double")


def time_as_timestamp(df, col: str) -> Column:
    """Column ``col`` as a TIMESTAMP (LTZ) for APIs that require one (e.g.
    ``withWatermark``), with the same session-timezone independence as
    ``time_as_double``: a TIMESTAMP_NTZ wall clock is interpreted as UTC
    via ``to_utc_timestamp(col, 'UTC')`` — deterministic on any driver —
    instead of a session-tz NTZ→LTZ cast. Other types take the plain
    timestamp cast (numeric = epoch seconds, the cast's own convention).
    """
    if dict(df.dtypes).get(col) == "timestamp_ntz":
        return F.to_utc_timestamp(F.col(col), "UTC")
    return F.col(col).cast("timestamp")


def seconds_of_day(time_str: Column | str) -> Column:
    """"HH:MM:SS" → seconds past midnight as double (TimeUtilities.scala:8-15)."""
    t = F.col(time_str) if isinstance(time_str, str) else time_str
    parts = F.split(t, ":")
    return (
        F.element_at(parts, 1).cast("int") * 3600
        + F.element_at(parts, 2).cast("int") * 60
        + F.element_at(parts, 3).cast("int")
    ).cast("double")
