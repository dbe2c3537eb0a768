"""Temporal joins Spark has no native operator for: as-of join and range
join — both expressed as compositions of shuffle-friendly DataFrame ops
(no cross join, no per-key driver loop), per the task's custom-operator
guidance (composition first, Pandas UDF only if semantics demand it).

- ``as_of_join``: for every left row, the single most recent right row with
  right_time <= left_time (backward; or the earliest >=, forward) per key —
  the price-lookup / config-at-time / last-checkpoint join. Implemented as
  the classic union + window carry-forward: one shuffle on the key, one
  per-key ordered window, no join node at all. A naive implementation is a
  non-equi theta join (cross product per key); this is linear in rows.
- ``range_join_bucketed``: points ⋈ intervals on value ∈ [lo, hi] without
  the O(points × intervals) nested-loop plan Spark falls back to for pure
  inequality joins: intervals explode to the fixed-width buckets they
  cover, points hash to their bucket, and the join becomes an EQUI join on
  bucket followed by the exact range filter. Bucket width is the knob:
  explosion factor ≈ interval_len / bucket_width + 1.

At 100 TB both plans shuffle once on (key | bucket) — skew on a hot key or
a very wide interval is handled the usual way (AQE skew join / salting /
smaller bucket width).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_key_list(key: str | list[str], caller: str) -> list[str]:
    """Normalize a key argument to a non-empty list. The emptiness check
    matters everywhere: ``Window.partitionBy()`` with zero columns
    silently degenerates to ONE unpartitioned global window — the
    single-reducer cliff — instead of erroring."""
    keys = [key] if isinstance(key, str) else list(key)
    if not keys:
        raise ValueError(f"{caller}: key must name at least one column")
    return keys


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str | list[str],
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """Left as-of join: attach the latest right row at-or-before each left
    row's time (direction='backward'; ties match), or the earliest
    at-or-after (direction='forward'). Unmatched left rows keep nulls;
    ``tolerance`` (in the time column's numeric units, seconds for
    timestamps) nulls out matches further away than that.

    Same semantics as DuckDB's ASOF LEFT JOIN (the test oracle, including a
    hypothesis fuzz comparison) with one deliberate divergence: DuckDB's
    sort-based ASOF matches a NULL left time to the LAST right row (nulls
    sort past everything) — here a null time never matches anything. Right
    rows with a null time never match either, and the matched row's payload
    travels as
    a unit (a NULL inside the matched row's payload stays NULL — it is
    never backfilled from an older right row). Duplicate (key, time) right
    rows are resolved deterministically by the greatest payload tuple.
    ``key`` may be one column or a list (composite keys, e.g.
    (user, symbol)); a right row with ANY null key component never
    matches — SQL null-never-equals semantics, NOT the null-grouping a
    naive partitionBy would do. Output = every left row + ``right_cols``
    + the matched right time as ``__matched_time``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = _as_key_list(key, "as_of_join")
    if right_cols is None:  # explicit [] means "matched time only"
        right_cols = [c for c in right.columns if c not in (*keys, right_time)]

    # one unioned frame: right rows carry their WHOLE payload as one struct
    # (so last(ignorenulls) can't mix columns from different right rows),
    # left rows carry a null struct; within equal times the right row sorts
    # first so the window sees it as "already happened" and ties match
    # type-dispatched time axis: numeric columns stay numeric (a
    # double→timestamp round-trip would saturate past ±2^63 micros and
    # silently equalize large times), TIMESTAMP_NTZ takes the
    # session-tz-independent epoch path, LTZ casts straight to its epoch
    from oni_ml_spark.transforms.time import time_as_double

    lt = time_as_double(left, left_time)
    rt = time_as_double(right, right_time)
    kcols = [f"__k{i}" for i in range(len(keys))]
    # right rows with any null key component can never equi-match (SQL
    # null-never-equals semantics — partitionBy would otherwise group the
    # nulls together and match them, which ASOF ON l.k = r.k never does)
    r_non_null = rt.isNotNull()
    for k in keys:
        r_non_null = r_non_null & F.col(k).isNotNull()
    r_payload = F.struct(rt.alias("__rt"), *[F.col(c) for c in right_cols])
    r_tagged = right.filter(r_non_null).select(
        *[F.col(k).alias(a) for k, a in zip(keys, kcols)],
        rt.alias("__t"), F.lit(0).alias("__side"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns)).schema[0].dataType
        ).alias("__left"),
        r_payload.alias("__rpay"),
    )
    l_tagged = left.select(
        *[F.col(k).alias(a) for k, a in zip(keys, kcols)],
        lt.alias("__t"), F.lit(1).alias("__side"),
        F.struct(*left.columns).alias("__left"),
        F.lit(None).cast(
            right.select(r_payload).schema[0].dataType
        ).alias("__rpay"),
    )
    u = l_tagged.unionByName(r_tagged)

    # the trailing __rpay sort key makes duplicate (key, time) right rows
    # deterministic: the greatest payload tuple wins (nulls — left rows —
    # sort first, so they never displace a real payload)
    if direction == "backward":
        order = [F.asc_nulls_first("__t"), F.asc("__side"), F.asc_nulls_first("__rpay")]
    else:
        order = [F.desc_nulls_last("__t"), F.asc("__side"), F.asc_nulls_first("__rpay")]
    w = Window.partitionBy(*kcols).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )

    matched = F.last("__rpay", ignorenulls=True).over(w)
    # a left row with null time must never match (forward ordering would
    # otherwise sort it after every right row and pick one up)
    matched = F.when(F.col("__t").isNotNull(), matched)
    carried = u.select(
        "__side", "__left", "__t", matched.alias("__m")
    ).filter(F.col("__side") == 1)

    if tolerance is not None:
        dist = (
            F.col("__t") - F.col("__m.__rt")
            if direction == "backward"
            else F.col("__m.__rt") - F.col("__t")
        )
        carried = carried.withColumn(
            "__m", F.when(F.col("__m").isNotNull() & (dist <= tolerance), F.col("__m"))
        )
    return carried.select(
        *[F.col(f"__left.{c}").alias(c) for c in left.columns],
        F.col("__m.__rt").alias("__matched_time"),
        *[F.col(f"__m.{c}").alias(c) for c in right_cols],
    )


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """points ⋈ intervals where lo <= value <= hi, as an equi join.

    Each interval explodes to every bucket of ``bucket_width`` it overlaps;
    each point belongs to exactly one bucket, so a qualifying (point,
    interval) pair meets in exactly one bucket — no post-join dedup needed.
    Returns all points columns + all intervals columns.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    v = F.col(value_col).cast("double")
    lo = F.col(lo_col).cast("double")
    hi = F.col(hi_col).cast("double")

    p = points.withColumn("__bucket", F.floor(v / bucket_width))
    i = intervals.filter(lo <= hi).withColumn(
        "__bucket",
        F.explode(F.sequence(F.floor(lo / bucket_width), F.floor(hi / bucket_width))),
    )
    return (
        p.join(i, "__bucket")
        .filter((v >= lo) & (v <= hi))
        .drop("__bucket")
    )


def resample_forward_fill(
    df: DataFrame,
    key: str | list[str],
    time_col: str,
    step_seconds: int,
    value_cols: list[str] | None = None,
    tick_col: str = "tick",
    lookback: float | None = None,
    max_ticks: int = 50_000_000,
    max_ticks_per_key: int = 5_000_000,
) -> DataFrame:
    """Resample an irregular per-key time series onto a regular grid with
    forward fill: one row per (key, tick) for ticks at multiples of
    ``step_seconds`` inside each key's own [min, max] time span, carrying
    the latest observation at-or-before the tick — the
    feature-snapshotting / sensor-alignment operator.

    Pure composition: per-key bounds are ONE aggregate; the grid is an
    in-plan ``sequence`` explode off that bounds table (never a cross
    join — a key's ticks are generated next to its bounds row); the fill
    itself is ``as_of_join(grid, df)``, inheriting its one-shuffle
    union+window plan, its deterministic duplicate-(key, time) resolution,
    and its ``lookback`` (tolerance) semantics — a tick more than
    ``lookback`` seconds past the last observation fills with nulls
    (staleness cutoff) instead of carrying forever.

    Grid discipline for 100 TB: the per-key-sized bounds table is pinned
    (one scan of ``df`` serves validation AND the grid), then total and
    PER-KEY tick counts are validated up front and refused above
    ``max_ticks`` / ``max_ticks_per_key`` — a key spanning years
    resampled at 1 s is a configuration accident that would otherwise
    explode quietly, and the per-key bound matters independently because
    ``sequence`` materializes one key's whole grid as a single in-memory
    array row before the explode (50M ticks ≈ 400 MB in ONE task). Ticks
    start at the first step multiple >= the key's min (every tick
    therefore has an observation at-or-before it; a key whose span
    contains no step multiple emits no rows). ``tick_col`` is epoch
    seconds as bigint.
    """
    if step_seconds <= 0:
        raise ValueError("step_seconds must be positive")
    if int(step_seconds) != step_seconds:
        raise ValueError("step_seconds must be an integer number of seconds")
    if tick_col in df.columns:
        raise ValueError(f"tick_col {tick_col!r} collides with an input column")
    from oni_ml_spark.transforms.time import time_as_double

    step = int(step_seconds)
    keys = _as_key_list(key, "resample_forward_fill")
    t = time_as_double(df, time_col)
    # null-key series are EXCLUDED from the grid: as_of_join's
    # null-never-equals semantics mean their ticks could never fill, so
    # emitting them would produce all-null rows that violate the
    # every-tick-has-an-observation invariant below
    non_null_keys = F.lit(True)
    for k in keys:
        non_null_keys = non_null_keys & F.col(k).isNotNull()
    bounds = (
        df.select(*[F.col(k) for k in keys], t.alias("__t"))
        .where(F.col("__t").isNotNull() & non_null_keys)
        .groupBy(*keys)
        .agg(
            (F.ceil(F.min("__t") / step) * step).cast("long").alias("__lo"),
            (F.floor(F.max("__t") / step) * step).cast("long").alias("__hi"),
        )
        .where(F.col("__hi") >= F.col("__lo"))
        .localCheckpoint(eager=True)  # pin: validation + grid share ONE scan
    )
    per_key = (F.col("__hi") - F.col("__lo")) / step + 1
    lims = bounds.agg(
        F.sum(per_key).alias("n"), F.max(per_key).alias("m")
    ).collect()[0]
    if lims["n"] is not None and lims["n"] > max_ticks:
        raise ValueError(
            f"grid would hold {int(lims['n'])} ticks (> max_ticks={max_ticks}) — "
            "coarsen step_seconds or raise max_ticks explicitly"
        )
    if lims["m"] is not None and lims["m"] > max_ticks_per_key:
        raise ValueError(
            f"one key's grid would hold {int(lims['m'])} ticks "
            f"(> max_ticks_per_key={max_ticks_per_key}) — sequence() builds a "
            "key's whole grid as one in-memory array row; coarsen "
            "step_seconds or raise max_ticks_per_key explicitly"
        )
    grid = bounds.select(
        *keys,
        F.explode(F.sequence("__lo", "__hi", F.lit(step).cast("long"))).alias(
            tick_col
        ),
    )
    return as_of_join(
        grid,
        df,
        keys,
        tick_col,
        time_col,
        right_cols=value_cols,
        direction="backward",
        tolerance=lookback,
    )


def rolling_aggregate(
    df: DataFrame,
    key_col: str | list[str],
    time_col: str,
    value_col: str,
    window_seconds: float,
    out_prefix: str = "rolling",
) -> DataFrame:
    """Time-based (RANGE-frame) rolling aggregates per key: for every row,
    the sum/count/mean of ``value_col`` over the PRECEDING
    ``window_seconds`` up to and including the row — rate limiting,
    rolling spend, burst detection.

    A RANGE frame (not ROWS): all rows whose time falls in the interval
    contribute, regardless of how many there are — the semantics a
    per-user "last hour" aggregate actually needs. One shuffle on the key;
    the frame evaluates within each key's sorted run. ``time_col`` must be
    numeric seconds (pipe timestamps through
    ``transforms.time.epoch_seconds`` first). The frame computes on
    integer MICROSECONDS (Spark range frames take integer boundaries;
    micros keep epoch_seconds' full precision exactly), so membership is
    exact — no double-boundary ambiguity.

    Adds ``{prefix}_sum``, ``{prefix}_cnt``, ``{prefix}_mean``.
    """
    if window_seconds <= 0:
        raise ValueError("window_seconds must be positive")
    # materialize the micros axis as a column FIRST: ordering two window
    # functions by the same raw expression makes Catalyst treat them as two
    # different window specs (each .over() gets its own expression instance)
    # and plan two Window+Sort nodes; ordering by the shared attribute
    # collapses sum and count into ONE Window over ONE sort
    micros_col = f"__{out_prefix}_micros"
    with_t = df.withColumn(
        micros_col, F.round(F.col(time_col).cast("double") * 1_000_000).cast("long")
    )
    kcols = _as_key_list(key_col, "rolling_aggregate")
    w = (
        Window.partitionBy(*kcols)
        .orderBy(F.col(micros_col))
        .rangeBetween(-int(round(window_seconds * 1_000_000)), 0)
    )
    s = F.sum(F.col(value_col)).over(w)
    c = F.count(F.lit(1)).over(w)
    return (
        with_t.withColumn(f"{out_prefix}_sum", s)
        .withColumn(f"{out_prefix}_cnt", c.cast("long"))
        .withColumn(f"{out_prefix}_mean", s / c)
        .drop(micros_col)
    )
