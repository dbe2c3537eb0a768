"""Incremental aggregate maintenance: mergeable partial-aggregate state.

A 100 TB corpus gets daily appends; recomputing per-key statistics by
rescanning all of history every day is the anti-pattern this module
removes.  The standard trick (Spark's own partial aggregation, Delta/
materialized-view incremental refresh) is to keep an ALGEBRAIC state —
count / sum / sum-of-squares / min / max are all mergeable — so a refresh
touches only the new batch plus the (keys-sized, not data-sized) state
table:

    state   = partial_aggregates(history, keys, cols)     # once
    state'  = merge_aggregate_state(state,
                  partial_aggregates(batch, keys, cols))  # per batch
    report  = finalize_aggregates(state', cols)           # any time

``finalize_aggregates(merge(a, b))`` equals the one-shot aggregate over
``a ∪ b`` exactly for count/sum/avg/min/max and algebraically for
variance (sum-of-squares form; see the stddev note below).  The merge is
one groupBy over ``|keys(state)| + |keys(batch)|`` rows — at the target
scale that is millions of rows against a 100 TB history it never rescans.

Persist the state with io.write_parquet and refresh it with
sampling.merge_upsert semantics or directly via ``merge_aggregate_state``
(which IS the upsert: union + re-aggregate).  Distinct counts are the one
non-algebraic statistic — use sketches.rollup_distinct_sketches (mergeable
HLL) alongside this state for those.

stddev note: the two-pass-free sum-of-squares formula loses precision when
|mean| >> stddev (classic catastrophic cancellation).  finalize guards the
negative-variance edge with greatest(0, ...); callers needing extreme
precision should center values first (subtract a per-key anchor) — the
state stays mergeable because the anchor is a constant.

Beyond-reference operator (SURVEY.md §7.5 curation family); the reference
recomputes its per-word/day aggregates from scratch each run
(oni-ml Scala FlowSuspiciousConnectsAnalysis re-reads the full day).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_STATE_SUFFIXES = ("_cnt", "_sum", "_sumsq", "_min", "_max")


def partial_aggregates(
    df: DataFrame, keys: Sequence[str], value_cols: Sequence[str]
) -> DataFrame:
    """Algebraic per-key state over ``df``: ``n_rows`` plus, per value
    column, ``_cnt`` (non-null), ``_sum``, ``_sumsq`` (both double),
    ``_min``, ``_max`` (native type).  One shuffle with map-side combine —
    the same shape Spark's own HashAggregate partials take."""
    if not keys or not value_cols:
        raise ValueError("keys and value_cols must be non-empty")
    overlap = set(keys) & set(value_cols)
    if overlap:
        raise ValueError(f"columns cannot be both key and value: {sorted(overlap)}")
    # merge/finalize re-derive the key list from the state schema by suffix,
    # so a key named like a state column would be misclassified DOWNSTREAM
    # (merge would reject the very state this function produced) — fail here
    bad_keys = sorted(
        k for k in keys if k == "n_rows" or k.endswith(_STATE_SUFFIXES)
    )
    if bad_keys:
        raise ValueError(
            f"key column name(s) {bad_keys} collide with the state schema "
            f"('n_rows' or a *{'/*'.join(_STATE_SUFFIXES)} suffix) — rename "
            "them (e.g. alias before aggregating)"
        )
    aggs: list = [F.count(F.lit(1)).alias("n_rows")]
    for c in value_cols:
        d = F.col(c).cast("double")
        aggs += [
            F.count(c).alias(f"{c}_cnt"),
            F.coalesce(F.sum(d), F.lit(0.0)).alias(f"{c}_sum"),
            F.coalesce(F.sum(d * d), F.lit(0.0)).alias(f"{c}_sumsq"),
            F.min(c).alias(f"{c}_min"),
            F.max(c).alias(f"{c}_max"),
        ]
    return df.groupBy(*keys).agg(*aggs)


def _state_value_cols(state: DataFrame, keys: Sequence[str]) -> list[str]:
    cols = set(state.columns)
    vals = sorted(
        c[: -len("_cnt")]
        for c in cols
        if c.endswith("_cnt") and all(f"{c[:-4]}{s}" in cols for s in _STATE_SUFFIXES)
    )
    if not vals:
        raise ValueError(
            f"not an aggregate state frame (no <col>_cnt/_sum/_sumsq/_min/_max "
            f"groups in {sorted(cols)})"
        )
    expected = set(keys) | {"n_rows"} | {f"{v}{s}" for v in vals for s in _STATE_SUFFIXES}
    stray = cols - expected
    if stray:
        raise ValueError(f"unexpected state columns {sorted(stray)}")
    return vals


def merge_aggregate_state(state: DataFrame, delta: DataFrame) -> DataFrame:
    """Merge two state frames (same schema) into one: counts/sums add,
    min/max fold.  Commutative and associative — batch order never matters;
    a key present in only one side passes through unchanged."""
    if set(state.columns) != set(delta.columns):
        raise ValueError(
            f"state schemas differ: {sorted(set(state.columns) ^ set(delta.columns))}"
        )
    keys = [
        c
        for c in state.columns
        if c != "n_rows" and not c.endswith(_STATE_SUFFIXES)
    ]
    vals = _state_value_cols(state, keys)
    both = state.unionByName(delta)
    aggs: list = [F.sum("n_rows").alias("n_rows")]
    for v in vals:
        aggs += [
            F.sum(f"{v}_cnt").alias(f"{v}_cnt"),
            F.sum(f"{v}_sum").alias(f"{v}_sum"),
            F.sum(f"{v}_sumsq").alias(f"{v}_sumsq"),
            F.min(f"{v}_min").alias(f"{v}_min"),
            F.max(f"{v}_max").alias(f"{v}_max"),
        ]
    return both.groupBy(*keys).agg(*aggs)


def refresh_aggregate_state(
    state: DataFrame, batch: DataFrame, keys: Sequence[str], value_cols: Sequence[str]
) -> DataFrame:
    """One incremental refresh step: fold a RAW new batch into an existing
    state.  The batch is partial-aggregated first, so the merge's shuffle
    carries per-key rows, never per-row data."""
    return merge_aggregate_state(state, partial_aggregates(batch, keys, value_cols))


def finalize_aggregates(state: DataFrame, value_cols: Sequence[str] | None = None) -> DataFrame:
    """Human-facing statistics from a state frame: per value column
    ``_count/_avg/_stddev`` (sample, null when count < 2) ``/_min/_max``,
    plus ``n_rows``.  Pure projection — no shuffle."""
    keys = [
        c
        for c in state.columns
        if c != "n_rows" and not c.endswith(_STATE_SUFFIXES)
    ]
    vals = _state_value_cols(state, keys)
    if value_cols is not None:
        missing = sorted(set(value_cols) - set(vals))
        if missing:
            raise ValueError(f"state has no aggregates for {missing}")
        vals = list(value_cols)
    out: list = [*[F.col(k) for k in keys], F.col("n_rows")]
    for v in vals:
        cnt = F.col(f"{v}_cnt")
        s = F.col(f"{v}_sum")
        sq = F.col(f"{v}_sumsq")
        mean = F.when(cnt > 0, s / cnt)
        var = F.greatest(F.lit(0.0), (sq - s * s / cnt) / (cnt - 1))
        out += [
            cnt.alias(f"{v}_count"),
            mean.alias(f"{v}_avg"),
            F.when(cnt >= 2, F.sqrt(var)).alias(f"{v}_stddev"),
            F.col(f"{v}_min").alias(f"{v}_min"),
            F.col(f"{v}_max").alias(f"{v}_max"),
        ]
    return state.select(*out)
