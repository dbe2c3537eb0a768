"""Incremental aggregate state: merge-equals-one-shot algebra, DuckDB
parity for the finalized statistics, batch-order invariance, null/empty
edges, and schema validation."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from oni_ml_spark.datapipe.incremental import (
    finalize_aggregates,
    merge_aggregate_state,
    partial_aggregates,
    refresh_aggregate_state,
)


def _rows(df, ndigits=9):
    out = []
    for r in df.collect():
        out.append(
            tuple(round(v, ndigits) if isinstance(v, float) else v for v in r)
        )
    return sorted(map(str, out))


@pytest.fixture(scope="module")
def batches(spark):
    full = spark.range(6000).select(
        (F.col("id") % 13).alias("k"),
        F.when(F.col("id") % 17 == 0, F.lit(None))
        .otherwise((F.col("id") * 31) % 997)
        .alias("x"),
        (F.col("id") % 50).cast("double").alias("y"),
    )
    b1 = full.where(F.col("id") < 2000)
    b2 = full.where(F.col("id").between(2000, 4499))
    b3 = full.where(F.col("id") >= 4500)
    return full, (b1, b2, b3)


def test_merge_equals_one_shot(spark, batches):
    full, (b1, b2, b3) = batches
    one_shot = partial_aggregates(full, ["k"], ["x", "y"])
    merged = merge_aggregate_state(
        merge_aggregate_state(
            partial_aggregates(b1, ["k"], ["x", "y"]),
            partial_aggregates(b2, ["k"], ["x", "y"]),
        ),
        partial_aggregates(b3, ["k"], ["x", "y"]),
    )
    assert _rows(merged) == _rows(one_shot)


def test_merge_is_order_invariant(spark, batches):
    _, (b1, b2, b3) = batches
    p = lambda b: partial_aggregates(b, ["k"], ["x"])
    a = merge_aggregate_state(merge_aggregate_state(p(b1), p(b2)), p(b3))
    b = merge_aggregate_state(p(b3), merge_aggregate_state(p(b2), p(b1)))
    assert _rows(a) == _rows(b)


def test_finalize_matches_duckdb(spark, batches):
    full, (b1, b2, b3) = batches
    state = partial_aggregates(b1, ["k"], ["x", "y"])
    state = refresh_aggregate_state(state, b2, ["k"], ["x", "y"])
    state = refresh_aggregate_state(state, b3, ["k"], ["x", "y"])
    got = finalize_aggregates(state)
    pdf = full.toPandas()
    want = duckdb.sql(
        """
        SELECT k, count(*) AS n_rows,
               count(x) AS x_count, avg(x) AS x_avg, stddev_samp(x) AS x_stddev,
               min(x) AS x_min, max(x) AS x_max,
               count(y) AS y_count, avg(y) AS y_avg, stddev_samp(y) AS y_stddev,
               min(y) AS y_min, max(y) AS y_max
        FROM pdf GROUP BY k
        """
    ).df()
    got_pd = got.toPandas().sort_values("k").reset_index(drop=True)
    want = want.sort_values("k").reset_index(drop=True)
    assert list(got_pd.columns) == list(want.columns)
    for col in got_pd.columns:
        a, b = got_pd[col], want[col]
        if a.dtype.kind == "f":
            assert ((a - b).abs() < 1e-6).all(), col
        else:
            assert (a.astype("int64") == b.astype("int64")).all(), col


def test_new_keys_and_untouched_keys_pass_through(spark):
    old = partial_aggregates(
        spark.createDataFrame([(1, 10.0), (1, 20.0), (2, 5.0)], "k int, v double"),
        ["k"],
        ["v"],
    )
    batch = spark.createDataFrame([(2, 15.0), (3, 7.0)], "k int, v double")
    merged = merge_aggregate_state(old, partial_aggregates(batch, ["k"], ["v"]))
    fin = {r["k"]: r for r in finalize_aggregates(merged).collect()}
    assert fin[1]["v_avg"] == 15.0 and fin[1]["v_count"] == 2  # untouched
    assert fin[2]["v_avg"] == 10.0 and fin[2]["v_count"] == 2  # updated
    assert fin[3]["v_avg"] == 7.0 and fin[3]["v_stddev"] is None  # new, n=1


def test_all_null_group(spark):
    df = spark.createDataFrame([(1, None), (1, None)], "k int, v double")
    fin = finalize_aggregates(partial_aggregates(df, ["k"], ["v"])).first()
    assert fin["n_rows"] == 2 and fin["v_count"] == 0
    assert fin["v_avg"] is None and fin["v_min"] is None


def test_empty_batch_is_identity(spark, batches):
    _, (b1, _, _) = batches
    state = partial_aggregates(b1, ["k"], ["x"])
    empty = b1.where(F.lit(False))
    merged = refresh_aggregate_state(state, empty, ["k"], ["x"])
    assert _rows(merged) == _rows(state)


def test_validation(spark, batches):
    full, _ = batches
    with pytest.raises(ValueError, match="non-empty"):
        partial_aggregates(full, [], ["x"])
    with pytest.raises(ValueError, match="both key and value"):
        partial_aggregates(full, ["k"], ["k"])
    s1 = partial_aggregates(full, ["k"], ["x"])
    s2 = partial_aggregates(full, ["k"], ["y"])
    with pytest.raises(ValueError, match="schemas differ"):
        merge_aggregate_state(s1, s2)
    with pytest.raises(ValueError, match="no aggregates"):
        finalize_aggregates(s1, ["zzz"])
    with pytest.raises(ValueError, match="not an aggregate state"):
        merge_aggregate_state(full.select("k", "x"), full.select("k", "x"))


def test_merge_shuffles_state_rows_not_data(spark, batches):
    """The refresh plan aggregates the batch BEFORE the merge groupBy: both
    inputs to the final exchange are per-key partials."""
    full, (b1, b2, _) = batches
    from oni_ml_spark.plans.diagnostics import plan_report

    state = partial_aggregates(b1, ["k"], ["x"])
    rep = plan_report(refresh_aggregate_state(state, b2, ["k"], ["x"]))
    # two partial aggregations + one merge aggregation, all hash-based;
    # no join, no window
    assert rep["shuffle_exchanges"] <= 2


def test_state_suffix_key_names_rejected_up_front(spark, batches):
    """A key named like a state column ('n_rows', *_min, *_cnt, ...) would
    be misclassified by the suffix-based key inference in merge/finalize —
    partial_aggregates refuses it immediately instead (review finding)."""
    _, (b1, _, _) = batches
    renamed = b1.withColumnRenamed("k", "score_max")
    with pytest.raises(ValueError, match="collide with the state schema"):
        partial_aggregates(renamed, ["score_max"], ["x"])
    renamed2 = b1.withColumnRenamed("k", "n_rows")
    with pytest.raises(ValueError, match="collide with the state schema"):
        partial_aggregates(renamed2, ["n_rows"], ["x"])
