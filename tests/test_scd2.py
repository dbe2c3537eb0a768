"""SCD Type-2 history from a CDC changelog: DuckDB lead-window parity,
the as_of == apply_changelog cross-operator invariant, initial-snapshot
seeding, validation, and the one-exchange plan contract."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from oni_ml_spark.datapipe.snapshots import (
    apply_changelog,
    as_of_snapshot,
    scd2_history,
)
from oni_ml_spark.plans.diagnostics import assert_plan


def _rows(df):
    return sorted(map(str, (tuple(r) for r in df.collect())))


@pytest.fixture(scope="module")
def snap_changes(spark):
    snapshot = spark.createDataFrame(
        [(i, f"doc{i}", float(i)) for i in range(20)],
        "k bigint, txt string, score double",
    )
    # k=1: upsert@2 then delete@5 (history: one closed version, key gone)
    # k=2: delete@1 (closes the seeded base version) then upsert@3 (current)
    # k=3: upserts @4 and @7 (two versions, second current)
    # k=500: brand-new insert; k=501: delete of an absent key (no version)
    changes = spark.createDataFrame(
        [
            (1, "late", 9.0, "upsert", 2),
            (1, None, None, "delete", 5),
            (2, "dead", 0.0, "delete", 1),
            (2, "alive", 4.0, "upsert", 3),
            (3, "v1", 1.0, "upsert", 4),
            (3, "v2", 2.0, "upsert", 7),
            (500, "new", 5.5, "upsert", 1),
            (501, None, None, "delete", 1),
        ],
        "k bigint, txt string, score double, op string, seq bigint",
    )
    return snapshot, changes


def test_matches_duckdb_lead_window(spark, snap_changes):
    snapshot, changes = snap_changes
    hist = scd2_history(changes, "k", initial=snapshot, initial_seq=0)
    snap_pd = snapshot.toPandas()
    ch_pd = changes.toPandas()
    want = duckdb.sql(
        """
        WITH seeded AS (
          SELECT k, txt, score, op, seq FROM ch_pd
          UNION ALL
          SELECT k, txt, score, 'upsert', 0 FROM snap_pd
        ), v AS (
          SELECT *, lead(seq) OVER (PARTITION BY k ORDER BY seq) AS valid_to
          FROM seeded
        )
        SELECT k, txt, score, seq AS valid_from, valid_to, valid_to IS NULL
        FROM v WHERE op = 'upsert'
        """
    ).fetchall()
    assert _rows(hist) == sorted(map(str, (tuple(r) for r in want)))


def test_interval_semantics(spark, snap_changes):
    snapshot, changes = snap_changes
    hist = {
        (r["k"], r["valid_from"]): r
        for r in scd2_history(changes, "k", initial=snapshot, initial_seq=0).collect()
    }
    # k=1: base version closed by upsert@2; that version closed by delete@5
    assert hist[(1, 0)]["valid_to"] == 2 and not hist[(1, 0)]["is_current"]
    assert hist[(1, 2)]["valid_to"] == 5 and not hist[(1, 2)]["is_current"]
    assert (1, 5) not in hist  # the delete emits no version
    # k=2: base closed by the delete@1; upsert@3 reopens and stays current
    assert hist[(2, 0)]["valid_to"] == 1
    assert hist[(2, 3)]["valid_to"] is None and hist[(2, 3)]["is_current"]
    # k=3: two post-base versions, second current
    assert hist[(3, 4)]["valid_to"] == 7 and hist[(3, 7)]["is_current"]
    # untouched key: exactly its seeded version, open-ended
    assert hist[(10, 0)]["is_current"] and hist[(10, 0)]["txt"] == "doc10"
    # absent-key delete leaves no trace
    assert not any(k == 501 for k, _ in hist)


@pytest.mark.parametrize("t", [0, 1, 2, 4, 5, 7, 99])
def test_as_of_equals_apply_changelog(spark, snap_changes, t):
    snapshot, changes = snap_changes
    hist = scd2_history(changes, "k", initial=snapshot, initial_seq=0)
    got = as_of_snapshot(hist, t)
    want = apply_changelog(snapshot, changes.where(F.col("seq") <= t), "k")
    assert _rows(got) == _rows(want)
    assert got.columns == snapshot.columns


def test_current_rows_equal_final_state(spark, snap_changes):
    snapshot, changes = snap_changes
    hist = scd2_history(changes, "k", initial=snapshot, initial_seq=0)
    current = hist.where("is_current").select(*snapshot.columns)
    assert _rows(current) == _rows(apply_changelog(snapshot, changes, "k"))


def test_without_initial_snapshot(spark, snap_changes):
    _, changes = snap_changes
    hist = scd2_history(changes, "k")
    ks = {r["k"] for r in hist.collect()}
    assert ks == {1, 2, 3, 500}  # only changelog keys; 501 delete-only -> none
    # k=2's delete@1 precedes any version: it closes nothing, upsert@3 current
    k2 = hist.where("k = 2").collect()
    assert len(k2) == 1 and k2[0]["valid_from"] == 3 and k2[0]["is_current"]


def test_multi_key(spark):
    changes = spark.createDataFrame(
        [
            ("a", 1, "x", "upsert", 1),
            ("a", 1, "y", "upsert", 3),
            ("a", 2, "z", "upsert", 2),
        ],
        "k1 string, k2 bigint, v string, op string, seq bigint",
    )
    hist = {
        (r["k1"], r["k2"], r["valid_from"]): r
        for r in scd2_history(changes, ["k1", "k2"]).collect()
    }
    assert hist[("a", 1, 1)]["valid_to"] == 3
    assert hist[("a", 1, 3)]["is_current"] and hist[("a", 2, 2)]["is_current"]


def test_validation_and_schema_errors(spark, snap_changes):
    snapshot, changes = snap_changes
    dup = changes.unionByName(changes.limit(1))
    with pytest.raises(ValueError, match="scd2_history.*duplicate"):
        scd2_history(dup, "k").collect()
    with pytest.raises(ValueError, match="initial snapshot schema"):
        scd2_history(changes, "k", initial=snapshot.drop("score"))
    # a change at/below initial_seq is rejected up front: a straggler below
    # the seed would be superseded by the seed in the history while
    # apply_changelog would let it override the base — the as_of invariant
    # would silently break (review-confirmed bug, now guarded)
    with pytest.raises(ValueError, match="initial_seq"):
        scd2_history(changes, "k", initial=snapshot, initial_seq=2)
    with pytest.raises(ValueError, match="initial_seq"):
        scd2_history(changes, "k", initial=snapshot, initial_seq=1)
    with pytest.raises(ValueError, match="missing column"):
        as_of_snapshot(snapshot, 1)
    with pytest.raises(ValueError, match="key_cols"):
        scd2_history(changes, [])


def test_plan_one_exchange(spark, snap_changes):
    snapshot, changes = snap_changes
    hist = scd2_history(changes, "k", initial=snapshot, initial_seq=0)
    # union + one lead window = one hash-partition-by-key shuffle, no joins
    assert_plan(hist, max_exchanges=1, forbid=["CartesianProduct", "SortMergeJoin"])
