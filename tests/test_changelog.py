"""CDC changelog apply: latest-change-wins semantics (out-of-order replay),
delete handling, DuckDB parity, and the bounded validation contract."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from oni_ml_spark.datapipe.snapshots import apply_changelog


def _rows(df):
    return sorted(map(str, (tuple(r) for r in df.collect())))


@pytest.fixture(scope="module")
def snap_changes(spark):
    snapshot = spark.createDataFrame(
        [(i, f"doc{i}", float(i)) for i in range(100)], "k bigint, txt string, score double"
    )
    # out-of-order changelog: k=1 upsert@2 then delete@5 (gone); k=2 delete@1
    # then upsert@3 (present, new payload); k=3 two upserts (seq 7 wins);
    # k=500 brand-new insert; k=501 delete of an absent key (no-op)
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


def test_matches_duckdb_merge(spark, snap_changes):
    snapshot, changes = snap_changes
    got = apply_changelog(snapshot, changes, "k")
    snap_pd = snapshot.toPandas()
    ch_pd = changes.toPandas()
    want = duckdb.sql(
        """
        WITH latest AS (
          SELECT k, txt, score, op,
                 row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
          FROM ch_pd
        ), w AS (SELECT * FROM latest WHERE rn = 1)
        SELECT s.k, s.txt, s.score FROM snap_pd s
        WHERE s.k NOT IN (SELECT k FROM w)
        UNION ALL
        SELECT k, txt, score FROM w WHERE op = 'upsert'
        """
    ).df()
    got_set = _rows(got)
    want_set = sorted(
        str((int(r.k), None if r.txt != r.txt or r.txt is None else r.txt,
             None if r.score != r.score else float(r.score)))
        for r in want.itertuples()
    )
    assert got_set == want_set


def test_latest_wins_semantics(spark, snap_changes):
    snapshot, changes = snap_changes
    got = {r["k"]: r for r in apply_changelog(snapshot, changes, "k").collect()}
    assert 1 not in got  # delete@5 beats upsert@2
    assert got[2]["txt"] == "alive" and got[2]["score"] == 4.0
    assert got[3]["txt"] == "v2"
    assert got[500]["txt"] == "new"
    assert 501 not in got and len(got) == 100  # -k1 deleted, +k500 inserted


def test_counts(spark, snap_changes):
    snapshot, changes = snap_changes
    out = apply_changelog(snapshot, changes, "k")
    # 100 base - k1 deleted + k500 inserted; k2,k3 replaced in place
    assert out.count() == 100
    assert out.columns == snapshot.columns


def test_row_order_of_changelog_is_irrelevant(spark, snap_changes):
    snapshot, changes = snap_changes
    shuffled = changes.orderBy(F.rand(42))
    assert _rows(apply_changelog(snapshot, shuffled, "k")) == _rows(
        apply_changelog(snapshot, changes, "k")
    )


def test_multi_key(spark):
    snap = spark.createDataFrame(
        [(1, "a", 10.0), (1, "b", 20.0), (2, "a", 30.0)], "g bigint, u string, v double"
    )
    ch = spark.createDataFrame(
        [(1, "a", 11.0, "upsert", 1), (2, "a", None, "delete", 1), (3, "c", 9.0, "upsert", 2)],
        "g bigint, u string, v double, op string, seq bigint",
    )
    got = apply_changelog(snap, ch, ["g", "u"])
    assert _rows(got) == sorted(
        map(str, [(1, "a", 11.0), (1, "b", 20.0), (3, "c", 9.0)])
    )


def test_validation(spark, snap_changes):
    snapshot, _ = snap_changes
    mk = lambda rows: spark.createDataFrame(
        rows, "k bigint, txt string, score double, op string, seq bigint"
    )
    with pytest.raises(ValueError, match="null-key"):
        apply_changelog(snapshot, mk([(None, "x", 1.0, "upsert", 1)]), "k")
    with pytest.raises(ValueError, match="null-seq"):
        apply_changelog(snapshot, mk([(1, "x", 1.0, "upsert", None)]), "k")
    with pytest.raises(ValueError, match="op outside"):
        apply_changelog(snapshot, mk([(1, "x", 1.0, "replace", 1)]), "k")
    with pytest.raises(ValueError, match="op outside"):
        apply_changelog(snapshot, mk([(1, "x", 1.0, None, 1)]), "k")
    with pytest.raises(ValueError, match="duplicate"):
        apply_changelog(
            snapshot, mk([(1, "x", 1.0, "upsert", 1), (1, "y", 2.0, "delete", 1)]), "k"
        )
    with pytest.raises(ValueError, match="snapshot schema"):
        apply_changelog(snapshot, mk([(1, "x", 1.0, "upsert", 1)]).drop("score"), "k")
    with pytest.raises(ValueError, match="key_cols"):
        apply_changelog(snapshot, mk([]), [])


def test_plan_touches_snapshot_once_no_window(spark, snap_changes):
    snapshot, changes = snap_changes
    from oni_ml_spark.plans.diagnostics import plan_report

    rep = plan_report(apply_changelog(snapshot, changes, "k"))
    # winner via aggregate, NOT a window over the snapshot
    assert rep["nodes"].get("Window", 0) == 0
    # winner aggregate + anti join; both shuffle on the key only
    assert rep["shuffle_exchanges"] <= 4
