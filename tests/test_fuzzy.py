"""Edit-distance fuzzy join vs a DuckDB all-pairs levenshtein oracle: the
positional q-gram count filter must be LOSSLESS (result identity with the
cross-join predicate), across the long/short path boundary, k in {0,1,2},
and duplicate/empty/unicode strings."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from oni_ml_spark.datapipe.fuzzy import fuzzy_join


def _rows(df):
    return sorted(map(str, (tuple(r) for r in df.collect())))


@pytest.fixture(scope="module")
def names(spark):
    left = spark.createDataFrame(
        [
            (1, "jonathan smith"),
            (2, "jonathon smith"),      # 1 edit from 1
            (3, "kate johnson"),
            (4, "cate jonson"),         # 2 edits from 3
            (5, "al"),                  # short path
            (6, "ab"),                  # 1 edit from 5 (short)
            (7, ""),                    # empty string
            (8, "x"),                   # 1 edit from 7 (insert)
            (9, "completely different entry"),
            (10, "zuegel strasse"),
            (11, "zugel strasse"),      # 1 edit from 10
        ],
        "id bigint, name string",
    )
    right = spark.createDataFrame(
        [
            (101, "jonathan smith"),
            (102, "kate jonson"),
            (103, "alf"),
            (104, "zuegel strasse"),
            (105, "wholly unrelated"),
            (106, ""),
        ],
        "rid bigint, rname string",
    )
    return left, right


def _oracle(left_pd, right_pd, k):
    return duckdb.sql(
        f"""
        SELECT l.id, r.rid, levenshtein(l.name, r.rname) AS distance
        FROM left_pd l, right_pd r
        WHERE l.name IS NOT NULL AND r.rname IS NOT NULL
          AND levenshtein(l.name, r.rname) <= {k}
        """
    ).fetchall()


@pytest.mark.parametrize("k", [0, 1, 2])
def test_matches_duckdb_cross_join(spark, names, k):
    left, right = names
    got = fuzzy_join(left, right, "id", "name", "rid", "rname", max_edits=k)
    left_pd = left.toPandas()
    right_pd = right.toPandas()
    want = _oracle(left_pd, right_pd, k)
    assert _rows(got) == sorted(map(str, (tuple(r) for r in want)))
    if k >= 1:  # non-vacuous: hits on both the long and the short path
        ids = {(r["id"], r["rid"]) for r in got.collect()}
        assert (1, 101) in ids and (2, 101) in ids   # long-path typo
        assert (5, 103) in ids                       # short-path
        assert (10, 104) in ids and (11, 104) in ids


def test_unicode_character_semantics(spark):
    """Spark's levenshtein counts CHARACTERS; DuckDB's counts UTF-8 bytes
    (ü = 2 bytes), so unicode parity is checked against a pure-Python DP
    oracle instead. The q-gram filter must stay lossless for multibyte
    text (substring is character-based too — grams align with edits)."""

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    lrows = [(1, "zügel straße"), (2, "zugel straße"), (3, "żółć"), (4, "zolc")]
    rrows = [(101, "zügel straße"), (102, "żółć"), (103, "café")]
    left = spark.createDataFrame(lrows, "id bigint, name string")
    right = spark.createDataFrame(rrows, "rid bigint, rname string")
    got = sorted(
        tuple(r)
        for r in fuzzy_join(
            left, right, "id", "name", "rid", "rname", max_edits=2
        ).collect()
    )
    want = sorted(
        (i, ri, lev(a, b))
        for i, a in lrows
        for ri, b in rrows
        if lev(a, b) <= 2
    )
    assert got == want
    assert (2, 101, 1) in got  # multibyte edit counted as ONE character


def test_self_join_column_suffixes(spark, names):
    left, _ = names
    out = fuzzy_join(left, left, "id", "name", max_edits=1)
    assert out.columns == ["id_l", "id_r", "distance"]
    pairs = {(r["id_l"], r["id_r"]) for r in out.collect()}
    assert (1, 2) in pairs and (2, 1) in pairs and (1, 1) in pairs
    # oracle parity for the self shape too
    left_pd = left.toPandas()
    want = duckdb.sql(
        """
        SELECT a.id, b.id, levenshtein(a.name, b.name) AS d
        FROM left_pd a, left_pd b
        WHERE levenshtein(a.name, b.name) <= 1
        """
    ).fetchall()
    assert _rows(out) == sorted(map(str, (tuple(r) for r in want)))


def test_no_cartesian_in_plan(spark, names):
    from oni_ml_spark.plans.diagnostics import plan_report

    left, right = names
    rep = plan_report(fuzzy_join(left, right, "id", "name", "rid", "rname", max_edits=1))
    assert not rep["nodes"].get("CartesianProduct")
    assert not rep["nodes"].get("BroadcastNestedLoopJoin")


def test_validation(spark, names):
    left, right = names
    with pytest.raises(ValueError, match="max_edits"):
        fuzzy_join(left, right, "id", "name", "rid", "rname", max_edits=-1)
    with pytest.raises(ValueError, match="q must"):
        fuzzy_join(left, right, "id", "name", "rid", "rname", q=0)
    with pytest.raises(ValueError, match="lacks columns"):
        fuzzy_join(left, right, "id", "nope", "rid", "rname")


@pytest.mark.parametrize("q", [2, 3, 4])
def test_q_choice_never_changes_results(spark, names, q):
    """q moves work between the gram filter and the short path — never the
    answer (the filter is lossless for every q)."""
    left, right = names
    got = fuzzy_join(left, right, "id", "name", "rid", "rname", max_edits=1, q=q)
    want = _oracle(left.toPandas(), right.toPandas(), 1)
    assert _rows(got) == sorted(map(str, (tuple(r) for r in want)))


def test_null_ids_excluded_on_every_path(spark, names):
    """Null-id rows previously vanished from the long path but survived the
    short path (review finding) — now excluded identically everywhere."""
    _, right = names
    left = spark.createDataFrame(
        [(None, "jonathan smith"), (None, "ab"), (50, "jonathan smith")],
        "id bigint, name string",
    )
    got = sorted(
        tuple(r)
        for r in fuzzy_join(
            left, right, "id", "name", "rid", "rname", max_edits=1
        ).collect()
    )
    assert got == [(50, 101, 0)]  # null-id rows on BOTH paths: gone


def test_distance_id_collision_rejected(spark, names):
    left, right = names
    with pytest.raises(ValueError, match="distance"):
        fuzzy_join(
            left, right.withColumnRenamed("rid", "distance"),
            "id", "name", "distance", "rname",
        )


def test_fuzzy_dedup_groups_transitive(spark):
    """Typo chains cluster transitively with the smallest id as survivor;
    unrelated rows stay singletons."""
    from oni_ml_spark.datapipe.fuzzy import fuzzy_dedup_groups

    df = spark.createDataFrame(
        [
            (1, "acme corporation"),
            (2, "acme corporatio"),    # 1 edit from 1
            (3, "acme corporatin"),    # 1 edit from 2, 2 from 1 -> same cluster
            (10, "globex industries"),
            (11, "globex industrie"),  # 1 edit from 10
            (20, "initech"),           # singleton
        ],
        "id bigint, name string",
    )
    got = {r["id"]: (r["cluster"], r["keep"]) for r in
           fuzzy_dedup_groups(df, "id", "name", max_edits=1).collect()}
    assert got[1] == (1, True) and got[2] == (1, False)
    assert got[3] == (1, False)   # transitive closure despite ed(1,3)=2
    assert got[10] == (10, True) and got[11] == (10, False)
    assert got[20] == (20, True)
    survivors = {i for i, (_, k) in got.items() if k}
    assert survivors == {1, 10, 20}



def test_fuzzy_dedup_custom_id_col_and_null_ids(spark):
    """Output id column keeps the caller's name so the documented
    df.join(out.filter('keep'), id_col) recipe works; null-id rows are
    excluded instead of surfacing as an unfilterable (null, null) row
    (review findings)."""
    from oni_ml_spark.datapipe.fuzzy import fuzzy_dedup_groups

    df = spark.createDataFrame(
        [(1, "acme corporation"), (2, "acme corporatio"), (None, "ghost")],
        "doc_id bigint, name string",
    )
    out = fuzzy_dedup_groups(df, "doc_id", "name", max_edits=1)
    assert out.columns == ["doc_id", "cluster", "keep"]
    assert out.where(F.col("doc_id").isNull()).count() == 0
    kept = df.join(out.filter("keep"), "doc_id")  # the docstring recipe
    assert {r["doc_id"] for r in kept.collect()} == {1}
