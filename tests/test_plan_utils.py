"""Tests for the plan-shaping utilities: salted joins return identical
results to plain joins; bucketed joins plan without an exchange."""

from __future__ import annotations

from pyspark.sql import functions as F

from oni_ml_spark.plans import salted_join, write_bucketed, read_bucketed


def test_salted_join_matches_plain_join(spark):
    # skewed fact: one hot key with 5k rows, 9 cold keys
    fact = spark.range(5000).select(
        F.when(F.col("id") < 4500, F.lit(0)).otherwise(F.col("id") % 10).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(10)], "k long, name string")

    plain = fact.join(dim, "k").groupBy("name").count()
    salted = salted_join(fact, dim, "k", salt=8).groupBy("name").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    fact = spark.createDataFrame([(1, "a"), (99, "b")], "k long, v string")
    dim = spark.createDataFrame([(1, "one")], "k long, name string")
    got = {tuple(r) for r in salted_join(fact, dim, "k", salt=4, how="left").collect()}
    assert got == {(1, "a", "one"), (99, "b", None)}


def test_salted_join_rejects_outer_hows(spark):
    import pytest

    fact = spark.createDataFrame([(1, "a")], "k long, v string")
    dim = spark.createDataFrame([(1, "one")], "k long, name string")
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="inner"):
            salted_join(fact, dim, "k", salt=4, how=how)


def test_score_records_broadcast_is_size_adaptive(spark):
    """Under the limit the doc-mix join is broadcast; over it (limit=0 here)
    it degrades to a shuffle join instead of OOMing the executors."""
    from oni_ml_spark.scoring import score_records
    from oni_ml_spark.topics import TopicModel

    mix = spark.createDataFrame(
        [(f"d{i}", [0.5, 0.5]) for i in range(20)], "doc string, topic_mix array<double>"
    )
    wp = spark.createDataFrame(
        [(f"w{i}", [0.3, 0.7]) for i in range(5)],
        "word string, word_given_topic array<double>",
    )
    model = TopicModel(mix, wp, 2, [f"w{i}" for i in range(5)])
    records = spark.createDataFrame(
        [(f"d{i % 20}", f"w{i % 5}") for i in range(100)], "doc string, word string"
    )

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        hinted = score_records(records, model, "doc", "word")
        plan_hinted = hinted._jdf.queryExecution().executedPlan().toString()
        # both model joins broadcast (doc mix under the limit + word probs)
        assert plan_hinted.count("BroadcastHashJoin") == 2

        shuffled = score_records(records, model, "doc", "word", broadcast_doc_limit=1)
        plan_shuffled = shuffled._jdf.queryExecution().executedPlan().toString()
        # doc-mix join degraded to non-broadcast; word probs still broadcast
        assert plan_shuffled.count("BroadcastHashJoin") == 1
        assert sorted(map(tuple, hinted.collect())) == sorted(map(tuple, shuffled.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    import uuid

    # unique names: the in-memory catalog forgets tables between sessions but
    # their warehouse directories persist, and saveAsTable refuses to reuse them
    suffix = uuid.uuid4().hex[:10]
    tl, tr = f"t_left_{suffix}", f"t_right_{suffix}"
    for t in (tl, tr):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    left = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("a"))
    right = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("b"))
    write_bucketed(left, tl, "k", num_buckets=8)
    write_bucketed(right, tr, "k", num_buckets=8)

    # hint("merge") forces SMJ (small sides would otherwise broadcast and
    # bypass bucketing entirely) — the point is the absent Exchange
    j = read_bucketed(spark, tl).hint("merge").join(read_bucketed(spark, tr), "k")
    assert j.count() == 1000
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, "bucketed equi join must not shuffle"


def test_bucketed_featurized_day_aggregates_without_shuffle(spark):
    """SCALE.md item: persisting the featurized day bucketed by doc lets the
    corpus aggregation groupBy(doc, word) run with NO exchange — a
    HashPartitioning(doc) satisfies the clustered distribution of any
    grouping-key superset of {doc}, so re-runs against the same day skip
    the corpus shuffle entirely."""
    import uuid

    from oni_ml_spark.topics import corpus_counts

    t = f"feat_day_{uuid.uuid4().hex[:10]}"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    feat = spark.range(2000).select(
        (F.col("id") % 50).cast("string").alias("doc"),
        (F.col("id") % 7).cast("string").alias("word"),
    )
    write_bucketed(feat, t, "doc", num_buckets=8)

    counts = corpus_counts(read_bucketed(spark, t), "doc", "word")
    plan = counts._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    got = {(r["doc"], r["word"]): r["count"] for r in counts.collect()}
    # doc "0" = ids divisible by 50; word "0" = ids divisible by 7 →
    # ids divisible by 350 in [0, 2000): 0, 350, ..., 1750 = 6 rows
    assert got[("0", "0")] == 6
    assert sum(got.values()) == 2000


class TestZOrderLayout:
    def test_roundtrip_and_file_pruning(self, spark, tmp_path):
        """Z-ordering by (user_id, value) must (a) preserve the row set and
        (b) give tight per-file min/max on BOTH columns, so a box predicate
        touches a strict subset of files — the parquet row-group-skipping
        contract the layout exists for."""
        import glob

        from oni_ml_spark.io import load_table
        from oni_ml_spark.plans import write_zordered

        e = load_table(spark, "/root/testdata/sf0.001", "events").select(
            "event_id", "user_id", "value"
        )
        zpath = str(tmp_path / "z")
        write_zordered(e, zpath, ["user_id", "value"], bits=10, num_files=8)

        back = spark.read.parquet(zpath)
        assert sorted(r["event_id"] for r in back.collect()) == sorted(
            r["event_id"] for r in e.collect()
        )
        assert set(back.columns) == {"event_id", "user_id", "value"}

        glob_u = e.agg(
            (F.max("user_id") - F.min("user_id")).alias("su"),
            (F.max("value") - F.min("value")).alias("sv"),
        ).first()
        files = sorted(glob.glob(f"{zpath}/part-*.parquet"))
        assert len(files) > 2
        spans_u, spans_v, boxes = [], [], []
        for f in files:
            r = (
                spark.read.parquet(f)
                .agg(
                    F.min("user_id").alias("ulo"), F.max("user_id").alias("uhi"),
                    F.min("value").alias("vlo"), F.max("value").alias("vhi"),
                )
                .first()
            )
            spans_u.append(r["uhi"] - r["ulo"])
            spans_v.append(r["vhi"] - r["vlo"])
            boxes.append(r)
        # both dimensions cluster: mean per-file span well under the global
        assert sum(spans_u) / len(spans_u) < 0.75 * glob_u["su"]
        assert sum(spans_v) / len(spans_v) < 0.75 * glob_u["sv"]
        # a small box predicate intersects a strict subset of files
        q_ulo = boxes[0]["ulo"]
        hits = [
            b for b in boxes
            if not (b["uhi"] < q_ulo or b["ulo"] > q_ulo + 2)
        ]
        assert len(hits) < len(files)

    def test_known_bounds_skip_the_scan_and_clamp(self, spark, tmp_path):
        from oni_ml_spark.plans import write_zordered

        df = spark.createDataFrame(
            [(i, float(i % 50), i % 20) for i in range(400)],
            "id long, a double, b long",
        )
        p = str(tmp_path / "zb")
        # bounds tighter than the data on BOTH sides of `a`: out-of-range
        # rows clamp to edge cells (low side regression: negative grid
        # values used to sign-extend into the z-key), write succeeds
        write_zordered(df, p, ["a", "b"], bits=8, num_files=4,
                       bounds={"a": (5.0, 25.0), "b": (0, 19)})
        back = spark.read.parquet(p)
        assert back.count() == 400
        assert set(back.columns) == {"id", "a", "b"}


class TestDiagnostics:
    def test_partition_profile_counts_sum_to_total(self, spark):
        from oni_ml_spark.plans.diagnostics import partition_profile

        df = spark.range(1000).repartition(8)
        prof = partition_profile(df).collect()
        assert sum(r["n_rows"] for r in prof) == 1000
        assert len(prof) <= 8
        assert all(r["n_rows"] > 0 for r in prof)

    def test_key_skew_profile_finds_planted_hot_key(self, spark):
        from pyspark.sql import functions as F

        from oni_ml_spark.plans.diagnostics import key_skew_profile

        df = spark.range(1000).select(
            F.when(F.col("id") < 600, F.lit("hot")).otherwise(
                F.concat(F.lit("k"), (F.col("id") % 50).cast("string"))
            ).alias("k")
        )
        prof = key_skew_profile(df, "k", top_k=3).collect()
        assert prof[0]["key"] == "hot"
        assert prof[0]["n_rows"] == 600
        assert abs(prof[0]["share"] - 0.6) < 1e-9
        assert len(prof) == 3

    def test_key_skew_profile_is_take_ordered(self, spark):
        """The top-k must plan as TakeOrderedAndProject, not a global sort —
        key cardinality is unbounded at scale."""
        from oni_ml_spark.plans.diagnostics import key_skew_profile

        df = spark.range(100).selectExpr("id % 10 AS k")
        p = key_skew_profile(df, "k")._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in p

    def test_key_skew_rejects_bad_top_k(self, spark):
        import pytest as _pytest

        from oni_ml_spark.plans.diagnostics import key_skew_profile

        with _pytest.raises(ValueError):
            key_skew_profile(spark.range(1), "id", top_k=0)
