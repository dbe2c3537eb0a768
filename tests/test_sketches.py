"""Sketch aggregates vs exact oracles: the exact aggregate IS the oracle,
with the sketch's published error bound as the tolerance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oni_ml_spark.datapipe.sketches import (
    approx_distinct_by_group,
    approx_freq_items,
    grouped_approx_quantiles,
    rollup_distinct_sketches,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet")


class TestHll:
    def test_per_group_estimates_within_bound(self, spark, events):
        got = {
            r["event_type"]: r["approx_distinct"]
            for r in approx_distinct_by_group(
                events, ["event_type"], "user_id"
            ).collect()
        }
        exact = {
            r["event_type"]: r["d"]
            for r in events.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("d"))
            .collect()
        }
        assert set(got) == set(exact)
        for k, d in exact.items():
            # lgK=12 -> ~1.6% standard error; 5 sigma margin
            assert abs(got[k] - d) <= max(0.08 * d, 3.0), (k, got[k], d)

    def test_rollup_unions_sketches_not_counts(self, spark, events):
        """The union of per-group sketches must estimate the GLOBAL distinct
        count (~|users|), not the sum of per-group counts (~5x larger here
        since users appear under every event type) — proving the rollup
        merges sketch state rather than adding estimates."""
        per_group = approx_distinct_by_group(events, ["event_type"], "user_id")
        total = rollup_distinct_sketches(per_group, []).collect()[0]["approx_distinct"]
        exact_total = events.select("user_id").distinct().count()
        summed = per_group.agg(F.sum("approx_distinct")).collect()[0][0]
        assert abs(total - exact_total) <= max(0.08 * exact_total, 3.0)
        assert summed > 2 * exact_total  # the naive wrong answer is far off

    def test_sketches_survive_persistence_roundtrip(self, spark, events, tmp_path):
        """The binary sketch column written to parquet and read back must
        still union — the save-daily-sketches workflow."""
        per_group = approx_distinct_by_group(events, ["event_type"], "user_id")
        path = str(tmp_path / "sketches.parquet")
        per_group.write.mode("overwrite").parquet(path)
        reloaded = spark.read.parquet(path)
        total = rollup_distinct_sketches(reloaded, []).collect()[0]["approx_distinct"]
        exact_total = events.select("user_id").distinct().count()
        assert abs(total - exact_total) <= max(0.08 * exact_total, 3.0)


class TestFreqItems:
    def test_no_false_negatives_above_support(self, spark, events):
        n = events.count()
        exact_over = {
            r["event_type"]
            for r in events.groupBy("event_type").count().collect()
            if r["count"] / n > 0.15
        }
        got = approx_freq_items(events, ["event_type"], support=0.15)
        assert exact_over <= set(got["event_type"])


class TestGroupedApproxQuantiles:
    def test_within_rank_tolerance_of_exact(self, spark, lineitem):
        """percentile_approx guarantees rank error <= rel_err * n; check the
        approximate per-group cutoffs against the exact per-group ECDF."""
        probs = [0.25, 0.5, 0.75]
        got = grouped_approx_quantiles(
            lineitem, ["l_returnflag"], "l_quantity", probs, rel_err=0.001
        ).collect()
        exact = {
            (r["l_returnflag"],): r
            for r in lineitem.groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sort_array(F.collect_list(F.col("l_quantity").cast("double"))).alias("v"),
            )
            .collect()
        }
        for row in got:
            n, v = exact[(row["l_returnflag"],)]["n"], exact[(row["l_returnflag"],)]["v"]
            rank = sorted(v).index(row["cutoff"]) if row["cutoff"] in v else None
            assert rank is not None, "cutoff must be a real data value"
            # value at the target rank within +-(rel_err*n + 1) positions
            target = row["p"] * n
            lo = v[max(int(target - 0.001 * n - 2), 0)]
            hi = v[min(int(target + 0.001 * n + 2), n - 1)]
            assert lo <= row["cutoff"] <= hi

    def test_matches_single_group_percentile_approx(self, spark, lineitem):
        one = lineitem.withColumn("g", F.lit("all"))
        got = {
            r["p"]: r["cutoff"]
            for r in grouped_approx_quantiles(one, ["g"], "l_quantity", [0.5]).collect()
        }
        want = lineitem.agg(
            F.percentile_approx(F.col("l_quantity").cast("double"), F.lit(0.5), F.lit(1000))
        ).collect()[0][0]
        assert got[0.5] == want


class TestCorpusMinhash:
    """Corpus-level MinHash: Broder estimate accuracy, the EXACT union-merge
    invariant, dedup idempotence, and empty/width guards."""

    def test_estimate_tracks_true_jaccard(self, spark):
        from oni_ml_spark.datapipe.sketches import corpus_minhash, estimated_jaccard

        # |A|=1000, |B|=1000, |A∩B|=500 -> J = 500/1500 = 1/3
        a = spark.createDataFrame([(i,) for i in range(1000)], "k bigint")
        b = spark.createDataFrame([(i,) for i in range(500, 1500)], "k bigint")
        sa = corpus_minhash(a, "k", num_hashes=256)
        sb = corpus_minhash(b, "k", num_hashes=256)
        est = estimated_jaccard(sa, sb)
        true_j = 500 / 1500
        # std err = sqrt(J(1-J)/256) ~ 0.029; 5 sigma band
        assert abs(est - true_j) < 5 * (true_j * (1 - true_j) / 256) ** 0.5
        # identical corpora estimate exactly 1; disjoint exactly 0 (whp)
        assert estimated_jaccard(sa, sa) == 1.0
        c = spark.createDataFrame([(i,) for i in range(10_000, 11_000)], "k bigint")
        assert estimated_jaccard(sa, corpus_minhash(c, "k", 256)) < 0.05

    def test_union_merge_exact_and_dedup_idempotent(self, spark):
        from oni_ml_spark.datapipe.sketches import (
            corpus_minhash,
            merge_corpus_minhash,
        )

        a = spark.createDataFrame([(i,) for i in range(300)], "k bigint")
        b = spark.createDataFrame([(i,) for i in range(200, 600)], "k bigint")
        merged = merge_corpus_minhash(
            corpus_minhash(a, "k", 64), corpus_minhash(b, "k", 64)
        ).first()
        direct = corpus_minhash(a.unionByName(b), "k", 64).first()
        assert list(merged["sig"]) == list(direct["sig"])  # bit-for-bit
        # duplicates and nulls never move a signature
        noisy = a.unionByName(a).unionByName(
            spark.createDataFrame([(None,)], "k bigint")
        )
        assert list(corpus_minhash(noisy, "k", 64).first()["sig"]) == list(
            corpus_minhash(a, "k", 64).first()["sig"]
        )

    def test_guards(self, spark):
        import pytest

        from oni_ml_spark.datapipe.sketches import (
            corpus_minhash,
            estimated_jaccard,
            merge_corpus_minhash,
        )

        a = spark.createDataFrame([(1,)], "k bigint")
        empty = spark.createDataFrame([], "k bigint")
        with pytest.raises(ValueError, match="empty corpus"):
            estimated_jaccard(corpus_minhash(a, "k", 8), corpus_minhash(empty, "k", 8))
        with pytest.raises(ValueError, match="widths differ"):
            estimated_jaccard(corpus_minhash(a, "k", 8), corpus_minhash(a, "k", 16))
        with pytest.raises(ValueError, match="widths differ"):
            merge_corpus_minhash(corpus_minhash(a, "k", 8), corpus_minhash(a, "k", 16))
        with pytest.raises(ValueError, match="num_hashes"):
            corpus_minhash(a, "k", 0)
        with pytest.raises(ValueError, match="missing"):
            corpus_minhash(a, "nope", 8)
        # empty-corpus signature merges as the identity (null components lose)
        m = merge_corpus_minhash(corpus_minhash(empty, "k", 8), corpus_minhash(a, "k", 8))
        assert list(m.first()["sig"]) == list(corpus_minhash(a, "k", 8).first()["sig"])


def test_corpus_minhash_key_type_and_multirow_guards(spark):
    """xxhash64 hashes (value, type): signatures over int vs bigint keys
    silently read as disjoint — recorded and refused; multi-row signature
    frames (appended daily sigs) refuse instead of truncating (review
    findings)."""
    import pytest

    from oni_ml_spark.datapipe.sketches import (
        corpus_minhash,
        estimated_jaccard,
        merge_corpus_minhash,
    )

    a_int = spark.createDataFrame([(i,) for i in range(50)], "k int")
    a_big = spark.createDataFrame([(i,) for i in range(50)], "k bigint")
    sa, sb = corpus_minhash(a_int, "k", 16), corpus_minhash(a_big, "k", 16)
    with pytest.raises(ValueError, match="different key types"):
        estimated_jaccard(sa, sb)
    with pytest.raises(ValueError, match="different key types"):
        merge_corpus_minhash(sa, sb)
    multi = sa.unionByName(corpus_minhash(a_int, "k", 16))
    with pytest.raises(ValueError, match="single-row"):
        estimated_jaccard(multi, sa)
    with pytest.raises(ValueError, match="single-row"):
        merge_corpus_minhash(sa, multi)


def test_estimated_overlap_counts(spark):
    """HLL inclusion-exclusion overlap vs exact set algebra: every count
    within 5x the published relative error; containments and jaccard
    derived consistently; type-mismatch and empty edges guarded."""
    import pytest

    from oni_ml_spark.datapipe.sketches import estimated_overlap

    a = spark.createDataFrame([(i,) for i in range(10_000)], "k bigint")
    b = spark.createDataFrame([(i,) for i in range(6_000, 14_000)], "k bigint")
    got = estimated_overlap(a, b, "k", lg_k=14)
    tol = 5 * got["rse"]
    assert abs(got["n_a"] - 10_000) <= tol * 10_000
    assert abs(got["n_b"] - 8_000) <= tol * 8_000
    assert abs(got["n_union"] - 14_000) <= tol * 14_000
    # intersection inherits amplified error: the function's own bound
    assert abs(got["n_intersect"] - 4_000) <= 5 * got["intersect_abs_error"]
    assert got["intersect_abs_error"] > got["rse"] * got["n_intersect"]
    assert abs(got["jaccard"] - 4_000 / 14_000) < 0.1
    assert 0 <= got["containment_a_in_b"] <= 1
    # disjoint sets: intersection clamps at >= 0 and stays small
    c = spark.createDataFrame([(i,) for i in range(50_000, 60_000)], "k bigint")
    dj = estimated_overlap(a, c, "k", lg_k=14)
    assert dj["n_intersect"] <= 5 * dj["intersect_abs_error"] and dj["jaccard"] < 0.05
    with pytest.raises(ValueError, match="key types differ"):
        estimated_overlap(a, spark.createDataFrame([(1,)], "k int"), "k")
    with pytest.raises(ValueError, match="lacks key column"):
        estimated_overlap(a, b, "nope")
