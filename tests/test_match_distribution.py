"""Distribution-matching resampler (sampling.match_distribution):
deterministic acceptance replayed in python, shape convergence,
max-retention, zero-ref bins, null bin, empty-reference guard."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from oni_ml_spark.datapipe.sampling import match_distribution

EDGES = [10.0, 20.0, 30.0]


def _u(key, salt="#dmatch"):
    return int(hashlib.md5(f"{key}{salt}".encode()).hexdigest()[:8], 16) / 2**32


def _bin(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return -1
    for i, e in enumerate(EDGES):
        if v <= e:
            return i
    return len(EDGES)


class TestMatchDistribution:
    def _frames(self, spark):
        # cur: heavy low bins; ref: heavy high bins
        cur = [(i, float(5 + (i % 40))) for i in range(800)]
        ref = [(10_000 + i, float(15 + (i % 25))) for i in range(500)]
        return (
            spark.createDataFrame(cur, "k bigint, v double"),
            spark.createDataFrame(ref, "k bigint, v double"),
            cur,
            ref,
        )

    def test_exact_python_replay(self, spark):
        """The kept SET (not just counts) equals a python replay of the
        same histogram arithmetic and md5 draw — determinism all the way
        down."""
        cur_df, ref_df, cur, ref = self._frames(spark)
        kept, rates = match_distribution(cur_df, ref_df, "k", "v", EDGES)
        got = {r["k"] for r in kept.collect()}

        from collections import Counter

        n_cur = Counter(_bin(v) for _, v in cur)
        n_ref = Counter(_bin(v) for _, v in ref)
        Ncur, Nref = float(sum(n_cur.values())), float(sum(n_ref.values()))
        ratios = {
            b: (n_ref[b] * Ncur) / (n_cur[b] * Nref)
            for b in n_cur
            if n_cur[b] > 0 and n_ref[b] > 0
        }
        mx = max(ratios.values())
        rate = {b: (ratios[b] / mx if b in ratios else 0.0) for b in set(n_cur) | set(n_ref)}
        want = {k for k, v in cur if _u(k) < rate[_bin(v)]}
        assert got == want

        got_rates = {r["bin"]: r["rate"] for r in rates.collect()}
        for b, rr in rate.items():
            assert got_rates[b] == pytest.approx(rr, abs=1e-15)

    def test_shape_converges_to_reference(self, spark):
        cur_df, ref_df, cur, ref = self._frames(spark)
        kept, _ = match_distribution(cur_df, ref_df, "k", "v", EDGES)
        kept_bins = {
            r["bin"]: r["n"]
            for r in kept.select(F.col("v"))
            .groupBy(
                F.when(F.col("v") <= 10, 0)
                .when(F.col("v") <= 20, 1)
                .when(F.col("v") <= 30, 2)
                .otherwise(3)
                .alias("bin")
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        from collections import Counter

        ref_bins = Counter(_bin(v) for _, v in ref)
        tot_k, tot_r = sum(kept_bins.values()), sum(ref_bins.values())
        for b in ref_bins:
            if ref_bins[b] < 20:
                continue
            assert kept_bins.get(b, 0) / tot_k == pytest.approx(
                ref_bins[b] / tot_r, rel=0.25
            ), f"bin {b}"

    def test_max_retention_bin_keeps_everything(self, spark):
        cur_df, ref_df, *_ = self._frames(spark)
        _, rates = match_distribution(cur_df, ref_df, "k", "v", EDGES)
        assert any(r["rate"] == 1.0 for r in rates.collect())

    def test_zero_ref_bin_dropped(self, spark):
        cur = spark.createDataFrame(
            [(i, 5.0) for i in range(50)] + [(100 + i, 15.0) for i in range(50)],
            "k bigint, v double",
        )
        ref = spark.createDataFrame([(1, 15.0)] * 30, "k bigint, v double")
        kept, rates = match_distribution(cur, ref, "k", "v", EDGES)
        assert kept.where(F.col("v") <= 10).count() == 0
        assert kept.where(F.col("v") > 10).count() == 50  # argmax bin: all kept

    def test_null_bin_participates(self, spark):
        cur = spark.createDataFrame(
            [(i, None) for i in range(40)] + [(100 + i, 15.0) for i in range(40)],
            "k bigint, v double",
        )
        ref = spark.createDataFrame(
            [(1, None)] * 20 + [(2, 15.0)] * 20, "k bigint, v double"
        )
        kept, rates = match_distribution(cur, ref, "k", "v", EDGES)
        r = {row["bin"]: row["rate"] for row in rates.collect()}
        assert r[-1] == 1.0 and r[1] == 1.0  # identical shares → keep all
        assert kept.count() == 80

    def test_null_key_raises_in_plan(self, spark):
        cur = spark.createDataFrame(
            [(1, 15.0), (None, 15.0)], "k bigint, v double"
        )
        ref = spark.createDataFrame([(9, 15.0)] * 5, "k bigint, v double")
        with pytest.raises(Exception, match="NULL k"):
            match_distribution(cur, ref, "k", "v", EDGES)[0].collect()

    def test_caller_rate_column_survives(self, spark):
        """The internal acceptance column is __-prefixed: an input frame
        that already carries a 'rate' column joins without ambiguity and
        keeps it in the output."""
        cur = spark.createDataFrame(
            [(i, 15.0, 0.5) for i in range(60)], "k bigint, v double, rate double"
        )
        ref = spark.createDataFrame([(9, 15.0)] * 30, "k bigint, v double")
        kept, _ = match_distribution(cur, ref, "k", "v", EDGES)
        assert "rate" in kept.columns
        assert kept.count() == 60  # single shared bin → rate 1, all kept
        assert all(r["rate"] == 0.5 for r in kept.collect())

    def test_empty_reference_raises(self, spark):
        cur = spark.createDataFrame([(1, 5.0)], "k bigint, v double")
        ref = spark.createDataFrame([], "k bigint, v double")
        with pytest.raises(Exception, match="reference is empty"):
            match_distribution(cur, ref, "k", "v", EDGES)[0].collect()
