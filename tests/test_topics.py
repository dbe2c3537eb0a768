"""Topic-model unit tests: the reference's normalization goldens
(OniLDACWrapperTest.scala) and corpus aggregation semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oni_ml_spark.topics import (
    corpus_counts,
    fit_topic_model,
    normalize_log_probs,
    normalize_topic_mix,
)


class TestNormalizationGoldens:
    def test_beta_exp_normalize(self):
        # OniLDACWrapperTest.scala:11-23
        got = normalize_log_probs([1.0, 2.0, 3.0, 4.0, 5.0])
        want = [
            0.011656230956039607, 0.03168492079612427, 0.0861285444362687,
            0.23412165725273662, 0.6364086465588308,
        ]
        assert got == pytest.approx(want, abs=1e-15)

    def test_gamma_normalize(self):
        # OniLDACWrapperTest.scala:25-41
        line = [0.0124531442] * 20
        line[11] = 23983.5532262138
        line[18] = 22999.4716800747
        got = normalize_topic_mix(line)
        assert got[11] == pytest.approx(0.5104702996191969, abs=1e-12)
        assert got[18] == pytest.approx(0.48952492939114034, abs=1e-12)
        assert got[0] == pytest.approx(2.6505498126219955e-7, abs=1e-18)

    def test_gamma_zero_sum(self):
        # OniLDACWrapperTest.scala:43-51: cancelling values → all zeros
        line = [0.0] * 20
        line[2], line[3] = 1.0, -1.0
        assert normalize_topic_mix(line) == [0.0] * 20


class TestCorpus:
    def test_corpus_counts(self, spark):
        # the createModel fixture (OniLDACWrapperTest.scala:53-75) as a
        # (doc, word) → count aggregation — the LDA-C serialization itself is
        # intentionally gone (in-cluster LDA)
        rows = [
            ("192.168.1.1", "333333_7.0_0.0_1.0")] * 8 + [
            ("10.10.98.123", "1111111_6.0_3.0_5.0")] * 4 + [
            ("66.23.45.11", "-1_43_7.0_2.0_6.0")] * 2 + [
            ("192.168.1.1", "-1_80_6.0_1.0_1.0")] * 5
        df = spark.createDataFrame(rows, "ip string, word string")
        got = {
            (r["doc"], r["word"]): r["count"]
            for r in corpus_counts(df, "ip", "word").collect()
        }
        assert got == {
            ("192.168.1.1", "333333_7.0_0.0_1.0"): 8,
            ("10.10.98.123", "1111111_6.0_3.0_5.0"): 4,
            ("66.23.45.11", "-1_43_7.0_2.0_6.0"): 2,
            ("192.168.1.1", "-1_80_6.0_1.0_1.0"): 5,
        }

    def test_fit_produces_full_model_tables(self, spark):
        corpus = spark.createDataFrame(
            [(f"d{i % 7}", f"w{(i * 3) % 11}", 1 + i % 4) for i in range(200)],
            "doc string, word string, count long",
        )
        m = fit_topic_model(corpus, topic_count=4, seed=3, max_iter=5)
        assert m.doc_topic_mix.count() == 7
        assert m.word_probs.count() == len(m.vocabulary) == 11
        assert m.topic_count == 4
