"""Shared train-and-score core for all suspicious-connects pipelines."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oni_ml_spark.scoring import most_suspicious, score_records
from oni_ml_spark.topics import TopicModel, corpus_counts, fit_topic_model

FEEDBACK_FLAG = "__is_feedback"


@dataclass
class SuspiciousConnectsResult:
    scored: DataFrame          # all scored (non-feedback) records
    suspicious: DataFrame      # filtered + ascending + bottom-K
    model: TopicModel


def train_and_score(
    featurized: DataFrame,
    doc_col: str,
    word_col: str,
    *,
    topic_count: int = 20,
    doc_concentration: float = 2.5,
    seed: int = 0,
    max_iter: int = 10,
    threshold: float = 1.0,
    top_k: int = -1,
    drop_unseen_docs: bool = False,
    extra_corpus: DataFrame | None = None,
    max_count_per_word: int | None = 10_000,
) -> SuspiciousConnectsResult:
    """Train LDA on the full featurized corpus (feedback rows included when
    flagged via FEEDBACK_FLAG), score only the real records, rank.

    ``extra_corpus`` lets the flow pipeline pass the (dst-ip, dst-word) side
    so each IP's document sees the events from both endpoints
    (netflow/FlowPreLDA.scala:131-139).
    """
    has_flag = FEEDBACK_FLAG in featurized.columns
    corpus_src = featurized
    counts = corpus_counts(corpus_src, doc_col, word_col)
    if extra_corpus is not None:
        counts = counts.unionByName(extra_corpus).groupBy("doc", "word").agg(
            F.sum("count").alias("count")
        )
    model = fit_topic_model(
        counts,
        topic_count=topic_count,
        doc_concentration=doc_concentration,
        seed=seed,
        max_iter=max_iter,
        max_count_per_word=max_count_per_word,
    )

    to_score = (
        featurized.filter(~F.col(FEEDBACK_FLAG)).drop(FEEDBACK_FLAG)
        if has_flag
        else featurized
    )
    scored = score_records(
        to_score, model, doc_col, word_col, drop_unseen_docs=drop_unseen_docs
    )
    suspicious = most_suspicious(scored, threshold=threshold, top_k=top_k)
    return SuspiciousConnectsResult(scored, suspicious, model)
