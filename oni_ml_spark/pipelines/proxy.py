"""Proxy suspicious-connects pipeline (SURVEY.md §3.3).

Reference: proxy/ProxySuspiciousConnectsAnalysis.scala +
ProxySuspiciousConnectsModel.scala. Document = clientip; word =
topDomain_timeBin_reqMethod_uriEntropyBin_topContentType_agentBin_respFirstChar.

The useragent-frequency feature (A2) is computed as a groupBy + broadcast
join instead of the reference's collect-to-driver Map
(ProxySuspiciousConnectsModel.scala:112-118) — at 100 TB the distinct-agent
table still broadcasts (bounded cardinality), but never transits the driver
as a Scala Map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oni_ml_spark.pipelines.common import FEEDBACK_FLAG, SuspiciousConnectsResult, train_and_score
from oni_ml_spark.transforms import (
    DECILES,
    QUINTILES,
    bin_expr,
    oversample,
    string_entropy,
    proxy_word,
)
from oni_ml_spark.transforms.feedback import conform_feedback, severity_filter
from oni_ml_spark.transforms.time import seconds_of_day


def null_filter(df: DataFrame) -> DataFrame:
    """p_date/p_time/clientip non-null (proxy/ProxySuspiciousConnectsAnalysis.scala:32)."""
    return df.filter(
        F.col("p_date").isNotNull() & F.col("p_time").isNotNull() & F.col("clientip").isNotNull()
    )


def featurize(
    df: DataFrame, top_domains: list[str], exact_quantiles: bool = True
) -> DataFrame:
    """Time/entropy/agent-count features + proxy word.

    Reference cuts: time deciles (ProxySuspiciousConnectsModel.scala:106-107),
    fulluri-entropy quintiles (:109-110), agent-count quintiles (:112-118).
    """
    from oni_ml_spark.transforms.quantiles import (
        approx_quantile_cuts_multi,
        quantile_cuts_multi,
    )

    df = df.withColumn("num_time", seconds_of_day("p_time"))
    df = df.withColumn("uri_entropy", string_entropy("fulluri"))

    agent_counts = df.groupBy("useragent").agg(F.count(F.lit(1)).alias("agent_count"))
    df = df.join(F.broadcast(agent_counts), "useragent", "left").cache()

    if exact_quantiles:
        cuts = quantile_cuts_multi(
            df,
            {"num_time": DECILES, "uri_entropy": QUINTILES, "agent_count": QUINTILES},
        )
        time_cuts = cuts["num_time"]
        entropy_cuts, agent_cuts = cuts["uri_entropy"], cuts["agent_count"]
    else:
        cuts = approx_quantile_cuts_multi(
            df, ["num_time", "uri_entropy", "agent_count"], DECILES
        )
        time_cuts = cuts["num_time"]
        entropy_cuts = cuts["uri_entropy"][1::2]
        agent_cuts = cuts["agent_count"][1::2]

    df = df.withColumns(
        {
            "uri_entropy_bin": bin_expr("uri_entropy", entropy_cuts),
            "agent_count_bin": bin_expr("agent_count", agent_cuts),
        }
    )
    return df.withColumn(
        "word",
        proxy_word(
            "host", "p_time", "reqmethod", "uri_entropy_bin", "resconttype",
            "agent_count_bin", "respcode",
            time_cuts=time_cuts, top_domains=top_domains,
        ),
    )


def run(
    df: DataFrame,
    feedback: DataFrame | None = None,
    *,
    top_domains: list[str] | None = None,
    dup_factor: int = 1000,
    topic_count: int = 20,
    doc_concentration: float = 2.5,
    threshold: float = 1.0,
    top_k: int = -1,
    seed: int = 0,
    max_iter: int = 10,
    max_count_per_word: int | None = 10_000,
    exact_quantiles: bool = True,
) -> SuspiciousConnectsResult:
    df = null_filter(df).withColumn(FEEDBACK_FLAG, F.lit(False))
    if feedback is not None:
        fb = oversample(severity_filter(feedback, "uri_sev"), dup_factor).withColumn(
            FEEDBACK_FLAG, F.lit(True)
        )
        df = df.unionByName(conform_feedback(fb, df))

    featurized = featurize(df, top_domains or [], exact_quantiles=exact_quantiles).cache()
    return train_and_score(
        featurized,
        doc_col="clientip",
        word_col="word",
        topic_count=topic_count,
        doc_concentration=doc_concentration,
        threshold=threshold,
        top_k=top_k,
        seed=seed,
        max_iter=max_iter,
        max_count_per_word=max_count_per_word,
    )
