"""Topic modeling: corpus aggregation → in-cluster LDA → model tables.

Replaces the reference's entire out-of-band LDA machinery — driver-side
corpus serialization to LDA-C text, ssh/scp distribution, and an external
MPI C program (OniLDACWrapper.scala:63-84, .gitmodules:1-3) — with
pyspark.ml.clustering.LDA. Nothing but the k×V topic matrix ever reaches
the driver; corpus and per-doc topic mixes stay distributed
(SURVEY.md §7.4.9: the driver-collect pattern is the reference's
scalability cliff).

Model tables exposed (the reference's gamma/beta maps, OniLDACWrapper.scala:91-144):
- doc_topic_mix:  DataFrame[doc string, topic_mix array<double>] (rows sum to 1)
- word_probs:     DataFrame[word string, word_given_topic array<double>]
                  (entry t = P(word | topic t); each topic column sums to 1)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml.clustering import LDA
from pyspark.ml.linalg import SparseVector, VectorUDT
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def corpus_counts(df: DataFrame, doc_col: str, word_col: str) -> DataFrame:
    """(doc, word) → count — the core corpus aggregation (A1).

    Reference: RDD reduceByKey (netflow/FlowPreLDA.scala:131-139). groupBy
    gets Catalyst's partial+final hash aggregate (map-side combine) for free.
    """
    return (
        df.select(F.col(doc_col).alias("doc"), F.col(word_col).alias("word"))
        .groupBy("doc", "word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


@dataclass
class TopicModel:
    doc_topic_mix: DataFrame  # doc, topic_mix array<double>
    word_probs: DataFrame     # word, word_given_topic array<double>
    topic_count: int
    vocabulary: list[str]


def fit_topic_model(
    counts: DataFrame,
    topic_count: int = 20,
    doc_concentration: float = 2.5,
    seed: int = 0,
    max_iter: int = 20,
) -> TopicModel:
    """Fit LDA over a (doc, word, count) corpus, all in-cluster.

    Vocabulary (distinct words) is collected to the driver for indexing —
    bounded by design: words are crosses of small categorical alphabets
    (~10-bin × 5-bin products, SURVEY.md §7.4.9), so V stays ~1e4-1e5 even at
    100 TB input. Docs are never collected; per-doc sparse count vectors are
    assembled executor-side at doc granularity.

    Hyperparameters mirror ml_ops.sh:67 (k=20) and OniLDACWrapper.scala:83-84
    (α=2.5). Numerical parity with the MPI LDA-C is impossible (seeded
    randomized algorithms, SURVEY.md §7.4.1) — consumers should test
    distributional invariants, not values.
    """
    import pandas as pd

    counts = counts.cache()
    vocab_rows = counts.select("word").distinct().sort("word").collect()
    vocabulary = [r["word"] for r in vocab_rows]
    v_size = len(vocabulary)
    spark = counts.sparkSession
    vocab_df = spark.createDataFrame(
        pd.DataFrame({"word": vocabulary, "word_idx": range(v_size)})
    )

    indexed = counts.join(F.broadcast(vocab_df), "word")

    @F.udf(returnType=VectorUDT())
    def to_sparse(pairs):
        pairs = sorted((int(i), float(c)) for i, c in pairs)
        return SparseVector(v_size, [p[0] for p in pairs], [p[1] for p in pairs])

    docs = (
        indexed.groupBy("doc")
        .agg(F.collect_list(F.struct("word_idx", "count")).alias("pairs"))
        .select("doc", to_sparse("pairs").alias("features"))
    )

    lda = LDA(
        k=topic_count,
        maxIter=max_iter,
        seed=seed,
        docConcentration=[doc_concentration] * topic_count,
        featuresCol="features",
    )
    model = lda.fit(docs)

    transformed = model.transform(docs)
    to_array = F.udf(lambda v: [float(x) for x in v], T.ArrayType(T.DoubleType()))
    doc_topic_mix = transformed.select(
        "doc", to_array("topicDistribution").alias("topic_mix")
    )

    # topicsMatrix: V x k. NOT normalized for the online optimizer (columns
    # are expected word-count weights), so normalize each topic column to a
    # distribution — the reference does the same exp-normalize for beta
    # (OniLDACWrapper.scala:121-130). The matrix is V*k doubles — the only
    # model state that transits the driver. Ship it back to the cluster via
    # Arrow (pandas) columns, not pickled Python rows: at V ~ 10^5-10^6 the
    # pickle path croaks Python workers; Arrow stays columnar end to end.
    import numpy as np
    import pandas as pd

    tm = model.topicsMatrix().toArray()  # V x k numpy
    col_sums = tm.sum(axis=0)
    col_sums[col_sums == 0.0] = 1.0
    tm = tm / col_sums
    pdf = pd.DataFrame({"word": vocabulary})
    for t in range(topic_count):
        pdf[f"p{t}"] = tm[:, t]
    word_probs = spark.createDataFrame(pdf).select(
        "word", F.array(*[f"p{t}" for t in range(topic_count)]).alias("word_given_topic")
    )
    counts.unpersist()
    return TopicModel(doc_topic_mix, word_probs, topic_count, vocabulary)
