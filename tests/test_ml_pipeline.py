"""ml.Pipeline integration: the estimator/model compose with the standard
MLlib Pipeline API and agree with the functional scoring path."""

from __future__ import annotations

from pyspark.ml import Pipeline
from pyspark.sql import functions as F

from oni_ml_spark.ml_pipeline import SuspiciousConnectsEstimator
from oni_ml_spark.scoring import score_records


def test_pipeline_fit_transform_matches_functional_path(spark):
    df = spark.createDataFrame(
        [(f"u{i % 5}", f"w{(i * 3) % 7}") for i in range(300)],
        "doc string, word string",
    )
    est = SuspiciousConnectsEstimator(docCol="doc", wordCol="word",
                                      topicCount=3, maxIter=5, seed=11)
    model = Pipeline(stages=[est]).fit(df).stages[0]
    scored = model.transform(df)
    assert "score" in scored.columns
    assert scored.count() == 300

    # same model tables through the functional path → identical scores
    want = score_records(df, model.topic_model, "doc", "word")
    a = sorted((r["doc"], r["word"], round(r["score"], 12)) for r in scored.collect())
    b = sorted((r["doc"], r["word"], round(r["score"], 12)) for r in want.collect())
    assert a == b

    # unseen doc/word falls back to uniform (finite score, no row drop)
    other = spark.createDataFrame([("unknown", "nonword")], "doc string, word string")
    out = model.transform(other).collect()
    assert len(out) == 1 and 0.0 <= out[0]["score"] <= 1.0
