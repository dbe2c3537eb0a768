"""Structured Streaming extension (SURVEY.md §7.6).

The reference is strictly daily batch (ml_ops.sh:5-11); this module is the
natural streaming continuation: score an event stream against a batch-trained
topic model (static-DataFrame joins against a stream are supported by
Structured Streaming), plus windowed corpus aggregation with watermarks for
continuous retraining input.
"""

from oni_ml_spark.streaming.asof_stream import (
    as_of_join_stream,
    as_of_join_stream_watermarked,
)
from oni_ml_spark.streaming.score_stream import (
    dedup_stream,
    as_of_enrich_stream,
    score_stream,
    windowed_approx_distinct,
    windowed_corpus_counts,
)
from oni_ml_spark.streaming.drift_stream import (
    categorical_counts,
    drift_writer,
    drift_writer_categorical,
    stream_drift_report,
    stream_drift_report_categorical,
)
from oni_ml_spark.streaming.gate_stream import (
    gated_writer,
    quarantined_batches,
    read_quarantined,
)
from oni_ml_spark.streaming.route_stream import (
    read_routed,
    routed_append_writer,
    routing_counts,
)
from oni_ml_spark.streaming.sample_stream import sample_writer, stream_sample
from oni_ml_spark.streaming.stateful import sessionize_stream
from oni_ml_spark.streaming.upsert_sink import (
    dedup_append_writer,
    read_appended,
    read_upsert_table,
    stats_writer,
    topk_writer,
    upsert_writer,
)

__all__ = [
    "as_of_join_stream", "as_of_join_stream_watermarked",
    "as_of_enrich_stream", "score_stream", "windowed_approx_distinct",
    "windowed_corpus_counts", "dedup_stream", "sessionize_stream",
    "upsert_writer", "read_upsert_table", "topk_writer", "stats_writer",
    "dedup_append_writer", "read_appended",
    "drift_writer", "drift_writer_categorical", "categorical_counts",
    "stream_drift_report", "stream_drift_report_categorical",
    "sample_writer", "stream_sample",
    "routed_append_writer", "read_routed", "routing_counts",
]
