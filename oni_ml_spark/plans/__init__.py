"""Physical-plan-shaping utilities: skew salting, bucketed co-located joins.

AQE (enabled in session.py) handles most runtime skew; these helpers cover
the cases you plan for explicitly — a known-hot key set, or a join repeated
often enough that co-bucketing both sides pays for itself.
"""

from oni_ml_spark.plans.audit import PipelineAudit
from oni_ml_spark.plans.compaction import (
    compact_dataset,
    compaction_due,
    compaction_plan,
    dataset_files,
    maintain_dataset,
    pending_compactions,
    recover_compaction,
)
from oni_ml_spark.plans.bloom import (
    bloom_anti_join,
    bloom_semi_join,
    build_bloom_filter,
    merge_bloom_filters,
    update_bloom_filter,
)
from oni_ml_spark.plans.skipping import (
    build_file_stats,
    manifest_selectivity,
    pruned_paths,
    read_pruned,
    verify_file_stats,
)
from oni_ml_spark.plans.skew import salted_join
from oni_ml_spark.plans.bucketing import write_bucketed, read_bucketed
from oni_ml_spark.plans.layout import write_zordered, zorder_key
from oni_ml_spark.plans.diagnostics import (
    assert_plan,
    column_histogram,
    join_cardinality_estimate,
    key_skew_profile,
    numeric_correlations,
    partition_profile,
    plan_report,
    profile_table,
)

__all__ = ["PipelineAudit",
           "compact_dataset", "compaction_due", "compaction_plan",
           "dataset_files", "maintain_dataset", "pending_compactions",
           "recover_compaction",
           "bloom_anti_join", "bloom_semi_join", "build_bloom_filter",
           "merge_bloom_filters", "update_bloom_filter",
           "build_file_stats", "manifest_selectivity", "pruned_paths",
           "read_pruned", "verify_file_stats",
           "salted_join", "write_bucketed", "read_bucketed",
           "write_zordered", "zorder_key",
           "partition_profile", "key_skew_profile",
           "profile_table", "plan_report",
           "column_histogram", "numeric_correlations",
           "join_cardinality_estimate", "assert_plan"]
