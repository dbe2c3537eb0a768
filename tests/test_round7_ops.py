"""Round-7 widening: shard-layout arithmetic, plus the round's new
operators as they land."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


class TestShardPositions:
    def test_layout_matches_write_training_shards_arithmetic(self, spark):
        from oni_ml_spark.datapipe.sampling import shard_positions

        df = spark.range(0, 100).withColumnRenamed("id", "row_id")
        got = {
            r["row_id"]: (r["shard"], r["shard_pos"])
            for r in shard_positions(df, "row_id", 16).collect()
        }
        assert got == {i: (i // 16, i % 16) for i in range(100)}
        # last shard holds the remainder — same contract as the file writer
        assert max(s for s, _ in got.values()) == 6
        assert sum(1 for s, _ in got.values() if s == 6) == 100 - 6 * 16

    def test_big_ids_exact_beyond_double(self, spark):
        """Ids beyond 2^53 must shard by integer arithmetic — a double
        round-trip would collapse adjacent ids into the wrong shard."""
        from oni_ml_spark.datapipe.sampling import shard_positions

        a, b = 2**60 + 1, 2**60 + 2  # indistinguishable after double cast
        df = spark.createDataFrame([(a,), (b,)], "row_id long")
        got = {r["row_id"]: (r["shard"], r["shard_pos"])
               for r in shard_positions(df, "row_id", 3).collect()}
        assert got == {a: (a // 3, a % 3), b: (b // 3, b % 3)}

    def test_pos_name_none_and_validation(self, spark):
        from oni_ml_spark.datapipe.sampling import shard_positions

        df = spark.range(0, 5).withColumnRenamed("id", "row_id")
        out = shard_positions(df, "row_id", 2, pos_name=None)
        assert out.columns == ["row_id", "shard"]
        with pytest.raises(ValueError, match="positive"):
            shard_positions(df, "row_id", 0)
        with pytest.raises(ValueError, match="not in input"):
            shard_positions(df, "zz", 2)
        with pytest.raises(ValueError, match="already exists"):
            shard_positions(df.withColumn("shard", F.lit(1)), "row_id", 2)


class TestPipelineAudit:
    def test_metrics_ride_one_action(self, spark):
        """All audit points report from ONE action — no count() re-scans:
        job count after the single write is exactly one higher, and the
        report matches recomputed stage counts."""
        from oni_ml_spark.io import load_table
        from oni_ml_spark.plans.audit import PipelineAudit

        e = load_table(spark, SF_DIR, "events")
        audit = PipelineAudit()
        df = audit.observe(e, "ingested", null_cols=["props"])
        df = audit.observe(
            df.filter(F.col("value") > 50),
            "after_filter",
            metrics={"value_sum": F.sum("value")},
        )
        tracker = spark.sparkContext.statusTracker()
        before = len(tracker.getJobIdsForGroup(None) or [])
        df.write.format("noop").mode("overwrite").save()
        report = audit.report()
        after = len(tracker.getJobIdsForGroup(None) or [])
        assert after == before + 1, "audit.report() triggered extra jobs"
        assert report["ingested"]["n_rows"] == e.count()
        assert report["ingested"]["n_null_props"] == \
            e.filter(F.col("props").isNull()).count()
        kept = e.filter(F.col("value") > 50)
        assert report["after_filter"]["n_rows"] == kept.count()
        assert abs(
            report["after_filter"]["value_sum"]
            - kept.agg(F.sum("value")).collect()[0][0]
        ) < 1e-6
        assert audit.dropped("ingested", "after_filter") == \
            e.count() - kept.count()

    def test_validation(self, spark):
        from oni_ml_spark.plans.audit import PipelineAudit

        df = spark.range(5)
        audit = PipelineAudit()
        audit.observe(df, "a")
        with pytest.raises(ValueError, match="already registered"):
            audit.observe(df, "a")
        with pytest.raises(ValueError, match="not in input"):
            audit.observe(df, "b", null_cols=["zz"])
        with pytest.raises(ValueError, match="unknown audit point"):
            audit.report(["nope"])
        assert audit.collected_points() == ["a"]
