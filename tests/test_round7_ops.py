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
