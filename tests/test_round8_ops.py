"""Round-8 fixes: the fuzzy_join gram-space guard (r7 verdict item 2), the
scd2 initial-seq guard folded into the single validation aggregate (item 5),
estimated_overlap's empty-side contract, and write_training_shards under
dynamic partition-overwrite mode (ADVICE r7)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


class TestFuzzyGramSpaceGuard:
    def test_small_alphabet_triggers_guard(self, spark):
        """A corpus whose gram space (alphabet^q) is tiny vs its size puts
        the gram join in its quadratic regime — the measured SCALE.md
        footgun. The pre-flight must refuse with sizing advice."""
        from oni_ml_spark.datapipe.fuzzy import fuzzy_join

        # 300 strings over the alphabet {a, b}: at q=2 only 4 distinct
        # grams exist, so every bucket holds ~75k gram rows squared
        rows = [(i, "ab" * 5 + ("a" if i % 2 else "b") * 3) for i in range(300)]
        df = spark.createDataFrame(rows, "id bigint, s string")
        with pytest.raises(ValueError, match="gram space is too small|expansion"):
            fuzzy_join(df, df, "id", "s", q=2).collect()

    def test_guard_disabled_still_correct(self, spark):
        from oni_ml_spark.datapipe.fuzzy import fuzzy_join

        rows = [(i, "ab" * 3 + ("a" if i % 2 else "b")) for i in range(40)]
        df = spark.createDataFrame(rows, "id bigint, s string")
        got = fuzzy_join(
            df, df, "id", "s", q=2, max_expansion_per_gram_row=None
        )
        # all even ids share one string, all odd ids the other (distance 1
        # apart after the substitution) -> every pair matches at k=1
        assert got.count() == 40 * 40

    def test_large_alphabet_passes_guard(self, spark):
        """Diverse strings over a large alphabet sail through the default
        guard — no behavior change for healthy corpora. (A long SHARED
        template prefix is itself the quadratic regime — every row lands
        in the template's gram buckets — and the guard correctly refuses
        those; diversity is what matters, not just alphabet size.)"""
        import hashlib

        from oni_ml_spark.datapipe.fuzzy import fuzzy_join

        rows = [
            (i, hashlib.md5(f"name{i}".encode()).hexdigest()[:16])
            for i in range(200)
        ]
        df = spark.createDataFrame(rows, "id bigint, s string")
        out = fuzzy_join(df, df, "id", "s", max_edits=1, q=3)
        assert out.where(F.col("id_l") == F.col("id_r")).count() == 200

    def test_dedup_groups_passthrough(self, spark):
        from oni_ml_spark.datapipe.fuzzy import fuzzy_dedup_groups

        rows = [(i, "ab" * 5 + ("a" if i % 2 else "b") * 3) for i in range(300)]
        df = spark.createDataFrame(rows, "id bigint, s string")
        with pytest.raises(ValueError, match="expansion"):
            fuzzy_dedup_groups(df, "id", "s", q=2)


class TestScd2GuardFold:
    """The initial-seq guard now rides _validate_changelog's ONE aggregate
    — same errors as before, one job instead of two."""

    def test_straggler_below_seed_rejected(self, spark):
        from oni_ml_spark.datapipe.snapshots import scd2_history

        base = spark.createDataFrame([(1, "a")], "k bigint, v string")
        changes = spark.createDataFrame(
            [(1, "b", "upsert", 5), (2, "c", "upsert", 10)],
            "k bigint, v string, op string, seq bigint",
        )
        with pytest.raises(ValueError, match="seq 5 <= initial_seq 5"):
            scd2_history(changes, "k", initial=base, initial_seq=5)
        with pytest.raises(ValueError, match="initial_seq"):
            scd2_history(changes, "k", initial=base, initial_seq=7)
        # strictly-preceding seed is fine
        hist = scd2_history(changes, "k", initial=base, initial_seq=0)
        assert hist.count() == 3

    def test_duplicate_seed_keys_still_caught(self, spark):
        from oni_ml_spark.datapipe.snapshots import scd2_history

        base = spark.createDataFrame([(1, "a"), (1, "a2")], "k bigint, v string")
        changes = spark.createDataFrame(
            [(1, "b", "upsert", 5)], "k bigint, v string, op string, seq bigint"
        )
        with pytest.raises(ValueError, match="duplicate"):
            scd2_history(changes, "k", initial=base, initial_seq=0)

    def test_single_validation_pass(self, spark, monkeypatch):
        """The seed path runs exactly ONE collect-bearing validation pass
        (the r7 verdict's separate min-seq pre-scan is folded in); the
        history itself stays lazy. Counted at the DataFrame.collect level —
        job counts are AQE-dependent, actions are not."""
        # patch the CONCRETE class — pyspark.sql.DataFrame is the abstract
        # facade in Spark 4 and its collect is never the one invoked
        from pyspark.sql.classic.dataframe import DataFrame

        from oni_ml_spark.datapipe.snapshots import scd2_history

        base = spark.createDataFrame([(1, "a")], "k bigint, v string")
        changes = spark.createDataFrame(
            [(1, "b", "upsert", 5)], "k bigint, v string, op string, seq bigint"
        )
        calls = []
        real_collect = DataFrame.collect

        def counting_collect(self):
            calls.append(1)
            return real_collect(self)

        monkeypatch.setattr(DataFrame, "collect", counting_collect)
        scd2_history(changes, "k", initial=base, initial_seq=0)  # no action
        assert len(calls) == 1, f"expected 1 validation collect, saw {len(calls)}"


class TestEstimatedOverlapEmptySide:
    def test_empty_side_raises_named_error(self, spark):
        from oni_ml_spark.datapipe.sketches import estimated_overlap

        a = spark.createDataFrame([(i,) for i in range(50)], "k bigint")
        empty = spark.createDataFrame([], "k bigint")
        with pytest.raises(ValueError, match="side 'b'.*no non-null"):
            estimated_overlap(a, empty, "k")
        with pytest.raises(ValueError, match="side 'a'"):
            estimated_overlap(empty, a, "k")
        all_null = spark.createDataFrame([(None,), (None,)], "k bigint")
        with pytest.raises(ValueError, match="side 'b'"):
            estimated_overlap(a, all_null, "k")


class TestShardsDynamicOverwrite:
    def test_shrinking_export_wipes_stale_shards(self, spark, tmp_path):
        """Under spark.sql.sources.partitionOverwriteMode=dynamic, a second
        SMALLER export must not leave the first export's extra shard=K dirs
        visible — the per-write static override guarantees a clean slate
        (ADVICE r7: the manifest otherwise certifies contaminated data)."""
        from oni_ml_spark.datapipe.sampling import (
            verify_training_shards,
            write_training_shards,
        )

        out = str(tmp_path / "shards")
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            big = spark.range(0, 100).select(F.col("id").alias("k"))
            assert write_training_shards(big, "k", out, shard_size=10) == 10
            small = spark.range(0, 25).select(F.col("id").alias("k"))
            n = write_training_shards(small, "k", out, shard_size=10)
            assert n == 3
            back = spark.read.parquet(out)
            assert back.count() == 25
            assert back.agg(F.max("shard")).collect()[0][0] == 2
            # and the verifier certifies the CLEAN export
            verify_training_shards(spark, out).collect()
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
