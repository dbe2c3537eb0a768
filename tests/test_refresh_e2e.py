"""The 100 TB incremental-refresh story as ONE composed pipeline (r7
verdict item 7): exactly-once ingest -> per-day aggregate state merge ->
file-skipping manifest -> sketch rollup, with the load-bearing assertion
that a day's refresh touches ONLY that day's files — no job rescans prior
days.

The parts are individually tested (test_streaming, test_incremental,
test_skipping, test_sketches); this file tests the COMPOSITION, because at
100 TB the composition — not any single operator — is what makes a daily
refresh O(day) instead of O(history).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def ingested(spark, tmp_path_factory):
    """Three 'days' of events ingested through dedup_append_writer —
    overlapping keys across days exercise first-wins dedup on the way in."""
    from oni_ml_spark.streaming.upsert_sink import dedup_append_writer

    root = str(tmp_path_factory.mktemp("refresh") / "ingest")
    writer = dedup_append_writer(root, "k", query_token="e2e", num_bits=1 << 16)
    for day in range(3):
        # 400 keys/day, 100 of them replayed duplicates of the prior day
        lo = day * 300
        batch = spark.range(lo, lo + 400).select(
            F.col("id").alias("k"),
            (F.col("id") % 7).cast("double").alias("v"),
            (F.col("id") % 5).alias("cat"),
            F.lit(day).alias("day"),
        )
        writer(batch, day)
    return root


def _day_dir(root: str, day: int) -> str:
    return f"{root}/data/ingest_batch={day}"


class TestIncrementalRefreshE2E:
    def test_daily_state_merge_equals_one_shot(self, spark, ingested):
        """Fold each day's NEW rows into the running aggregate state; the
        final state must equal one aggregation of the full ingested corpus
        — and each day's fold must read ONLY that day's directory."""
        from oni_ml_spark.datapipe.incremental import (
            finalize_aggregates,
            merge_aggregate_state,
            partial_aggregates,
        )
        from oni_ml_spark.streaming.upsert_sink import read_appended

        state = None
        for day in range(3):
            batch = spark.read.parquet(_day_dir(ingested, day))
            # the load-bearing scale assertion: the day's refresh input is
            # the day's files, nothing else
            files = batch.inputFiles()
            assert files and all(f"ingest_batch={day}" in f for f in files)
            delta = partial_aggregates(batch, ["cat"], ["v"])
            state = delta if state is None else merge_aggregate_state(state, delta)

        full = read_appended(spark, ingested).drop("ingest_batch")
        want = finalize_aggregates(
            partial_aggregates(full, ["cat"], ["v"])
        ).collect()
        got = finalize_aggregates(state).collect()
        key = lambda r: r["cat"]  # noqa: E731
        assert sorted(map(str, sorted(got, key=key))) == sorted(
            map(str, sorted(want, key=key))
        )

    def test_skipping_manifest_prunes_prior_days(self, spark, ingested):
        """build_file_stats over the ingested fact table; a day-3-only key
        predicate must prune every file of days 1-2 (their key spans are
        disjoint ranges here, as time-correlated ids are in practice) and
        the pruned read must equal the full-scan filter."""
        from oni_ml_spark.plans.skipping import (
            build_file_stats,
            pruned_paths,
            read_pruned,
        )

        data_root = f"{ingested}/data"
        full = spark.read.parquet(data_root)
        manifest = build_file_stats(full, ["k"])
        # day 2's NEW keys are exactly [900, 1000) (day 0 owns [0,400),
        # day 1 [400,700), day 2 [700,1000) minus replays)
        pred = {"k": (900, 999)}
        paths = pruned_paths(manifest, pred)
        assert paths and all("ingest_batch=2" in p for p in paths)
        got = read_pruned(spark, data_root, manifest, pred)
        want = full.where(F.col("k").between(900, 999))
        assert sorted(map(str, got.select(*sorted(got.columns)).collect())) == sorted(
            map(str, want.select(*sorted(want.columns)).collect())
        )

    def test_sketch_rollup_without_fact_rescan(self, spark, ingested):
        """Per-day distinct sketches are PERSISTED (the production shape:
        each daily job saves its sketch row), and the all-time rollup reads
        only the saved sketch table — its scan touches zero fact files —
        while its estimate matches the exact distinct count."""
        from oni_ml_spark.datapipe.sketches import (
            approx_distinct_by_group,
            rollup_distinct_sketches,
        )
        from oni_ml_spark.streaming.upsert_sink import read_appended

        sk_dir = f"{ingested}/_daily_sketches"
        for day in range(3):
            batch = spark.read.parquet(_day_dir(ingested, day)).withColumn(
                "d", F.lit(day)
            )
            approx_distinct_by_group(batch, ["d"], "k").write.mode(
                "append"
            ).parquet(sk_dir)
        saved = spark.read.parquet(sk_dir)
        rolled = rollup_distinct_sketches(saved, [])
        # the rollup's scan reads ONLY the sketch table — no fact files
        files = rolled.inputFiles()
        assert files and all("_daily_sketches" in f for f in files)
        assert not any("ingest_batch=" in f for f in files)
        est = rolled.first()["approx_distinct"]
        exact = read_appended(spark, ingested).select("k").distinct().count()
        assert abs(est - exact) <= max(3, 0.05 * exact)

    def test_replayed_day_is_a_no_op(self, spark, ingested):
        """Replaying an already-committed day through the writer changes
        nothing — the exactly-once marker makes the refresh idempotent, so
        a crashed-and-restarted daily job cannot double-count."""
        from oni_ml_spark.streaming.upsert_sink import (
            dedup_append_writer,
            read_appended,
        )

        before = read_appended(spark, ingested).count()
        writer = dedup_append_writer(
            ingested, "k", query_token="e2e", num_bits=1 << 16
        )
        replay = spark.range(600, 1000).select(
            F.col("id").alias("k"),
            (F.col("id") % 7).cast("double").alias("v"),
            (F.col("id") % 5).alias("cat"),
            F.lit(2).alias("day"),
        )
        writer(replay, 2)  # same batch id -> applied marker skips it
        assert read_appended(spark, ingested).count() == before

    def test_drift_gate_blocks_shifted_day(self, spark, ingested, tmp_path):
        """(r9) The production daily refresh gates each day's batch on
        distribution drift vs a FROZEN reference histogram before folding
        it into the aggregate state: normal days pass, a planted shifted
        day fires the gate and its rows never reach the state. O(day):
        each gate job reads the day's files plus the |bins|-row saved
        reference histogram — never prior days' facts; the frozen edges
        are reused across every day (what makes the PSIs comparable)."""
        from oni_ml_spark.datapipe.drift import (
            PSI_ACTION,
            _psi_terms,
            binned_counts,
            drift_summary,
        )
        from oni_ml_spark.datapipe.incremental import (
            finalize_aggregates,
            merge_aggregate_state,
            partial_aggregates,
        )
        from oni_ml_spark.streaming.upsert_sink import read_appended

        EDGES = [0.0, 1.0, 2.0, 3.0, 4.0, 5.0]
        day0 = spark.read.parquet(_day_dir(ingested, 0))
        refdir = str(tmp_path / "ref_hist")
        # day 0 is the frozen baseline: ONE |bins|-row histogram, saved;
        # later gates compare against it without rescanning day 0
        binned_counts(day0, "v", EDGES, "ref").write.mode("overwrite").parquet(refdir)

        def gate_psi(batch):
            cc = binned_counts(batch, "v", EDGES, "cur")
            saved = spark.read.parquet(refdir)
            both = saved.join(cc, "bin", "full_outer").select(
                "bin",
                F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
                F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
            )
            # O(day) proof: the gate's scan set is the day's batch files
            # plus the bounded saved histogram — no prior fact files
            files = both.inputFiles()
            assert not any("ingest_batch=0" in f for f in files)
            return _psi_terms(both, 0.5).agg(F.sum("psi_term")).first()[0]

        shifted = spark.range(1000, 1400).select(
            F.col("id").alias("k"),
            ((F.col("id") % 7) + 40.0).cast("double").alias("v"),
            (F.col("id") % 5).alias("cat"),
            F.lit(3).alias("day"),
        )
        state = partial_aggregates(day0, ["cat"], ["v"])
        fired = []
        for day, batch in ((1, None), (2, None), (3, shifted)):
            if batch is None:
                batch = spark.read.parquet(_day_dir(ingested, day))
                assert all(f"ingest_batch={day}" in f for f in batch.inputFiles())
            psi = gate_psi(batch)
            if psi > PSI_ACTION:
                fired.append(day)
                continue  # the incident day never reaches the state
            state = merge_aggregate_state(
                state, partial_aggregates(batch, ["cat"], ["v"])
            )
        assert fired == [3]  # days 1-2 share the generator; day 3 planted

        # drift_summary's one-call verdict agrees, reusing the frozen edges
        row = drift_summary(day0, shifted, ["v"], edges={"v": EDGES}).first()
        assert row["verdict"] == "action"
        assert row["mean_cur"] - row["mean_ref"] == pytest.approx(40.0, abs=1.0)

        # the surviving state equals a one-shot aggregate over the CLEAN
        # ingested corpus — the shifted day contributed nothing
        full = read_appended(spark, ingested).drop("ingest_batch")
        want = finalize_aggregates(partial_aggregates(full, ["cat"], ["v"])).collect()
        got = finalize_aggregates(state).collect()
        key = lambda r: r["cat"]  # noqa: E731
        assert sorted(map(str, sorted(got, key=key))) == sorted(
            map(str, sorted(want, key=key))
        )

    def test_model_gate_blocks_low_quality_day(self, spark, tmp_path):
        """(r9) The model-based quality gate is the third sibling next to
        the drift and contract gates: a linear quality model is trained
        ONCE on a labeled bootstrap sample, frozen (micro-quantized
        weights saved as a parquet model table), and every day's text
        batch is scored with one broadcast join — a day whose flagged
        fraction spikes (a scraper regression flooding boilerplate) raises
        before the batch reaches the state. O(day): the gate job reads the
        day's files plus the model table, never prior days or the
        training sample."""
        from oni_ml_spark.datapipe.classify import (
            hashed_linear_score,
            train_hashed_linear,
        )

        fillers = ["river", "stone", "garden", "novel", "quiet", "lamp"]

        def doc(i, spammy):
            base = " ".join(fillers[(i + j) % len(fillers)] for j in range(8))
            return base + (" zzclick zzwin zzfree" if spammy else "")

        # labeled bootstrap sample (the expensive, human-labeled part —
        # bounded by construction), model trained and FROZEN to parquet
        sample = spark.createDataFrame(
            [(i, doc(i, i % 2 == 0), 1 if i % 2 == 0 else 0) for i in range(60)],
            "doc_id bigint, text string, label int",
        )
        w, bias = train_hashed_linear(sample, "doc_id", "text", "label", 512)
        model_dir = str(tmp_path / "quality_model")
        w.write.mode("overwrite").parquet(model_dir)

        root = str(tmp_path / "docs")
        for day in range(3):
            bad_rate = 0.5 if day == 2 else 0.05  # day 2: planted regression
            rows = [
                (day * 1000 + i, doc(i, (i * 7919) % 100 < bad_rate * 100))
                for i in range(200)
            ]
            spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
                "overwrite"
            ).parquet(f"{root}/day={day}")

        model = spark.read.parquet(model_dir)

        def gate(day):
            batch = spark.read.parquet(f"{root}/day={day}")
            assert all(f"day={day}" in f for f in batch.inputFiles())
            scored = hashed_linear_score(
                batch, "doc_id", "text", model, 512, bias_micro=bias
            )
            row = scored.agg(
                F.avg((F.col("score_micro") > 0).cast("double")).alias("flagged"),
                F.count(F.lit(1)).alias("n"),
            ).first()
            if row["flagged"] > 0.2:
                raise ValueError(
                    f"quality gate: day {day} flagged fraction "
                    f"{row['flagged']:.2f} over {row['n']} docs exceeds 0.20"
                )
            return row

        assert gate(0)["n"] == 200
        assert gate(1)["flagged"] <= 0.2
        with pytest.raises(ValueError, match="quality gate: day 2"):
            gate(2)

    def test_ivf_index_daily_refresh(self, spark, tmp_path):
        """(r9) The ANN index's daily refresh: build once, persist as v0,
        then each day LOAD the committed version, assign ONLY the day's
        vectors to the frozen centroids, and commit the union as the next
        version. O(day): the assignment job's inputs are the day's file
        plus the model-sized centroid table; the prior members are unioned
        lazily into the save, never reassigned. The rebuild trigger stays
        quiet while the corpus shape holds."""
        import random

        from oni_ml_spark.datapipe.similarity import (
            build_ivf_index,
            ivf_append,
            ivf_rebuild_due,
            load_ivf_index,
            save_ivf_index,
        )

        rng = random.Random(3)

        def day_vectors(day, n):
            return spark.createDataFrame(
                [
                    (day * 10_000 + i, [rng.gauss(0, 1) for _ in range(16)])
                    for i in range(n)
                ],
                "vec_id bigint, embedding array<double>",
            )

        root = str(tmp_path / "ivf")
        day0 = day_vectors(0, 150)
        cent, assigned = build_ivf_index(day0, n_cells=8, seed=7)
        assert save_ivf_index(cent, assigned, root, keep_versions=3) == 0

        for day in (1, 2):
            c, members, conf = load_ivf_index(spark, root)
            batch_dir = str(tmp_path / f"day{day}")
            day_vectors(day, 80).write.parquet(batch_dir)
            batch = spark.read.parquet(batch_dir)
            assert all(f"day{day}" in f for f in batch.inputFiles())
            out = ivf_append(c, members, batch)
            assert save_ivf_index(c, out, root, keep_versions=3) == day

        _, final, conf = load_ivf_index(spark, root)
        assert conf["version"] == 2 and conf["n_members"] == 310
        assert final.count() == 310
        assert not ivf_rebuild_due(cent, final)["due"]

    @pytest.mark.slow  # r13 budget: skew-rebuild decision covered by test_ivf_append rebuild-threshold units
    def test_ivf_refresh_loop_closed_rebuild_on_skew(self, spark, tmp_path):
        """(r10) refresh_ivf_index closes the maintenance loop: quiet days
        append O(day) and commit; a planted skewed day (a displaced cloud
        that all lands in one frozen cell) flips ivf_rebuild_due, the
        refresh RE-FITS the codebook over old ∪ delta, and the committed
        next version restores cell balance — all through the same
        journaled versioned persistence."""
        import random

        from oni_ml_spark.datapipe.similarity import (
            build_ivf_index,
            ivf_rebuild_due,
            load_ivf_index,
            refresh_ivf_index,
            save_ivf_index,
        )

        rng = random.Random(5)

        def cloud(n, id0, shift):
            return spark.createDataFrame(
                [
                    (id0 + i, [rng.gauss(shift, 1.0) for _ in range(16)])
                    for i in range(n)
                ],
                "vec_id bigint, embedding array<double>",
            )

        root = str(tmp_path / "ivf_loop")
        cent, assigned = build_ivf_index(cloud(150, 0, 0.0), n_cells=8, seed=7)
        assert save_ivf_index(cent, assigned, root, keep_versions=4) == 0

        # quiet day: same distribution, no trigger, O(day) append commit
        quiet_dir = str(tmp_path / "quiet_day")
        cloud(40, 10_000, 0.0).write.parquet(quiet_dir)
        quiet = spark.read.parquet(quiet_dir)
        assert all("quiet_day" in f for f in quiet.inputFiles())  # O(day) input
        r1 = refresh_ivf_index(spark, root, quiet)
        assert r1["version"] == 1 and not r1["rebuilt"] and not r1["due"]
        _, m1, conf1 = load_ivf_index(spark, root)
        assert conf1["n_members"] == 190

        # skewed day: a displaced cloud, 2x the corpus — under the FROZEN
        # centroids it piles into the nearest cell(s) and flips the trigger
        r2 = refresh_ivf_index(spark, root, cloud(380, 20_000, 10.0))
        assert r2["due"] and r2["rebuilt"] and r2["version"] == 2
        assert r2["max_frac"] > 0.25  # the pre-rebuild candidate's stats

        # the committed re-fit restored balance: the trigger is quiet on
        # the NEW version's own centroids
        cent2, m2, conf2 = load_ivf_index(spark, root)
        assert conf2["version"] == 2 and conf2["n_members"] == 570
        after = ivf_rebuild_due(cent2, m2)
        assert not after["due"]
        assert after["max_frac"] < r2["max_frac"]

    def test_contract_gate_blocks_malformed_day(self, spark, ingested):
        """(r9) The contract gate is the drift gate's structural sibling:
        each day's batch must satisfy the data contract (non-null unique
        keys, values in range, bounded category space) BEFORE the drift
        comparison even runs — a malformed day (null keys, duplicate
        keys) raises with the failing rules named and never reaches the
        state. One aggregate over the day's files only."""
        from oni_ml_spark.datapipe.contracts import (
            expect_in_set,
            expect_not_null,
            expect_range,
            expect_row_count,
            expect_unique,
            validate_expectations,
        )

        contract = [
            expect_row_count(min_rows=1),
            expect_not_null("k"),
            expect_unique("k"),
            expect_range("v", lo=0.0, hi=6.0),
            expect_in_set("cat", [0, 1, 2, 3, 4]),
        ]
        for day in range(3):
            batch = spark.read.parquet(_day_dir(ingested, day))
            report = validate_expectations(batch.drop("ingest_batch"), contract)
            assert all(r["ok"] for r in report.collect())

        malformed = spark.range(0, 50).select(
            F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id") % 20).alias("k"),
            (F.col("id") % 7).cast("double").alias("v"),
            (F.col("id") % 5).alias("cat"),
            F.lit(9).alias("day"),
        )
        with pytest.raises(ValueError, match=r"not_null\(k\).*unique\(k\)|unique\(k\).*not_null\(k\)"):
            validate_expectations(malformed, contract)
