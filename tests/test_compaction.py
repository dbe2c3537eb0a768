"""Small-file compaction (plans.compaction): bin-packing plan unit tests,
roundtrip content preservation, partitioned datasets, idempotence, and
crash/recovery at every injected failure point."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from oni_ml_spark.plans.compaction import (
    compact_dataset,
    compaction_plan,
    dataset_files,
    pending_compactions,
    recover_compaction,
)


def _content_hash(spark, path):
    df = spark.read.parquet(path)
    row = (
        df.select(F.xxhash64(*sorted(df.columns)).alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("h") % 1_000_003).alias("s"),
        )
        .first()
    )
    return (row["n"], row["s"])


def _write_fragmented(spark, path, n_fragments=8, rows_per=50, partitioned=False):
    df = spark.range(n_fragments * rows_per).select(
        F.col("id"),
        (F.col("id") % 4).alias("k"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    for i in range(n_fragments):
        frag = df.filter((F.col("id") >= i * rows_per) & (F.col("id") < (i + 1) * rows_per))
        w = frag.write.mode("append")
        if partitioned:
            w.partitionBy("k").parquet(path)
        else:
            w.parquet(path)


class TestPlan:
    def test_bin_packing_first_fit_decreasing(self):
        files = [
            {"file": f"f{i}", "bytes": b, "dir": ""}
            for i, b in enumerate([60, 40, 35, 30, 20, 15])
        ]
        plan = compaction_plan(files, target_bytes=100, small_bytes=50)
        # small = 40,35,30,20,15 → FFD bins: [40,35,20] (95), [30,15] (45)
        sizes = sorted(b["bytes"] for b in plan.bins)
        assert sizes == [45, 95]
        assert plan.n_files_small == 5 and plan.n_files_compacted == 5

    def test_per_directory_grouping(self):
        files = [
            {"file": "a/1", "bytes": 10, "dir": "a"},
            {"file": "a/2", "bytes": 10, "dir": "a"},
            {"file": "b/1", "bytes": 10, "dir": "b"},
        ]
        plan = compaction_plan(files, target_bytes=100)
        # b has only one small file — nothing to merge there
        assert len(plan.bins) == 1 and plan.bins[0]["dir"] == "a"

    def test_large_files_untouched(self):
        files = [
            {"file": "big", "bytes": 900, "dir": ""},
            {"file": "s1", "bytes": 10, "dir": ""},
            {"file": "s2", "bytes": 10, "dir": ""},
        ]
        plan = compaction_plan(files, target_bytes=100)
        assert all("big" not in b["files"] for b in plan.bins)

    def test_singleton_bin_dropped(self):
        files = [
            {"file": "s1", "bytes": 90, "dir": ""},
            {"file": "s2", "bytes": 90, "dir": ""},
        ]
        # each alone overflows a 100-byte bin with the other → two
        # singleton bins → both dropped
        plan = compaction_plan(files, target_bytes=100, small_bytes=95)
        assert plan.bins == []


class TestPlanProperties:
    """Property-based invariants of the FFD bin-packer (pure driver code —
    no Spark): no file in two bins, capacity respected except for
    singletons, every multi-small directory fully covered."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3),      # dir id
                st.integers(min_value=1, max_value=2000),   # bytes
            ),
            min_size=0,
            max_size=80,
        ),
        st.integers(min_value=2, max_value=2500),           # target
    )
    def test_packing_invariants(self, spec, target):
        files = [
            {"file": f"d{d}/f{i}", "bytes": b, "dir": f"d{d}"}
            for i, (d, b) in enumerate(spec)
        ]
        plan = compaction_plan(files, target_bytes=target)
        small = target // 2
        seen = []
        for b in plan.bins:
            # every bin merges >= 2 files from ONE directory
            assert len(b["files"]) >= 2
            dirs = {f.split("/")[0] for f in b["files"]}
            assert dirs == {b["dir"]}
            seen.extend(b["files"])
            by_name = {f["file"]: f["bytes"] for f in files}
            sizes = [by_name[f] for f in b["files"]]
            assert b["bytes"] == sum(sizes)
            # capacity: a bin only exceeds target when its FIRST (largest)
            # file alone does — and then it holds just that file, which
            # the singleton rule already dropped, so in practice:
            assert b["bytes"] <= target or max(sizes) > target
            # only small files ever enter a bin
            assert all(s < small for s in sizes)
        # no file placed twice
        assert len(seen) == len(set(seen))
        assert plan.n_files_total == len(files)
        assert plan.n_files_small == sum(1 for f in files if f["bytes"] < small)


class TestExecute:
    @pytest.mark.parametrize("grouped", [False, True])
    def test_roundtrip_and_file_count(self, spark, tmp_path, grouped):
        path = str(tmp_path / f"ds_{grouped}")
        _write_fragmented(spark, path)
        before = _content_hash(spark, path)
        n_before = len(dataset_files(spark, path))
        res = compact_dataset(spark, path, target_bytes=1 << 30, grouped=grouped)
        assert res["executed"]
        assert _content_hash(spark, path) == before
        n_after = len(dataset_files(spark, path))
        assert n_after < n_before
        assert n_after == n_before - res["files_removed"]
        # everything fits one bin per directory at a 1 GiB target
        assert n_after == 1

    @pytest.mark.parametrize("grouped", [False, True])
    def test_partitioned_compacts_within_partitions(self, spark, tmp_path, grouped):
        path = str(tmp_path / f"pds_{grouped}")
        _write_fragmented(spark, path, partitioned=True)
        before = _content_hash(spark, path)
        res = compact_dataset(spark, path, target_bytes=1 << 30, grouped=grouped)
        assert res["executed"]
        assert _content_hash(spark, path) == before
        files = dataset_files(spark, path)
        # one compacted file per partition directory, partition col intact
        assert len(files) == 4
        assert sorted({f["dir"] for f in files}) == [f"k={i}" for i in range(4)]
        assert spark.read.parquet(path).groupBy("k").count().count() == 4

    @pytest.mark.parametrize("grouped", [False, True])
    def test_schema_evolved_fragments_keep_all_columns(self, spark, tmp_path, grouped):
        """Fragments written across a schema evolution (a later column)
        must compact with the UNION of columns — dropping the late column
        would destroy its values with the originals."""
        path = str(tmp_path / f"evo_{grouped}")
        spark.range(10).select("id").write.mode("append").parquet(path)
        spark.range(10, 20).select(
            "id", F.lit("en").alias("lang")
        ).write.mode("append").parquet(path)
        res = compact_dataset(spark, path, target_bytes=1 << 30, grouped=grouped)
        assert res["executed"]
        out = spark.read.option("mergeSchema", "true").parquet(path)
        assert sorted(out.columns) == ["id", "lang"]
        assert out.filter(F.col("lang") == "en").count() == 10
        assert out.count() == 20

    def test_idempotent_second_run(self, spark, tmp_path):
        path = str(tmp_path / "ds2")
        _write_fragmented(spark, path)
        compact_dataset(spark, path, target_bytes=1 << 30)
        res2 = compact_dataset(spark, path, target_bytes=1 << 30)
        assert not res2["executed"] and res2["n_bins"] == 0

    def test_dry_run_touches_nothing(self, spark, tmp_path):
        path = str(tmp_path / "ds3")
        _write_fragmented(spark, path)
        n_before = len(dataset_files(spark, path))
        res = compact_dataset(spark, path, target_bytes=1 << 30, dry_run=True)
        assert not res["executed"] and res["n_bins"] >= 1
        assert len(dataset_files(spark, path)) == n_before

    @pytest.mark.parametrize("grouped", [False, True])
    def test_sort_cols_orders_compacted_file(self, spark, tmp_path, grouped):
        """sort_cols sorts each bin's rows on write, so the compacted
        file's footer min/max are tight for the sorted column."""
        path = str(tmp_path / f"sorted_{grouped}")
        _write_fragmented(spark, path)
        before = _content_hash(spark, path)
        res = compact_dataset(
            spark, path, target_bytes=1 << 30, sort_cols=["id"], grouped=grouped
        )
        assert res["executed"]
        assert _content_hash(spark, path) == before
        files = dataset_files(spark, path)
        assert len(files) == 1
        import pyarrow.parquet as pq

        local = files[0]["file"].removeprefix("file:")
        ids = pq.read_table(local, columns=["id"]).column("id").to_pylist()
        assert ids == sorted(ids)

    @pytest.mark.parametrize("grouped", [False, True])
    def test_target_splits_into_multiple_bins(self, spark, tmp_path, grouped):
        path = str(tmp_path / f"ds4_{grouped}")
        _write_fragmented(spark, path, n_fragments=8)
        before = _content_hash(spark, path)
        sizes = [f["bytes"] for f in dataset_files(spark, path)]
        target = max(sizes) * 3  # ~3 fragments per bin
        res = compact_dataset(
            spark, path, target_bytes=target, small_bytes=max(sizes) + 1,
            grouped=grouped,
        )
        assert res["executed"] and res["n_bins"] >= 2
        assert _content_hash(spark, path) == before


class TestMaintenancePolicy:
    def test_due_then_not_after_compaction(self, spark, tmp_path):
        from oni_ml_spark.plans.compaction import compaction_due

        path = str(tmp_path / "policy")
        _write_fragmented(spark, path, n_fragments=8)
        verdict = compaction_due(spark, path, target_bytes=1 << 30)
        assert verdict["due"] and verdict["small_frac"] == 1.0
        assert verdict["files_removable"] > 0
        compact_dataset(spark, path, target_bytes=1 << 30)
        after = compaction_due(spark, path, target_bytes=1 << 30)
        assert not after["due"] and after["files_removable"] == 0

    def test_tiny_dataset_never_due(self, spark, tmp_path):
        from oni_ml_spark.plans.compaction import compaction_due

        path = str(tmp_path / "tiny")
        spark.range(10).coalesce(1).write.parquet(path)
        assert not compaction_due(spark, path, target_bytes=1 << 30)["due"]


class TestManifestInteraction:
    def test_compaction_invalidates_then_rebuilds_skipping_manifest(
        self, spark, tmp_path
    ):
        """Compaction rewrites files, so a persisted data-skipping manifest
        MUST fail verify_file_stats afterwards (a stale manifest silently
        drops rows from pruned reads) — and a rebuild over the compacted
        dataset restores pruning with identical query results."""
        from oni_ml_spark.plans.skipping import (
            build_file_stats,
            pruned_paths,
            verify_file_stats,
        )

        path = str(tmp_path / "skipds")
        _write_fragmented(spark, path)
        manifest_df = build_file_stats(
            spark.read.parquet(path), ["id"]
        ).localCheckpoint()
        verify_file_stats(spark, path, manifest_df)  # fresh: passes

        assert compact_dataset(spark, path, target_bytes=1 << 30)["executed"]
        with pytest.raises(ValueError, match="stale"):
            verify_file_stats(spark, path, manifest_df)

        rebuilt = build_file_stats(spark.read.parquet(path), ["id"]).localCheckpoint()
        verify_file_stats(spark, path, rebuilt)
        files = pruned_paths(rebuilt, {"id": (0, 10)})
        assert files  # the one compacted file covers the range
        got = spark.read.parquet(*files).where("id <= 10").count()
        assert got == spark.read.parquet(path).where("id <= 10").count()


class TestRecovery:
    @pytest.mark.parametrize("crash_at,expect", [
        ("staged", None),          # pre-journal: nothing to recover
        ("journal", "back"),       # journal written, nothing moved yet
        ("trashed", "forward"),    # originals out → finish the swap
    ])
    @pytest.mark.parametrize("grouped", [False, True])
    def test_crash_then_recover(self, spark, tmp_path, crash_at, expect, grouped):
        path = str(tmp_path / f"crash_{crash_at}_{grouped}")
        _write_fragmented(spark, path)
        before = _content_hash(spark, path)
        with pytest.raises(RuntimeError, match="injected crash"):
            compact_dataset(
                spark, path, target_bytes=1 << 30,
                _crash_after=crash_at, grouped=grouped,
            )
        tokens = pending_compactions(spark, path)
        if expect is None:
            assert tokens == []
        else:
            assert len(tokens) == 1
            assert recover_compaction(spark, path, tokens[0]) == expect
            assert pending_compactions(spark, path) == []
        # whatever the path, content is exactly the pre-compaction corpus
        assert _content_hash(spark, path) == before
        # hidden dirs cleaned up (staging may linger only pre-journal,
        # where it is invisible to readers and re-runs)
        if expect is not None:
            leftovers = [
                p for p in glob.glob(os.path.join(path, "_compact_*"))
            ]
            assert leftovers == []

    def test_completed_run_with_orphan_journal_reports_forward(self, spark, tmp_path):
        """A crash between the trash delete and the journal delete leaves
        an orphan journal over a fully-compacted dataset — recovery must
        report 'forward' (the dataset IS post-compaction), not 'back'."""
        import json as _json

        path = str(tmp_path / "orphan")
        _write_fragmented(spark, path)
        before = _content_hash(spark, path)
        res = compact_dataset(spark, path, target_bytes=1 << 30)
        assert res["executed"] and pending_compactions(spark, path) == []
        # reconstruct the orphan state: a journal naming moves that all
        # landed and originals that are gone (trash already deleted)
        files = dataset_files(spark, path)
        assert len(files) == 1
        journal = {
            "token": "deadbeef0123",
            "moves": [{"src": path + "/_gone/s", "dst": files[0]["file"]}],
            "originals": [
                {"src": path + "/old-part.parquet", "dst": path + "/_gone/t"}
            ],
            "staging": path + "/_compact_staging_deadbeef0123",
            "trash": path + "/_compact_trash_deadbeef0123",
        }
        with open(f"{path}/_compact_journal_deadbeef0123.json", "w") as f:
            _json.dump(journal, f)
        assert recover_compaction(spark, path, "deadbeef0123") == "forward"
        assert pending_compactions(spark, path) == []
        assert _content_hash(spark, path) == before

    def test_recovered_forward_dataset_is_compacted(self, spark, tmp_path):
        path = str(tmp_path / "fwd")
        _write_fragmented(spark, path)
        with pytest.raises(RuntimeError):
            compact_dataset(spark, path, target_bytes=1 << 30, _crash_after="trashed")
        token = pending_compactions(spark, path)[0]
        assert recover_compaction(spark, path, token) == "forward"
        assert len(dataset_files(spark, path)) == 1

    def test_rerun_after_rollback_succeeds(self, spark, tmp_path):
        path = str(tmp_path / "rb")
        _write_fragmented(spark, path)
        before = _content_hash(spark, path)
        with pytest.raises(RuntimeError):
            compact_dataset(spark, path, target_bytes=1 << 30, _crash_after="journal")
        recover_compaction(spark, path, pending_compactions(spark, path)[0])
        res = compact_dataset(spark, path, target_bytes=1 << 30)
        assert res["executed"]
        assert _content_hash(spark, path) == before


class TestGroupedExecution:
    """(r10) grouped staging: one job per directory writes all its bins."""

    def test_grouped_equals_per_bin_content_multi_dir_multi_bin(
        self, spark, tmp_path
    ):
        """Same fragmented partitioned dataset compacted both ways: byte
        content, file counts, and per-partition bin layout all agree."""
        pa = str(tmp_path / "gpa")
        pb = str(tmp_path / "gpb")
        for p in (pa, pb):
            _write_fragmented(spark, p, partitioned=True, n_fragments=6)
        before = _content_hash(spark, pa)
        assert _content_hash(spark, pb) == before
        sizes = [f["bytes"] for f in dataset_files(spark, pa)]
        target = max(sizes) * 3
        ra = compact_dataset(
            spark, pa, target_bytes=target, small_bytes=max(sizes) + 1,
            grouped=False,
        )
        rb = compact_dataset(
            spark, pb, target_bytes=target, small_bytes=max(sizes) + 1,
            grouped=True,
        )
        assert ra["executed"] and rb["executed"]
        assert ra["n_bins"] == rb["n_bins"] >= 2
        assert _content_hash(spark, pa) == before
        assert _content_hash(spark, pb) == before
        fa, fb = dataset_files(spark, pa), dataset_files(spark, pb)
        assert len(fa) == len(fb)
        assert sorted(f["dir"] for f in fa) == sorted(f["dir"] for f in fb)

    def test_grouped_zero_row_bin_absorbed(self, spark, tmp_path):
        """(r11) zero-row bins no longer abort the grouped mode: empty
        fragments (delete-heavy day, empty micro-batches) are staged
        through the per-bin empty-write path INSIDE the same grouped
        call — the unattended day-2 loop keeps closing without a
        grouped=False rerun."""
        path = str(tmp_path / "gzero")
        # partition p=a: only empty fragments (a pure zero-row bin);
        # partition p=b: real rows across fragments (nonzero bins) —
        # one grouped call must handle both directories
        for _ in range(3):
            spark.range(0).select(
                F.col("id"), F.md5(F.col("id").cast("string")).alias("payload")
            ).coalesce(1).write.mode("append").parquet(path + "/p=a")
        for i in range(3):
            spark.range(i * 10, i * 10 + 10).select(
                F.col("id"), F.md5(F.col("id").cast("string")).alias("payload")
            ).coalesce(1).write.mode("append").parquet(path + "/p=b")
        assert len(dataset_files(spark, path)) == 6
        before = _content_hash(spark, path)
        res = compact_dataset(spark, path, target_bytes=1 << 30, grouped=True)
        assert res["executed"] and res["n_bins"] == 2
        assert _content_hash(spark, path) == before
        assert pending_compactions(spark, path) == []
        files = dataset_files(spark, path)
        assert len(files) == 2
        assert sorted(f["dir"] for f in files) == ["p=a", "p=b"]
        # idempotent: the two right-sized survivors plan zero bins
        res2 = compact_dataset(spark, path, target_bytes=1 << 30, grouped=True)
        assert not res2["executed"]

    def test_grouped_all_empty_dataset_compacts(self, spark, tmp_path):
        """(r11) the degenerate all-empty directory — every fragment zero
        rows — compacts grouped: N empty files collapse to one
        schema-bearing empty file, content (zero rows) preserved."""
        path = str(tmp_path / "gallempty")
        for _ in range(3):
            spark.range(0).select(F.col("id")).coalesce(1).write.mode(
                "append"
            ).parquet(path)
        assert len(dataset_files(spark, path)) == 3
        res = compact_dataset(spark, path, target_bytes=1 << 30, grouped=True)
        assert res["executed"]
        assert len(dataset_files(spark, path)) == 1
        assert spark.read.parquet(path).count() == 0
        assert spark.read.parquet(path).columns == ["id"]

    def test_maintain_loop_survives_delete_heavy_day(self, spark, tmp_path):
        """(r11, the ADVICE scenario) maintain_dataset defaults
        grouped=True; a directory of empty micro-batch fragments must not
        wedge the unattended loop."""
        from oni_ml_spark.plans.compaction import maintain_dataset

        path = str(tmp_path / "gwedge")
        for _ in range(10):
            spark.range(0).select(F.col("id")).coalesce(1).write.mode(
                "append"
            ).parquet(path)
        out = maintain_dataset(spark, path, target_bytes=1 << 30)
        assert out["due"]["due"] and out["executed"]
        assert len(dataset_files(spark, path)) == 1
        # and the loop stays closed: second call quiet
        out2 = maintain_dataset(spark, path, target_bytes=1 << 30)
        assert not out2["due"]["due"] and not out2["executed"]


class TestMaintainLoop:
    def test_maintain_recovers_then_compacts_then_idempotent(
        self, spark, tmp_path
    ):
        """(r10) maintain_dataset closes the day-2 loop: a crashed prior
        run is repaired FIRST (journal rolled forward/back), the trigger
        is evaluated on the repaired state, and a due dataset compacts —
        one call, idempotent on re-run."""
        from oni_ml_spark.plans.compaction import maintain_dataset

        path = str(tmp_path / "loop")
        _write_fragmented(spark, path, n_fragments=8)
        before = _content_hash(spark, path)
        # crash mid-swap: originals trashed, bins not yet live
        with pytest.raises(RuntimeError, match="injected crash"):
            compact_dataset(spark, path, target_bytes=1 << 30, _crash_after="trashed")
        assert len(pending_compactions(spark, path)) == 1

        out = maintain_dataset(spark, path, target_bytes=1 << 30)
        # the interrupted run rolled FORWARD (originals were out) — the
        # dataset is already compacted, so the trigger is quiet and no
        # second compaction runs
        assert out["recovered"] and out["recovered"][0][1] == "forward"
        assert not out["due"]["due"] and not out["executed"]
        assert _content_hash(spark, path) == before
        assert len(dataset_files(spark, path)) == 1

        # fresh fragmentation: the loop compacts (grouped by default)
        _write_fragmented(spark, path, n_fragments=8)
        before2 = _content_hash(spark, path)
        out2 = maintain_dataset(spark, path, target_bytes=1 << 30)
        assert out2["recovered"] == [] and out2["due"]["due"] and out2["executed"]
        assert _content_hash(spark, path) == before2

        # idempotent: nothing pending, nothing due, nothing executed
        out3 = maintain_dataset(spark, path, target_bytes=1 << 30)
        assert out3["recovered"] == [] and not out3["due"]["due"]
        assert not out3["executed"]
        assert _content_hash(spark, path) == before2
