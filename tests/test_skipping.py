"""File-level data skipping: manifest stats, pruning correctness (result
identity with the full-scan filter), z-order synergy, and staleness
detection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oni_ml_spark.plans.layout import write_zordered
from oni_ml_spark.plans.skipping import (
    build_file_stats,
    manifest_selectivity,
    pruned_paths,
    read_pruned,
    verify_file_stats,
)


def _rows(df):
    return sorted(map(str, (tuple(r) for r in df.collect())))


@pytest.fixture(scope="module")
def zordered(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("skip") / "tbl")
    df = spark.range(20_000).select(
        F.col("id"),
        (F.col("id") % 1000).alias("a"),
        ((F.col("id") * 7) % 500).alias("b"),
        F.when(F.col("id") % 11 == 0, F.lit(None))
        .otherwise(F.col("id") % 100)
        .alias("c"),
    )
    write_zordered(df, path, ["a", "b"], num_files=8)
    manifest = build_file_stats(spark.read.parquet(path), ["a", "b", "c"])
    manifest = manifest.localCheckpoint(eager=True)
    return path, manifest


def test_manifest_shape_and_totals(spark, zordered):
    path, manifest = zordered
    total = spark.read.parquet(path).count()
    agg = manifest.agg(F.sum("n_rows"), F.count(F.lit(1))).first()
    assert int(agg[0]) == total == 20_000
    assert int(agg[1]) == 8  # num_files
    for col in ("a_min", "a_max", "a_nulls", "c_nulls"):
        assert col in manifest.columns


def test_pruned_read_is_result_identical(spark, zordered):
    path, manifest = zordered
    preds = {"a": (10, 60)}
    full = spark.read.parquet(path).where(F.col("a").between(10, 60))
    got = read_pruned(spark, path, manifest, preds)
    assert _rows(got) == _rows(full)
    # the z-layout must actually prune: a 5% interval of `a` cannot need
    # every file
    assert len(pruned_paths(manifest, preds)) < 8


def test_multi_column_predicate(spark, zordered):
    path, manifest = zordered
    preds = {"a": (0, 200), "b": (0, 100)}
    full = spark.read.parquet(path).where(
        F.col("a").between(0, 200) & F.col("b").between(0, 100)
    )
    got = read_pruned(spark, path, manifest, preds)
    assert _rows(got) == _rows(full)


def test_open_ended_intervals(spark, zordered):
    path, manifest = zordered
    full = spark.read.parquet(path).where(F.col("a") >= 950)
    got = read_pruned(spark, path, manifest, {"a": (950, None)})
    assert _rows(got) == _rows(full)
    got_hi = read_pruned(spark, path, manifest, {"a": (None, 20)})
    assert _rows(got_hi) == _rows(spark.read.parquet(path).where(F.col("a") <= 20))


def test_out_of_domain_prunes_everything(spark, zordered):
    path, manifest = zordered
    assert pruned_paths(manifest, {"a": (5000, 6000)}) == []
    got = read_pruned(spark, path, manifest, {"a": (5000, 6000)})
    assert got.count() == 0
    assert got.schema == spark.read.parquet(path).schema


def test_null_column_semantics(spark, zordered):
    """Interval predicates never match null values; files where the column
    is entirely null are pruned, partially-null files keep exact results."""
    path, manifest = zordered
    full = spark.read.parquet(path).where(F.col("c").between(5, 10))
    got = read_pruned(spark, path, manifest, {"c": (5, 10)})
    assert _rows(got) == _rows(full)
    assert got.where(F.col("c").isNull()).count() == 0


def test_selectivity_report(spark, zordered):
    path, manifest = zordered
    sel = manifest_selectivity(manifest, {"a": (10, 60)})
    assert sel["files_total"] == 8 and sel["rows_total"] == 20_000
    assert 0 < sel["files_kept"] < 8
    assert 0 < sel["rows_kept"] < 20_000


def test_missing_stats_column_raises(spark, zordered):
    _, manifest = zordered
    with pytest.raises(ValueError, match="no stats"):
        pruned_paths(manifest, {"nope": (0, 1)})
    with pytest.raises(ValueError, match="non-empty"):
        pruned_paths(manifest, {})


def test_stale_manifest_detected(spark, zordered, tmp_path):
    fresh_path, fresh_manifest = zordered
    verify_file_stats(spark, fresh_path, fresh_manifest)  # fresh: passes
    # private copy of a small table; append a file the manifest never saw
    path = str(tmp_path / "tbl")
    spark.range(100).select(F.col("id"), (F.col("id") % 5).alias("a")).repartition(
        2
    ).write.parquet(path)
    manifest = build_file_stats(spark.read.parquet(path), ["a"]).localCheckpoint(
        eager=True
    )
    verify_file_stats(spark, path, manifest)
    extra = str(tmp_path / "append")
    spark.range(5).select(F.col("id"), F.lit(1).alias("a")).coalesce(1).write.parquet(
        extra
    )
    import shutil, glob, os

    for f in glob.glob(f"{extra}/part-*.parquet"):
        shutil.copy(f, os.path.join(path, os.path.basename(f)))
    with pytest.raises(ValueError, match="stale"):
        verify_file_stats(spark, path, manifest)


def test_partitioned_directory_result_identity(spark, tmp_path):
    """Hive-partitioned layout (key=value directories): pruned reads must
    reconstruct the partition columns (basePath) — without it they come
    back all-NULL and a predicate on a partition column returns zero rows
    (review-confirmed bug, now guarded)."""
    path = str(tmp_path / "ptbl")
    df = spark.range(2_000).select(
        F.col("id"),
        (F.col("id") % 4).alias("part"),
        (F.col("id") % 100).cast("double").alias("v"),
    )
    df.write.partitionBy("part").parquet(path)
    full = spark.read.parquet(path)
    manifest = build_file_stats(full, ["v", "part"]).localCheckpoint(eager=True)
    # predicate on a data column: rows AND partition values must match
    got = read_pruned(spark, path, manifest, {"v": (10.0, 20.0)})
    want = full.where(F.col("v").between(10.0, 20.0))
    assert _rows(got.select("id", "part", "v")) == _rows(want.select("id", "part", "v"))
    assert got.where(F.col("part").isNull()).count() == 0
    # predicate ON the partition column itself
    got_p = read_pruned(spark, path, manifest, {"part": (1, 1)})
    want_p = full.where(F.col("part") == 1)
    assert _rows(got_p.select("id", "part", "v")) == _rows(want_p.select("id", "part", "v"))
    assert got_p.count() == 500
