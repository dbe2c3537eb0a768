"""Bloom-prefiltered joins: result identity with plain semi/anti joins
(including forced-false-positive and null-key regimes), bounded routing into
the exact join, persistence, and the no-shuffle keep branch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oni_ml_spark.plans.bloom import (
    bloom_anti_join,
    bloom_semi_join,
    build_bloom_filter,
    expected_fpp,
    merge_bloom_filters,
    might_contain_col,
    optimal_num_hashes,
    update_bloom_filter,
)


def _rows(df):
    return sorted(map(str, (tuple(r) for r in df.collect())))


@pytest.fixture(scope="module")
def big_small(spark):
    big = spark.range(2000).select(
        F.when(F.col("id") % 97 == 0, F.lit(None)).otherwise(F.col("id")).alias("k"),
        (F.col("id") * 3).alias("payload"),
    )
    # matches 0..49 (some keys twice), plus keys absent from big and a null
    small_rows = [(i,) for i in range(50)] + [(7,), (13,), (5000,), (None,)]
    small = spark.createDataFrame(small_rows, "k bigint")
    return big, small


def test_semi_join_matches_plain(spark, big_small):
    big, small = big_small
    plain = big.join(small, "k", "leftsemi")
    got = bloom_semi_join(big, small, "k")
    assert _rows(got) == _rows(plain)


def test_anti_join_matches_plain_incl_null_keys(spark, big_small):
    big, small = big_small
    plain = big.join(small, "k", "leftanti")
    got = bloom_anti_join(big, small, "k")
    assert _rows(got) == _rows(plain)
    # null-key big rows never match: all of them survive the anti join
    n_null = big.where(F.col("k").isNull()).count()
    assert got.where(F.col("k").isNull()).count() == n_null


def test_tiny_filter_forces_fps_still_exact(spark, big_small):
    """num_bits=64 saturates the bitmap — near-every row routes into the
    exact join — and the results must still be identical."""
    big, small = big_small
    assert _rows(bloom_anti_join(big, small, "k", num_bits=64, num_hashes=2)) == _rows(
        big.join(small, "k", "leftanti")
    )
    assert _rows(bloom_semi_join(big, small, "k", num_bits=64, num_hashes=2)) == _rows(
        big.join(small, "k", "leftsemi")
    )


def test_empty_small_side(spark, big_small):
    big, _ = big_small
    empty = spark.createDataFrame([], "k bigint")
    assert bloom_semi_join(big, empty, "k").count() == 0
    assert _rows(bloom_anti_join(big, empty, "k")) == _rows(big)


def test_maybe_routing_is_bounded(spark, big_small):
    """The shuffle-reduction claim, measured: rows passing the filter ==
    true matches + a small false-positive sliver (no false negatives)."""
    big, small = big_small
    bloom = build_bloom_filter(small, "k").localCheckpoint(eager=True)
    maybes = (
        big.crossJoin(F.broadcast(bloom))
        .where(might_contain_col("k", 1 << 23, 5))
        .count()
    )
    matches = big.join(small, "k", "leftsemi").count()
    non_members = big.count() - matches
    assert maybes >= matches  # no false negatives
    # 53 build keys in 2^23 bits: fpp ~ 1e-16; allow a generous slack of 1%
    assert maybes <= matches + max(2, int(0.01 * non_members))


def test_persisted_filter_probes_identically(spark, big_small, tmp_path):
    big, small = big_small
    path = str(tmp_path / "bloom")
    build_bloom_filter(small, "k", num_bits=1 << 16, num_hashes=4).write.parquet(path)
    reloaded = spark.read.parquet(path)
    got = bloom_anti_join(big, small, "k", num_bits=1 << 16, num_hashes=4, bloom=reloaded)
    assert _rows(got) == _rows(big.join(small, "k", "leftanti"))


def test_persisted_filter_params_are_authoritative(spark, big_small, tmp_path):
    """Probing a reloaded filter with mismatched num_bits/num_hashes args
    must NOT produce false negatives: the frame's stored build parameters
    win over whatever the caller passes."""
    big, small = big_small
    path = str(tmp_path / "bloom2")
    build_bloom_filter(small, "k", num_bits=1 << 16, num_hashes=4).write.parquet(path)
    reloaded = spark.read.parquet(path)
    # deliberately wrong args (defaults 2^23 / 5) — results must still match
    got = bloom_anti_join(big, small, "k", bloom=reloaded)
    assert _rows(got) == _rows(big.join(small, "k", "leftanti"))


def test_big_side_owning_a_words_column_survives(spark):
    """A big side that already has words/num_bits/num_hashes columns (a text
    corpus does) must not collide with the broadcast filter's columns."""
    big = spark.range(300).select(
        F.col("id").alias("k"),
        F.array(F.lit("w")).alias("words"),
        F.lit(11).alias("num_bits"),
        (F.col("id") * 2).alias("payload"),
    )
    small = spark.createDataFrame([(i,) for i in range(40)], "k bigint")
    plain_anti = big.join(small, "k", "leftanti")
    got = bloom_anti_join(big, small, "k")
    assert got.columns == big.columns
    assert _rows(got) == _rows(plain_anti)
    assert _rows(bloom_semi_join(big, small, "k")) == _rows(big.join(small, "k", "leftsemi"))


def test_multi_key_join(spark):
    big = spark.range(500).select(
        (F.col("id") % 20).alias("a"), (F.col("id") % 7).alias("b"), F.col("id").alias("v")
    )
    small = spark.createDataFrame([(i, i % 7) for i in range(10)], "a bigint, b bigint")
    assert _rows(bloom_semi_join(big, small, ["a", "b"])) == _rows(
        big.join(small, ["a", "b"], "leftsemi")
    )
    assert _rows(bloom_anti_join(big, small, ["a", "b"])) == _rows(
        big.join(small, ["a", "b"], "leftanti")
    )


def test_key_type_mismatch_raises(spark):
    big = spark.createDataFrame([(1,)], "k int")
    small = spark.createDataFrame([(1,)], "k bigint")
    with pytest.raises(ValueError, match="type mismatch"):
        bloom_semi_join(big, small, "k")


def test_param_validation(spark, big_small):
    big, small = big_small
    with pytest.raises(ValueError, match="num_bits"):
        build_bloom_filter(small, "k", num_bits=100)
    with pytest.raises(ValueError, match="num_hashes"):
        build_bloom_filter(small, "k", num_hashes=0)
    with pytest.raises(ValueError, match="missing"):
        bloom_semi_join(big, small, "nope")


def test_keep_branch_plans_without_shuffle(spark, big_small):
    """The definite-miss branch — the 100 TB majority — must reach its
    verdict from the scan + broadcast alone: no shuffle Exchange."""
    from oni_ml_spark.plans.diagnostics import plan_report

    big, small = big_small
    bloom = build_bloom_filter(small, "k").localCheckpoint(eager=True)
    kept = (
        big.crossJoin(F.broadcast(bloom))
        .where(~might_contain_col("k", 1 << 23, 5))
        .drop("words", "num_bits", "num_hashes")
    )
    rep = plan_report(kept)
    assert rep["shuffle_exchanges"] == 0
    assert rep["broadcast_exchanges"] >= 1


def test_fpp_helpers():
    assert expected_fpp(0, 1 << 20, 5) == 0.0
    # more bits -> lower fpp; helper matches the textbook curve shape
    assert expected_fpp(1000, 1 << 23, 5) < expected_fpp(1000, 1 << 16, 5) < 1.0
    assert optimal_num_hashes(1 << 20, 0) == 1
    assert optimal_num_hashes(1 << 20, 100_000) == max(
        1, min(16, round((1 << 20) / 100_000 * 0.6931471805599453))
    )


def test_reserved_probe_columns_rejected(spark, big_small):
    """A big side already carrying '__might' (or a '__bloom_*' name) would
    be silently overwritten and dropped by the probe plumbing — rejected
    up front instead (review-confirmed bug, now guarded)."""
    _, small = big_small
    big = spark.range(50).select(
        F.col("id").alias("k"), F.lit("payload").alias("__might")
    )
    with pytest.raises(ValueError, match="reserved column"):
        bloom_anti_join(big, small, "k")
    big2 = spark.range(50).select(
        F.col("id").alias("k"), F.lit("x").alias("__bloom_words")
    )
    with pytest.raises(ValueError, match="reserved column"):
        bloom_semi_join(big2, small, "k")


def test_stored_filter_key_type_drift_rejected(spark, tmp_path):
    """xxhash64 hashes (value, type): a persisted filter built over int
    keys probed after the table migrated to bigint would silently produce
    false negatives. The filter stores its build key types and the join
    wrappers refuse the drift (review finding)."""
    small_int = spark.createDataFrame([(i,) for i in range(40)], "k int")
    path = str(tmp_path / "bloom_typed")
    build_bloom_filter(small_int, "k", num_bits=1 << 16, num_hashes=4).write.parquet(path)
    reloaded = spark.read.parquet(path)
    # day-30 migration: both sides now bigint — big==small passes, stored must raise
    big = spark.range(300).select(F.col("id").alias("k"))
    small = spark.createDataFrame([(i,) for i in range(40)], "k bigint")
    with pytest.raises(ValueError, match="built over key types"):
        bloom_semi_join(big, small, "k", bloom=reloaded)
    # a filter frame without key_types (unknown provenance) is refused too
    with pytest.raises(ValueError, match="key_types"):
        bloom_anti_join(big, small, "k", bloom=reloaded.drop("key_types"))
    # matching types still probe fine
    big_i = spark.range(300).select(F.col("id").cast("int").alias("k"))
    got = bloom_semi_join(big_i, small_int, "k", bloom=reloaded)
    assert _rows(got) == _rows(big_i.join(small_int, "k", "leftsemi"))


def test_merge_and_update_equal_full_rebuild(spark):
    """update_bloom_filter(build(A), B) must equal build(A ∪ B) bit for bit
    (Bloom filters are closed under union), and mismatched parameters must
    refuse to merge."""
    a = spark.createDataFrame([(i,) for i in range(0, 400, 2)], "k bigint")
    b = spark.createDataFrame([(i,) for i in range(100, 500, 3)], "k bigint")
    both = a.unionByName(b)
    fa = build_bloom_filter(a, "k", num_bits=1 << 12, num_hashes=3)
    upd = update_bloom_filter(fa, b, "k").first()
    full = build_bloom_filter(both, "k", num_bits=1 << 12, num_hashes=3).first()
    assert list(upd["words"]) == list(full["words"])
    assert upd["num_bits"] == full["num_bits"] and upd["num_hashes"] == full["num_hashes"]
    # parameter mismatch refuses
    fb = build_bloom_filter(b, "k", num_bits=1 << 13, num_hashes=3)
    with pytest.raises(ValueError, match="different build parameters"):
        merge_bloom_filters(fa, fb)
    # key-type drift refuses
    b_int = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError, match="key types"):
        update_bloom_filter(fa, b_int, "k")
