"""Footer-based storage profiling (plans.storage): per-column sizes rank
correctly, extrapolation tracks the listing, layout report fields, and
the schema-drift flag."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oni_ml_spark.plans.storage import _sample, layout_report, storage_profile


@pytest.fixture(scope="module")
def dataset(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("storage") / "ds")
    # 'constant' RLE/dict-compresses to almost nothing; 'noise' (md5 hex)
    # barely compresses — the profile must rank noise far above constant
    spark.range(20_000).select(
        F.col("id"),
        F.lit("aaaaaaaaaaaaaaaaaaaaaaaa").alias("constant"),
        F.md5(F.col("id").cast("string")).alias("noise"),
    ).repartition(4).write.parquet(path)
    return path


class TestStorageProfile:
    def test_columns_complete_and_ranked(self, spark, dataset):
        prof = {r["column"]: r.asDict() for r in storage_profile(spark, dataset).collect()}
        assert set(prof) == {"id", "constant", "noise"}
        assert prof["noise"]["compressed_bytes"] > 5 * prof["constant"]["compressed_bytes"]
        assert prof["constant"]["compression_ratio"] > prof["noise"]["compression_ratio"]
        # report is ordered biggest-first
        ordered = [r["column"] for r in storage_profile(spark, dataset).collect()]
        assert ordered[0] == "noise"

    def test_fractions_sum_to_one(self, spark, dataset):
        total = sum(r["frac_of_total"] for r in storage_profile(spark, dataset).collect())
        assert total == pytest.approx(1.0, abs=0.01)

    def test_extrapolation_full_sample_is_exact_share(self, spark, dataset):
        """With every file sampled, est_total_bytes == the sampled sums
        (scale factor covers data pages vs footer overhead, so compare
        column SHARES, which are exact)."""
        rows = storage_profile(spark, dataset, sample_files=1000).collect()
        for r in rows:
            assert r["est_total_bytes"] >= r["compressed_bytes"]
        assert all(r["n_values"] == 20_000 for r in rows)
        assert all(r["n_nulls"] == 0 for r in rows)

    def test_empty_dataset_raises(self, spark, tmp_path):
        with pytest.raises(ValueError, match="no data files"):
            storage_profile(spark, str(tmp_path / "missing"))

    def test_stride_sample_deterministic_and_covering(self):
        files = [{"file": f"f{i:03d}", "bytes": i} for i in range(100)]
        s1 = _sample(files, 10)
        s2 = _sample(list(reversed(files)), 10)
        assert s1 == s2 and len(s1) == 10
        names = [f["file"] for f in s1]
        assert names[0] == "f000" and names[-1] >= "f090"


class TestDatasetReport:
    def test_one_call_datasheet(self, spark, dataset):
        from oni_ml_spark.plans.storage import dataset_report

        rep = dataset_report(spark, dataset, top_columns=2)
        assert set(rep) == {"layout", "storage_top", "profile"}
        assert rep["layout"]["n_files"] == 4
        assert len(rep["storage_top"]) == 2
        assert rep["storage_top"][0]["column"] == "noise"
        prof = {p["column"]: p for p in rep["profile"]}
        assert set(prof) == {"id", "constant", "noise"}
        assert all(p["n_rows"] == 20_000 for p in prof.values())
        assert prof["constant"]["n_nulls"] == 0


class TestLayoutReport:
    def test_fields_and_counts(self, spark, dataset):
        rep = layout_report(spark, dataset)
        assert rep["n_files"] == 4
        assert rep["total_bytes"] > 0
        assert rep["file_bytes_min"] <= rep["file_bytes_p50"] <= rep["file_bytes_max"]
        assert rep["row_group_rows_p50"] > 0
        assert not rep["files_with_schema_drift"]

    def test_schema_drift_flagged(self, spark, tmp_path):
        path = str(tmp_path / "drifty")
        spark.range(10).select("id").coalesce(1).write.mode("append").parquet(path)
        spark.range(10).select(
            "id", F.lit("x").alias("extra")
        ).coalesce(1).write.mode("append").parquet(path)
        assert layout_report(spark, path)["files_with_schema_drift"]
