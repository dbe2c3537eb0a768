"""Source/sink tests (SURVEY.md §2.1): feedback TSV, top-domains CSV, TSV
sink round-trip, day-partitioned reads."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from oni_ml_spark.io import load_top_domains, read_day, write_tsv
from oni_ml_spark.transforms.feedback import load_feedback_tsv, oversample, severity_filter


def test_load_top_domains(spark, tmp_path):
    p = tmp_path / "top-1m.csv"
    p.write_text("1,google.com\n2,youtube.com\n3,amazon.co.uk\n4,intel.com\n")
    got = sorted(load_top_domains(spark, str(p)))
    # bare first label only (utilities/TopDomains.scala:9-13)
    assert got == ["amazon", "google", "intel", "youtube"]


def test_feedback_tsv_severity_and_oversample(spark, tmp_path):
    p = tmp_path / "scores.tsv"
    p.write_text(
        "sev\ttstart\tsrcIP\n"
        "3\t2016-05-05 01:00:00\t10.0.0.1\n"
        "2\t2016-05-05 02:00:00\t10.0.0.2\n"
        "3\t2016-05-05 03:00:00\t10.0.0.3\n"
    )
    df = load_feedback_tsv(spark, str(p), ["sev", "tstart", "srcIP"])
    assert df.count() == 3
    kept = severity_filter(df)
    assert {r["srcIP"] for r in kept.collect()} == {"10.0.0.1", "10.0.0.3"}
    assert oversample(kept, 10).count() == 20


def test_tsv_sink_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    out = str(tmp_path / "out")
    write_tsv(df.orderBy("k"), out, single_file=True)
    part = glob.glob(f"{out}/part-*.csv")[0]
    assert open(part).read().strip().splitlines() == ["1\ta", "2\tb"]


def test_read_day_prunes_partitions(spark, tmp_path):
    root = str(tmp_path / "days")
    df = spark.range(100).select(
        F.col("id"),
        (F.lit(2016)).alias("y"),
        (F.lit(5)).alias("m"),
        (F.col("id") % 3 + 1).cast("int").alias("d"),
    )
    df.write.partitionBy("y", "m", "d").parquet(root)
    day = read_day(spark, root, 2016, 5, 1)
    assert day.count() == 34
    plan = day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan  # pruning reaches the scan


def test_write_partitioned_layout(spark, tmp_path):
    from oni_ml_spark.io import write_partitioned

    df = spark.createDataFrame(
        [(1, 2016, 5, 5), (2, 2016, 5, 6)], "id int, yy int, mm int, dd int"
    )
    out = str(tmp_path / "scored")
    write_partitioned(df, out, "yy", "mm", "dd")
    back = read_day(spark, out, 2016, 5, 6)
    assert [r["id"] for r in back.collect()] == [2]
    assert glob.glob(f"{out}/y=2016/m=5/d=5/*.parquet")


def test_validate_schema(spark):
    from pyspark.sql import types as T

    from oni_ml_spark.io import SchemaMismatch, validate_schema

    expected = T.StructType(
        [T.StructField("a", T.IntegerType()), T.StructField("b", T.StringType())]
    )
    ok = spark.createDataFrame([(1, "x")], "a int, b string")
    assert validate_schema(ok, expected) is ok

    import pytest as _pytest

    wrong_type = spark.createDataFrame([(1, 2)], "a int, b int")
    with _pytest.raises(SchemaMismatch, match="column 'b': expected string"):
        validate_schema(wrong_type, expected)

    missing = spark.createDataFrame([(1,)], "a int")
    with _pytest.raises(SchemaMismatch, match="missing column 'b'"):
        validate_schema(missing, expected)

    extra = spark.createDataFrame([(1, "x", 2.0)], "a int, b string, c double")
    assert validate_schema(extra, expected) is extra  # lenient by default
    with _pytest.raises(SchemaMismatch, match="unexpected columns"):
        validate_schema(extra, expected, strict=True)


class TestJsonlOrc:
    def test_jsonl_roundtrip_with_schema(self, spark, tmp_path):
        from pyspark.sql import types as T

        from oni_ml_spark.io import read_jsonl, write_jsonl

        df = spark.range(100).select(
            F.col("id"), (F.col("id") % 7).alias("k"),
            F.concat(F.lit("row"), F.col("id").cast("string")).alias("s"),
        )
        path = str(tmp_path / "out.jsonl")
        write_jsonl(df, path)
        schema = T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("k", T.LongType()),
            T.StructField("s", T.StringType()),
        ])
        back = read_jsonl(spark, path, schema=schema)
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))

    def test_jsonl_permissive_captures_corrupt_lines(self, spark, tmp_path):
        from pyspark.sql import types as T

        from oni_ml_spark.io import read_jsonl

        p = tmp_path / "mixed.jsonl"
        p.write_text('{"id": 1}\nnot json at all\n{"id": 2}\n')
        schema = T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("_corrupt_record", T.StringType()),
        ])
        got = read_jsonl(spark, str(p), schema=schema).collect()
        ids = sorted(r["id"] for r in got if r["id"] is not None)
        bad = [r["_corrupt_record"] for r in got if r["_corrupt_record"] is not None]
        assert ids == [1, 2] and bad == ["not json at all"]

    def test_orc_roundtrip_and_pushdown(self, spark, tmp_path):
        from oni_ml_spark.io import read_orc, write_orc

        src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        path = str(tmp_path / "orders.orc")
        write_orc(src, path)
        back = read_orc(spark, path)
        assert back.count() == src.count()
        q = back.filter(F.col("o_totalprice") <= 1000).select("o_orderkey")
        plan = q._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "PushedFilters" in plan and "o_totalprice" in plan.split("ReadSchema")[1][:200]

    def test_orc_multi_path_read(self, spark, tmp_path):
        """Regression: orc(*paths) bound path #2 to the mergeSchema param."""
        from oni_ml_spark.io import read_orc, write_orc

        src = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
        p1, p2 = str(tmp_path / "a.orc"), str(tmp_path / "b.orc")
        write_orc(src, p1)
        write_orc(src, p2)
        assert read_orc(spark, p1, p2).count() == 2 * src.count()


def test_compact_parquet_reduces_files_and_preserves_rows(spark, tmp_path):
    from oni_ml_spark.io import compact_parquet, load_table

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    e = load_table(spark, "/root/testdata/sf0.001", "events")
    # simulate a fragmented sink: many tiny files
    e.repartition(40).write.parquet(src)
    import glob

    assert len(glob.glob(f"{src}/part-*.parquet")) == 40
    n = compact_parquet(spark, src, dst, target_file_mb=512, sort_col="user_id")
    files = glob.glob(f"{dst}/part-*.parquet")
    assert len(files) <= 2 and n <= 2
    back = spark.read.parquet(dst)
    assert back.count() == e.count()
    assert sorted(back.columns) == sorted(e.columns)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        compact_parquet(spark, src, src)
    # scheme/relative aliases of the same directory are caught too
    with _pytest.raises(ValueError):
        compact_parquet(spark, src, "file://" + src)
    with _pytest.raises(ValueError):
        compact_parquet(spark, src, src + "/../" + src.rsplit("/", 1)[-1])
    # nested paths in either direction are equally destructive
    with _pytest.raises(ValueError):
        compact_parquet(spark, src, src + "/child")
    with _pytest.raises(ValueError):
        compact_parquet(spark, src, src.rsplit("/", 1)[0])


def test_widen_if_narrow(spark):
    """Narrow frames widen to the session parallelism with identical rows;
    already-wide frames pass through untouched (same object — no shuffle
    node added on the scale path)."""
    from oni_ml_spark.io import load_table, widen_if_narrow

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    assert d.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    w = widen_if_narrow(d)
    assert w.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert sorted(r["doc_id"] for r in w.collect()) == sorted(
        r["doc_id"] for r in d.collect()
    )
    wide = d.repartition(spark.sparkContext.defaultParallelism + 4)
    assert widen_if_narrow(wide) is wide
    # explicit floor below the current width is also a pass-through
    assert widen_if_narrow(wide, min_partitions=2) is wide


def test_conform_schema_widens_fills_and_refuses(spark):
    """conform_schema: reorder + safe widening + typed-null fill, loud on
    anything lossy — the union/append front door."""
    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from oni_ml_spark.io import SchemaMismatch, conform_schema

    target = StructType(
        [
            StructField("id", LongType(), True),
            StructField("score", DoubleType(), True),
            StructField("tag", StringType(), True),
        ]
    )
    strict_id = StructType(
        [StructField("id", LongType(), False), StructField("score", DoubleType(), True), StructField("tag", StringType(), True)]
    )
    # int id (widens), float score (widens), tag missing (fills), shuffled order
    df = spark.createDataFrame([(1.5, 7)], "score float, id int")
    out = conform_schema(df, target, fill_missing=True)
    assert [(f.name, f.dataType.simpleString()) for f in out.schema.fields] == [
        ("id", "bigint"), ("score", "double"), ("tag", "string")
    ]
    row = out.collect()[0]
    assert row["id"] == 7 and abs(row["score"] - 1.5) < 1e-6 and row["tag"] is None
    # conformed frame appends cleanly onto a target-schema table
    base = spark.createDataFrame([(9, 2.0, "x")], target)
    assert base.unionByName(out).count() == 2

    # lossy/narrowing/cross-family casts refuse, listing offenders
    with pytest.raises(SchemaMismatch, match="cannot safely cast"):
        conform_schema(spark.createDataFrame([("5",)], "id string"), target, True)
    with pytest.raises(SchemaMismatch, match="cannot safely cast"):
        conform_schema(
            spark.createDataFrame([(1.0, 1.0, "t")], "id double, score double, tag string"),
            target,
        )
    # missing non-nullable column cannot be filled
    with pytest.raises(SchemaMismatch, match="non-nullable"):
        conform_schema(spark.createDataFrame([(1.0,)], "score double"), strict_id, True)
    # a PRESENT nullable source refuses a non-nullable target field too
    with pytest.raises(SchemaMismatch, match="source is nullable"):
        conform_schema(
            spark.createDataFrame([(1, 1.0, "t")], "id bigint, score double, tag string"),
            strict_id,
        )
    # missing nullable without fill_missing refuses too
    with pytest.raises(SchemaMismatch, match="missing column 'tag'"):
        conform_schema(spark.createDataFrame([(1, 1.0)], "id bigint, score double"), target)
    # extra columns never silently dropped
    with pytest.raises(SchemaMismatch, match="unexpected columns"):
        conform_schema(
            spark.createDataFrame([(1, 1.0, "t", 9)], "id bigint, score double, tag string, x int"),
            target,
        )
