"""Sources and sinks (SURVEY.md §2.1 S1-S7).

All reads are DataFrame reader API (predicate pushdown + column pruning reach
the Parquet scan); the reference's driver-local Source.fromFile reads
(S4/S5 — netflow/FlowPreLDA.scala:73, utilities/TopDomains.scala:9-13) become
distributed csv reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_parquet(spark: SparkSession, *paths: str) -> DataFrame:
    """S1-S3. Accepts multiple paths — fixing the reference quirk that used
    only the first of a comma-separated list (dns/DNSPreLDA.scala:91)."""
    return spark.read.parquet(*paths)


#: columns stored as TIMESTAMP(NANOS) in the synthetic testdata — Spark reads
#: them as long (spark.sql.legacy.parquet.nanosAsLong); converted on load.
_NANO_TS_COLUMNS = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic testdata table, normalizing nano-timestamp columns
    to proper TimestampType (microsecond truncation).

    Sets the nanos-as-long legacy conf on the LIVE session too (it is a
    runtime SQLConf): the driver's verify harness calls queries() with its
    own SparkSession, which won't have session.py's configs.
    """
    if name in _NANO_TS_COLUMNS:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # NOTE: no session-timezone mutation here. events.ts loads as
        # TIMESTAMP_NTZ (tz-free micros parquet); all epoch arithmetic on it
        # goes through transforms.time.time_as_double, whose NTZ branch is
        # an interval division against the NTZ epoch literal — independent
        # of the session timezone, so results cannot depend on table load
        # order or a caller's deliberate timezone setting.
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _NANO_TS_COLUMNS.get(name, []):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            # integer division: epoch nanos exceed double's exact-int range,
            # so a float divide could land on the wrong microsecond
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def widen_if_narrow(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY when the frame has fewer partitions
    than the session's parallelism — the single-file / single-row-group
    input fix.

    Parquet splits at row-group granularity: a file written as one row
    group yields ONE scan task no matter how many byte-range splits Spark
    makes, so every CPU-heavy projection chained onto the scan (tokenize,
    shingle, hash, featurize) runs serially on one core. Measured on the
    sf0.1 documents table (one 5000-row row group, local[32]):
    near_dup_clusters 8.7→4.6 s, ngram_diagnostics 5.6→4.4 s just from
    widening the scan.

    At real scale this is a no-op by construction: a 100 TB input has
    thousands of row groups, the partition-count check (metadata only — no
    job, no data read) passes, and no shuffle is added. The repartition
    only fires for inputs small enough that shuffling them is trivially
    cheap relative to the serial-scan penalty they would otherwise pay.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def read_day(spark: SparkSession, root: str, year: int, month: int, day: int) -> DataFrame:
    """Partition-pruned day read over the reference's y=/m=/d= Hive layout
    (README.md:22,56). The filter is on partition columns only — Catalyst
    prunes directories, no data files outside the day are opened."""
    df = spark.read.parquet(root)
    return df.where((F.col("y") == year) & (F.col("m") == month) & (F.col("d") == day))


def write_tsv(
    df: DataFrame, path: str, single_file: bool = False, delimiter: str = "\t"
) -> None:
    """S6: delimited text sink (netflow/FlowPostLDA.scala:80); ``delimiter``
    mirrors the reference's --delimiter option
    (SuspiciousConnectsArgumentParser.scala:107). coalesce(1) only on
    request — it serializes the write; the ml_ops.sh getmerge step
    (ml_ops.sh:127-128) is the scalable equivalent."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("sep", delimiter).csv(path)


def write_partitioned(
    df: DataFrame, path: str, year_col: str, month_col: str, day_col: str
) -> None:
    """Write results under the reference's y=/m=/d= Hive layout (README.md:22)
    so downstream day reads partition-prune. Renames to the y/m/d partition
    names the reference's directory convention uses."""
    (
        df.withColumn("y", F.col(year_col))
        .withColumn("m", F.col(month_col))
        .withColumn("d", F.col(day_col))
        .write.mode("overwrite")
        .partitionBy("y", "m", "d")
        .parquet(path)
    )


def load_top_domains(spark: SparkSession, path: str) -> list[str]:
    """S5: Alexa-style ``rank,domain`` csv → bare second-level names
    (utilities/TopDomains.scala:9-13: parts(1).split('.')(0))."""
    df = spark.read.csv(path).toDF("rank", "domain")
    rows = (
        df.select(F.split(F.col("domain"), r"\.").getItem(0).alias("name"))
        .distinct()
        .collect()
    )
    return [r["name"] for r in rows]


class SchemaMismatch(ValueError):
    """Raised when an input frame doesn't provide the expected columns/types."""


def validate_schema(df: DataFrame, expected, strict: bool = False) -> DataFrame:
    """Validate a DataFrame against an expected StructType.

    The reference trusts parquet schema-on-read and dies mid-job with cast
    errors (SURVEY.md §1.2, e.g. the Row(ibyt: Long) match at
    netflow/FlowWordCreation.scala:38); this fails fast at read time instead.

    - missing columns → SchemaMismatch (always)
    - type mismatches → SchemaMismatch listing every offender
    - strict=True additionally rejects unexpected extra columns
    Returns df unchanged on success (chainable).
    """
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    problems = []
    for f in expected.fields:
        want = f.dataType.simpleString()
        if f.name not in actual:
            problems.append(f"missing column '{f.name}' ({want})")
        elif actual[f.name] != want:
            problems.append(
                f"column '{f.name}': expected {want}, got {actual[f.name]}"
            )
    if strict:
        extra = set(actual) - {f.name for f in expected.fields}
        if extra:
            problems.append(f"unexpected columns: {sorted(extra)}")
    if problems:
        raise SchemaMismatch("; ".join(problems))
    return df


# widening casts that cannot lose information — everything else (narrowing,
# string→number, float→int ...) must be an explicit upstream decision, not
# something an ingest helper does silently
_SAFE_WIDENINGS = {
    ("tinyint", "smallint"), ("tinyint", "int"), ("tinyint", "bigint"),
    ("smallint", "int"), ("smallint", "bigint"),
    ("int", "bigint"),
    ("tinyint", "double"), ("smallint", "double"), ("int", "double"),
    ("float", "double"),
}


def conform_schema(df: DataFrame, target, fill_missing: bool = False) -> DataFrame:
    """Align ``df`` to a target StructType for union/append: reorder
    columns, apply SAFE widening casts (int→bigint, float→double, ...),
    and — with ``fill_missing`` — add absent nullable columns as typed
    nulls. Everything lossy stays LOUD: narrowing or cross-family casts,
    extra columns, and missing non-nullable columns raise SchemaMismatch
    listing every offender (the day-30 ingest trap is one upstream
    producer quietly switching int→string; silently casting it would turn
    a schema bug into data corruption).

    The companion to ``validate_schema`` (which only checks) and the
    intended front door for ``streaming.dedup_append_writer`` /
    ``merge_upsert`` when producers drift within safe-widening limits:
    ``writer(conform_schema(batch, target, fill_missing=True), id)``.
    Pure projection — no shuffle, no data pass beyond the plan change.
    """
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    problems = []
    out_cols = []
    for f in target.fields:
        want = f.dataType.simpleString()
        if f.name not in actual:
            if fill_missing and f.nullable:
                out_cols.append(F.lit(None).cast(f.dataType).alias(f.name))
            else:
                problems.append(
                    f"missing column '{f.name}' ({want})"
                    + ("" if f.nullable else " — non-nullable, cannot fill")
                )
            continue
        have = actual[f.name]
        src_nullable = df.schema[f.name].nullable
        if src_nullable and not f.nullable:
            # simpleString comparison drops nullability — without this a
            # nullable source would silently "conform" to a non-nullable
            # target and corrupt its invariant with NULLs
            problems.append(
                f"column '{f.name}': source is nullable but the target is "
                "non-nullable — assert/filter nulls upstream first"
            )
        elif have == want:
            out_cols.append(F.col(f.name))
        elif (have, want) in _SAFE_WIDENINGS:
            out_cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            problems.append(
                f"column '{f.name}': cannot safely cast {have} -> {want}"
            )
    extra = set(actual) - {f.name for f in target.fields}
    if extra:
        problems.append(
            f"unexpected columns: {sorted(extra)} — drop them explicitly"
        )
    if problems:
        raise SchemaMismatch("; ".join(problems))
    return df.select(*out_cols)


def read_jsonl(
    spark: SparkSession,
    *paths: str,
    schema=None,
    strict: bool = False,
) -> DataFrame:
    """Distributed JSON-lines source — the other log-delivery format network
    telemetry commonly arrives in (beyond the reference's parquet-only
    S1-S3 surface).

    ALWAYS pass ``schema`` in production: without one Spark runs a full
    inference pass over the data (twice the IO) and infers unstable types
    across days. Under PERMISSIVE (the default), malformed lines are
    quarantined into a ``_corrupt_record`` string column ONLY IF the
    caller's schema includes that field — with a data-columns-only schema
    Spark silently yields an all-null row for a bad line, so production
    schemas should append
    ``StructField("_corrupt_record", StringType())`` and alert on
    non-null counts. ``strict=True`` switches to FAILFAST so a bad line
    kills the read loudly instead.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    reader = reader.option("mode", "FAILFAST" if strict else "PERMISSIVE")
    return reader.json(list(paths))


def write_jsonl(df: DataFrame, path: str, compression: str | None = "gzip") -> None:
    """JSON-lines sink (one file per partition). Gzip by default — results
    tables are small and gzip is NOT splittable (a re-read gets one task
    per file); pass ``compression=None`` for splittable plain-text files,
    or prefer parquet for big exports (columnar + pushdown on re-read)."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_orc(spark: SparkSession, *paths: str) -> DataFrame:
    """ORC source — same columnar pushdown/pruning properties as parquet
    (PushedFilters + ReadSchema reach the scan), for lakes standardized on
    ORC. Interchangeable with read_parquet in every pipeline here.

    Paths go through as a list: ``DataFrameReader.orc``'s second positional
    parameter is ``mergeSchema``, so ``orc(*paths)`` would silently bind a
    second path to it and fail.
    """
    return spark.read.orc(list(paths))


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink (snappy by default)."""
    df.write.mode("overwrite").orc(path)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_mb: int = 512,
    sort_col: str | None = None,
) -> int:
    """Small-files compaction: rewrite a parquet directory into files of
    ~``target_file_mb`` each (returns the output file count).

    Streaming sinks and fine-grained partitioned writes leave thousands of
    KB-scale files; at 100 TB the resulting driver listing + per-file open
    overhead dominates scan time long before row decoding does. Input size
    comes from the file index (no data read); the rewrite is one
    repartition — round-robin by default (best size balance), or
    repartitionByRange on ``sort_col`` + a within-partition sort so the
    compacted files also carry tight min/max stats for that column
    (single-column cousin of plans.write_zordered).

    dst must differ from src: a same-path overwrite would delete the
    input mid-read. Local paths (schemeless or file:) are resolved through
    realpath so aliases of the same directory are caught too; comparisons
    of other schemes are textual.

    Returns the REQUESTED output partition count (ceil of size/target);
    the actual file count can be lower when repartitionByRange on a
    low-cardinality sort_col leaves empty partitions.
    """
    import math
    import os

    def _norm(p: str) -> str:
        bare = p[len("file://"):] if p.startswith("file://") else (
            p[len("file:"):] if p.startswith("file:") else p
        )
        if "://" in bare:
            return bare.rstrip("/")
        return os.path.realpath(bare)

    a, b = _norm(src), _norm(dst)
    # nesting is as destructive as equality: overwriting an ancestor deletes
    # the source directory recursively before/while the lazy read executes
    if a == b or a.startswith(b + "/") or b.startswith(a + "/"):
        raise ValueError(
            "dst must not equal, contain, or be contained in src "
            "(overwrite would delete the input mid-read)"
        )
    df = spark.read.parquet(src)
    # size via a recursive Hadoop-FS listing — metadata only (no data
    # read), and a PUBLIC API (the former probe went through the private
    # df._jdf.queryExecution() surface, which is not stable across Spark
    # versions)
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(src)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total_bytes = 0
    root_str = fs.makeQualified(hpath).toString().rstrip("/")
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        f = it.next()
        # skip write markers/checksums AND anything under a hidden directory
        # (_temporary/ debris from failed writes) — matching what Spark's own
        # InMemoryFileIndex excludes, so the size estimate equals what the
        # subsequent read will actually see
        p = f.getPath()
        hidden = False
        while p is not None and p.toString().rstrip("/") != root_str:
            if p.getName().startswith(("_", ".")):
                hidden = True
                break
            p = p.getParent()
        if not hidden:
            total_bytes += f.getLen()
    n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    if sort_col is not None:
        out = df.repartitionByRange(n_files, sort_col).sortWithinPartitions(sort_col)
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(dst)
    return n_files
