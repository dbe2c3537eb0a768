"""File-level data skipping: min/max stats manifests + pruned parquet reads.

Parquet row-group pruning only helps AFTER a file is opened; at the 100 TB
target the win that matters is never opening the file at all.  Table formats
(Delta/Iceberg) get this from per-file column stats recorded in the commit
log; this module produces the same artifact for plain parquet directories:

- ``build_file_stats``: one columnar pass over the stats columns, grouped by
  ``input_file_name()``, yielding one manifest row per file with per-column
  min / max / null-count plus the file row count.  Run it at write time (the
  writer just produced the data — the pass is over the freshly written
  files) and persist the manifest next to the table; at 1 GiB files a
  100 TB table is a ~100k-row manifest.
- ``pruned_paths``: evaluate closed-interval predicates AGAINST THE MANIFEST
  (a few-thousand-row frame, driver-collected — bounded by the file count,
  never by the data) and return only the files whose stats ranges intersect.
- ``read_pruned``: read just those files and re-apply the exact predicate,
  so the result is identical to a full-scan filter whenever the manifest
  covers the directory.  A stale manifest that MISSES files would silently
  drop rows — ``verify_file_stats`` checks coverage with a data-column-free
  scan (footer row counts only).

Pairs with ``plans.layout.write_zordered``: the Z-curve clusters every
participating column, so each file's min/max span is tight and interval
predicates on ANY z-ordered column prune most files.  On an unsorted layout
every file spans the whole domain and nothing prunes — the manifest makes
that visible (``manifest_selectivity``).

Beyond-reference operator (SURVEY.md §7.5 layout family): the reference
prunes at the Hive day-partition level only (oni-ml Scala
``SuspiciousConnectsArgumentParser`` date filters); this is the
finer-grained file-level equivalent for arbitrary numeric columns.
"""

from __future__ import annotations

from functools import reduce
from typing import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

Bound = tuple[float | int | None, float | int | None]


def build_file_stats(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Per-file stats manifest for ``df`` (must be a file-backed scan).

    Schema: ``(file string, n_rows bigint, <c>_min, <c>_max, <c>_nulls
    bigint ...)`` — min/max keep each column's own type, so string columns
    work too (lexicographic intervals).  One shuffle keyed by file name;
    map-side combine reduces it to one row per (partition, file) before the
    exchange.
    """
    if not columns:
        raise ValueError("columns must be non-empty")
    aggs: list = [F.count(F.lit(1)).alias("n_rows")]
    for c in columns:
        aggs += [
            F.min(c).alias(f"{c}_min"),
            F.max(c).alias(f"{c}_max"),
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}_nulls"),
        ]
    return (
        df.select(F.input_file_name().alias("file"), *columns)
        .groupBy("file")
        .agg(*aggs)
    )


def _keep_condition(predicates: Mapping[str, Bound]):
    """Manifest-row keep condition: every predicate interval intersects the
    file's [min, max] span.  A file whose stats column is entirely null
    (all rows null) can satisfy no interval predicate — pruned, matching
    SQL ``BETWEEN`` null semantics."""
    conds = []
    for c, (lo, hi) in predicates.items():
        keep = F.col(f"{c}_min").isNotNull()
        if lo is not None:
            keep = keep & (F.col(f"{c}_max") >= F.lit(lo))
        if hi is not None:
            keep = keep & (F.col(f"{c}_min") <= F.lit(hi))
        conds.append(keep)
    return reduce(lambda a, b: a & b, conds)


def _check_predicates(manifest: DataFrame, predicates: Mapping[str, Bound]) -> None:
    if not predicates:
        raise ValueError("predicates must be non-empty")
    cols = set(manifest.columns)
    missing = [c for c in predicates if f"{c}_min" not in cols]
    if missing:
        raise ValueError(
            f"manifest has no stats for {missing} — rebuild build_file_stats "
            "with these columns"
        )


def pruned_paths(manifest: DataFrame, predicates: Mapping[str, Bound]) -> list[str]:
    """Files whose stats ranges intersect every ``{col: (lo, hi)}`` interval
    (``None`` = unbounded end).  Driver-side list, bounded by the file
    count — the manifest is the small table here."""
    _check_predicates(manifest, predicates)
    rows = manifest.where(_keep_condition(predicates)).select("file").collect()
    return sorted(r["file"] for r in rows)


def manifest_selectivity(manifest: DataFrame, predicates: Mapping[str, Bound]) -> dict:
    """How well the layout prunes for this predicate: files and rows kept
    vs total.  One bounded aggregate over the manifest."""
    _check_predicates(manifest, predicates)
    keep = _keep_condition(predicates)
    row = manifest.agg(
        F.count(F.lit(1)).alias("files_total"),
        F.sum(keep.cast("bigint")).alias("files_kept"),
        F.sum("n_rows").alias("rows_total"),
        F.sum(F.when(keep, F.col("n_rows")).otherwise(F.lit(0))).alias("rows_kept"),
    ).first()
    return {k: (0 if row[k] is None else int(row[k])) for k in row.asDict()}


def _interval_filter(predicates: Mapping[str, Bound]):
    conds = []
    for c, (lo, hi) in predicates.items():
        cond = F.col(c).isNotNull()
        if lo is not None:
            cond = cond & (F.col(c) >= F.lit(lo))
        if hi is not None:
            cond = cond & (F.col(c) <= F.lit(hi))
        conds.append(cond)
    return reduce(lambda a, b: a & b, conds)


def read_pruned(
    spark: SparkSession,
    path: str,
    manifest: DataFrame,
    predicates: Mapping[str, Bound],
) -> DataFrame:
    """Read only the manifest-surviving files of ``path`` and re-apply the
    exact interval predicate.

    Result-identical to ``spark.read.parquet(path).where(<predicate>)``
    provided the manifest covers the directory (``verify_file_stats``); the
    residual filter means pruning can only ever skip files the predicate
    could not match, never change per-row semantics.
    """
    files = pruned_paths(manifest, predicates)
    base = spark.read.parquet(path)  # schema from one footer, no data read
    flt = _interval_filter(predicates)
    if not files:
        return spark.createDataFrame([], base.schema).where(flt)
    # basePath keeps Hive-style partition discovery working when the files
    # live under key=value directories: without it, reading leaf files
    # returns the partition columns as all-NULL (silently wrong rows, and
    # zero rows for a predicate ON a partition column)
    return (
        spark.read.option("basePath", path)
        .schema(base.schema)
        .parquet(*files)
        .where(flt)
    )


def verify_file_stats(spark: SparkSession, path: str, manifest: DataFrame) -> None:
    """Raise if the directory's current file set differs from the manifest's.

    The listing scan selects ZERO data columns — Spark serves it from
    parquet footers — so this is cheap even on a large table.  Run it when
    reusing a persisted manifest against a table someone else may have
    appended to; a manifest missing files would silently drop their rows
    from ``read_pruned``.
    """
    current = {
        r["file"]
        for r in spark.read.parquet(path)
        .select(F.input_file_name().alias("file"))
        .distinct()
        .collect()
    }
    recorded = {r["file"] for r in manifest.select("file").distinct().collect()}
    if current != recorded:
        extra = sorted(current - recorded)[:5]
        gone = sorted(recorded - current)[:5]
        raise ValueError(
            f"manifest is stale: {len(current - recorded)} unrecorded file(s) "
            f"(e.g. {extra}), {len(recorded - current)} recorded-but-missing "
            f"(e.g. {gone}) — rebuild with build_file_stats"
        )
