"""Parquet storage profiling from footers — the "what is eating my
100 TB" report.  Column-chunk metadata (compressed/uncompressed sizes,
encodings, value counts) lives in each file's footer, so a per-column
storage breakdown needs NO data read: sample the footers of a bounded
number of files, aggregate driver-side, extrapolate by the listed total.

At 100 TB / 1 GiB files the full listing is ~10⁵ rows and 64-256 sampled
footers (deterministic stride over the sorted listing — every partition
range gets sampled, no RNG) describe the layout to within a few percent
unless the dataset's schema varies wildly file-to-file — in which case
``layout_report``'s ``files_with_schema_drift`` flag says so (run it
alongside ``storage_profile`` before trusting the extrapolation).

Uses pyarrow for footer parsing (driver-side; works on any
pyarrow-readable filesystem — local paths here, fsspec-backed object
stores in production).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oni_ml_spark.plans.compaction import dataset_files


def _local_path(uri: str) -> str:
    if uri.startswith("file:"):
        p = uri[len("file:"):]
        while p.startswith("//"):
            p = p[1:]
        return p
    return uri


def _sample(files: list[dict], n: int) -> list[dict]:
    """Deterministic stride sample over the name-sorted listing — covers
    every partition range, replayable across runs."""
    ordered = sorted(files, key=lambda f: f["file"])
    if len(ordered) <= n:
        return ordered
    stride = len(ordered) / n
    return [ordered[int(i * stride)] for i in range(n)]


def _footer_scan(spark: SparkSession, path: str, sample_files: int):
    """(files, sampled, metas): one FS listing + one footer parse per
    sampled file, shared by storage_profile / layout_report /
    dataset_report so the one-call datasheet pays the metadata cost
    once."""
    import pyarrow.parquet as pq

    files = dataset_files(spark, path)
    sampled = _sample(files, sample_files)
    metas = [pq.ParquetFile(_local_path(f["file"])).metadata for f in sampled]
    return files, sampled, metas


def storage_profile(
    spark: SparkSession, path: str, sample_files: int = 64, _scan=None
) -> DataFrame:
    """Per-column storage report, extrapolated from sampled footers:
    (column, compressed_bytes, uncompressed_bytes, compression_ratio,
    frac_of_total, est_total_bytes, encodings, n_values, n_nulls).
    Sizes are the SAMPLE's exact sums; est_total_bytes scales each
    column's share by listed-total / sampled-total bytes."""
    files, sampled, metas = _scan or _footer_scan(spark, path, sample_files)
    if not files:
        raise ValueError(f"storage_profile: no data files under {path}")
    total_bytes = sum(f["bytes"] for f in files)
    sampled_bytes = sum(f["bytes"] for f in sampled)

    cols: dict[str, dict] = {}
    for meta in metas:
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                name = c.path_in_schema
                agg = cols.setdefault(
                    name,
                    {
                        "compressed": 0,
                        "uncompressed": 0,
                        "n_values": 0,
                        "n_nulls": 0,
                        "encodings": set(),
                    },
                )
                agg["compressed"] += c.total_compressed_size
                agg["uncompressed"] += c.total_uncompressed_size
                agg["n_values"] += c.num_values
                if c.statistics is not None and c.statistics.null_count is not None:
                    agg["n_nulls"] += c.statistics.null_count
                agg["encodings"].update(str(e) for e in c.encodings)

    grand = sum(a["compressed"] for a in cols.values()) or 1
    scale = (total_bytes / sampled_bytes) if sampled_bytes else 1.0
    rows = [
        (
            name,
            int(a["compressed"]),
            int(a["uncompressed"]),
            round(a["uncompressed"] / a["compressed"], 3) if a["compressed"] else None,
            round(a["compressed"] / grand, 4),
            int(a["compressed"] * scale),
            sorted(a["encodings"]),
            int(a["n_values"]),
            int(a["n_nulls"]),
        )
        for name, a in sorted(
            cols.items(), key=lambda kv: -kv[1]["compressed"]
        )
    ]
    return spark.createDataFrame(
        rows,
        "column string, compressed_bytes bigint, uncompressed_bytes bigint, "
        "compression_ratio double, frac_of_total double, est_total_bytes bigint, "
        "encodings array<string>, n_values bigint, n_nulls bigint",
    )


def dataset_report(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    sample_files: int = 64,
    top_columns: int = 8,
) -> dict:
    """The one-call datasheet for an unfamiliar parquet dataset:
    {'layout': file/row-group/schema-drift summary (footers only),
     'storage_top': the ``top_columns`` biggest columns by compressed
     bytes with shares and extrapolated totals (footers only),
     'profile': per-column rows/nulls/distinct/min/max
     (plans.diagnostics.profile_table — the ONE data scan in the call)}.
    Everything returned is driver-bounded (|columns| + |bins| rows); the
    data scan reads only the profiled columns."""
    from oni_ml_spark.plans.diagnostics import profile_table

    scan = _footer_scan(spark, path, sample_files)
    layout = layout_report(spark, path, sample_files, _scan=scan)
    storage = storage_profile(spark, path, sample_files, _scan=scan)
    top = [
        {
            "column": r["column"],
            "frac_of_total": r["frac_of_total"],
            "est_total_bytes": r["est_total_bytes"],
            "compression_ratio": r["compression_ratio"],
        }
        # explicit orderBy: limit() without one has no ordering guarantee,
        # so "top" could silently return non-top columns under repartitioning
        for r in storage.orderBy(F.desc("compressed_bytes"), "column")
        .limit(top_columns)
        .collect()
    ]
    df = spark.read.parquet(path)
    prof = [r.asDict() for r in profile_table(df, columns).collect()]
    return {"layout": layout, "storage_top": top, "profile": prof}


def layout_report(
    spark: SparkSession, path: str, sample_files: int = 64, _scan=None
) -> dict:
    """File/row-group layout summary from the listing + sampled footers:
    the numbers that decide maxPartitionBytes, compaction targets, and
    whether footers mention schema drift.  Driver-side, bounded."""
    files, sampled, metas = _scan or _footer_scan(spark, path, sample_files)
    if not files:
        raise ValueError(f"layout_report: no data files under {path}")
    sizes = sorted(f["bytes"] for f in files)
    rg_sizes: list[int] = []
    rg_rows: list[int] = []
    schemas = set()
    for meta in metas:
        schemas.add(tuple(meta.schema.names))
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            rg_sizes.append(g.total_byte_size)
            rg_rows.append(g.num_rows)

    def pct(xs, q):
        return xs[min(len(xs) - 1, int(q * len(xs)))] if xs else 0

    return {
        "n_files": len(files),
        "total_bytes": sum(sizes),
        "file_bytes_p50": pct(sizes, 0.5),
        "file_bytes_p95": pct(sizes, 0.95),
        "file_bytes_min": sizes[0],
        "file_bytes_max": sizes[-1],
        "n_sampled_footers": len(sampled),
        "row_groups_per_sampled_file": round(len(rg_sizes) / len(sampled), 2),
        "row_group_bytes_p50": pct(sorted(rg_sizes), 0.5),
        "row_group_rows_p50": pct(sorted(rg_rows), 0.5),
        "files_with_schema_drift": len(schemas) > 1,
    }
