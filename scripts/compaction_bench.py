#!/usr/bin/env python
"""Compaction execution-strategy bench: wall-time vs bin count at FIXED
total bytes, per-bin jobs vs grouped (one job per directory).

The per-bin strategy pays one Spark job (scheduling + planning + commit
protocol) per output bin, so at fixed data volume its wall-time grows
linearly with the bin count; the grouped strategy pays one job per
DIRECTORY (rows routed to bins by a bin-id column + partitionBy), so its
wall-time should stay ~constant as the same bytes fragment into more
bins.  This script generates one dataset per fragment-count level (same
total rows every level), compacts a fresh copy under each strategy, and
prints one JSON line per (level, strategy).

Usage: python scripts/compaction_bench.py [--rows 400000] \
    [--levels 32,128,512] [--files-per-bin 4]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_ap = argparse.ArgumentParser()
_ap.add_argument("--rows", type=int, default=400_000)
_ap.add_argument("--levels", default="32,128,512")
_ap.add_argument("--files-per-bin", type=int, default=4)
_args = _ap.parse_args()

LEVELS = [int(x) for x in _args.levels.split(",")]
ROOT = "/tmp/compaction_bench"


def build(spark, n_fragments: int) -> str:
    """n_fragments equal-size files holding the SAME total rows at every
    level — only the fragmentation varies."""
    from pyspark.sql import functions as F

    path = f"{ROOT}/frag{n_fragments:05d}"
    shutil.rmtree(path, ignore_errors=True)
    rows_per = _args.rows // n_fragments
    df = spark.range(_args.rows).select(
        "id", F.md5(F.col("id").cast("string")).alias("payload")
    )
    # one write, n_fragments files: repartition by a fragment key
    df.withColumn("f", (F.col("id") % n_fragments).cast("int")).repartition(
        n_fragments, "f"
    ).drop("f").write.mode("overwrite").parquet(path)
    return path


def main() -> None:
    from oni_ml_spark.plans.compaction import compact_dataset, dataset_files
    from oni_ml_spark.session import get_spark

    spark = get_spark("compaction_bench")
    spark.range(1000).count()
    for n_frag in LEVELS:
        for grouped in (False, True):
            path = build(spark, n_frag)
            files = dataset_files(spark, path)
            sizes = [f["bytes"] for f in files]
            target = max(sizes) * _args.files_per_bin + 1
            t0 = time.perf_counter()
            res = compact_dataset(
                spark, path, target_bytes=target,
                small_bytes=max(sizes) + 1, grouped=grouped,
            )
            dt = round(time.perf_counter() - t0, 3)
            print(json.dumps({
                "n_fragments": n_frag,
                "grouped": grouped,
                "n_bins": res["n_bins"],
                "files_removed": res["files_removed"],
                "sec": dt,
            }), flush=True)
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
