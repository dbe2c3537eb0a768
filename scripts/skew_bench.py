#!/usr/bin/env python
"""Hot-group evidence for ranking.grouped_topk / select_canonical — the
module's reason to exist is that a plain rank window ships EVERY row of a
hot group to one reducer; this measures that straggler directly.

Input: a synthetic skewed table written once to /tmp — one 'hot' group
holding 50% of all rows, the rest spread over 1024 uniform groups; value is
a deterministic integer-hash-derived double, tie key is the row id. Then,
two passes (second reported, first absorbs JIT/codegen warm-up), each of:

- window:  row_number() OVER (PARTITION BY grp ORDER BY value DESC, id)
           filtered to rank <= k — the textbook plan (and grouped_topk's
           k>1 default); the hot group's reducer receives n/2 rows.
- salted:  grouped_topk(algorithm='salted') — two balanced all-JVM window
           passes; no reducer holds the hot group.
- k=1 fast path: grouped_topk k=1 (pure-codegen min(struct), the
           select_canonical plan) vs the k=1 window.

The r6 Arrow-batch local prune this bench originally measured (4× slower
than the plain window at 4M-64M rows — the numbers in SCALE.md §round-7)
was removed from grouped_topk on the strength of those readings; to
reproduce them, check out the pre-removal revision of ranking.py (git log
-- oni_ml_spark/datapipe/ranking.py).

Usage: python scripts/skew_bench.py [--rows 4000000] [--k 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INPUT = "/tmp/skew_bench_input.parquet"


def build(spark, n_rows: int, payload_bytes: int) -> None:
    from pyspark.sql import functions as F

    # the payload column is what makes the comparison honest: a plain rank
    # window shuffles FULL rows to the group reducer, so the hot group's
    # straggler carries n/2 * payload bytes; the local prune ships <= k
    # rows per (group, batch)
    df = (
        spark.range(n_rows)
        .repartition(32)
        .select(
            F.col("id"),
            F.when(F.col("id") % 2 == 0, F.lit("hot"))
            .otherwise(F.concat(F.lit("g"), (F.col("id") % 1024).cast("string")))
            .alias("grp"),
            ((F.col("id") * 2654435761) % 1000003 / 1000003.0).alias("value"),
            F.concat(F.lit("p" * payload_bytes), F.col("id").cast("string"))
            .alias("payload"),
        )
    )
    df.write.mode("overwrite").parquet(INPUT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--payload-bytes", type=int, default=64)
    args = ap.parse_args()

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from oni_ml_spark.datapipe.ranking import grouped_topk
    from oni_ml_spark.session import get_spark

    spark = get_spark("skew-bench")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark, args.rows, args.payload_bytes)
    df = spark.read.parquet(INPUT)

    def windowed(k: int):
        w = Window.partitionBy("grp").orderBy(F.desc("value"), F.col("id"))
        return (
            df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )

    plans = {
        f"window_k{args.k}": lambda: windowed(args.k),
        f"salted_k{args.k}": lambda: grouped_topk(
            df, "grp", "value", args.k, tie_col="id", algorithm="salted"),
        "window_k1": lambda: windowed(1),
        "gtopk_k1_minstruct": lambda: grouped_topk(
            df, "grp", "value", 1, tie_col="id"),
    }
    results = {}
    for pass_no in (1, 2):
        for name, thunk in plans.items():
            t0 = time.time()
            thunk().write.format("noop").mode("overwrite").save()
            results[name] = round(time.time() - t0, 2)
            print(json.dumps({"pass": pass_no, name: results[name]}), flush=True)
    # sanity: both k-variants agree on the hot group's top row
    top_w = windowed(1).filter(F.col("grp") == "hot").select("id").collect()
    top_g = grouped_topk(df, "grp", "value", 1, tie_col="id") \
        .filter(F.col("grp") == "hot").select("id").collect()
    assert [r["id"] for r in top_w] == [r["id"] for r in top_g], "result mismatch"
    print("FINAL:" + json.dumps({
        "rows": args.rows, "k": args.k, "hot_share": 0.5,
        "payload_bytes": args.payload_bytes, **results}))


if __name__ == "__main__":
    main()
