#!/usr/bin/env python
"""Evidence run for select_to_token_budget: the bucketed plan vs the naive
unpartitioned running-sum window it exists to replace, at single-node scale.

Synthetic corpus (quality ~ U(0,1) hash-derived, tokens 50-1050), budget =
~25% of total tokens. Both plans produce the identical selected id-set
(asserted). Measures wall clock of a count+token-sum action over each.
Two passes, second reported; clearCache+GC isolation per run (BASELINE.md
discipline). The naive window's cost is ONE reducer sorting and cumsumming
the whole corpus; the bucket plan's is two scans + a window over ~1/1000 of
the rows — the gap widens with cluster size, the single-node reading is the
floor of the claim, not its ceiling.

Usage: python scripts/budget_bench.py [--rows 20000000]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PATH = "/tmp/budget_bench.parquet"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    args = ap.parse_args()

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from oni_ml_spark.datapipe.sampling import select_to_token_budget
    from oni_ml_spark.session import get_spark

    spark = get_spark("budget-bench")
    spark.sparkContext.setLogLevel("ERROR")
    (
        spark.range(args.rows)
        .select(
            F.col("id"),
            (F.pmod(F.xxhash64("id"), F.lit(1 << 30)).cast("double") / (1 << 30)).alias("q"),
            (50 + F.pmod(F.xxhash64("id", F.lit("t")), F.lit(1000))).alias("toks"),
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(PATH)
    )
    df = spark.read.parquet(PATH)
    total = df.agg(F.sum("toks")).collect()[0][0]
    budget = int(total * 0.25)

    def naive_frame():
        w = Window.orderBy(F.col("q").desc(), F.xxhash64("id").asc()).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return df.withColumn("run", F.sum("toks").over(w)).where(
            F.col("run") <= budget
        )

    def bucketed_frame():
        return select_to_token_budget(
            df, "toks", budget, quality_col="q", id_col="id", n_buckets=1000
        )

    def naive():
        return naive_frame().agg(F.count(F.lit(1)), F.sum("toks")).collect()[0]

    def bucketed():
        return bucketed_frame().agg(F.count(F.lit(1)), F.sum("toks")).collect()[0]

    results: dict[str, float] = {}
    outs: dict[str, tuple] = {}
    for pass_no in (1, 2):
        for name, thunk in (("naive_window", naive), ("bucketed", bucketed)):
            spark.catalog.clearCache()
            gc.collect()
            t0 = time.time()
            outs[name] = tuple(thunk())
            results[name] = round(time.time() - t0, 2)
            print(json.dumps({"pass": pass_no, name: results[name]}), flush=True)
    assert outs["naive_window"] == outs["bucketed"], (
        f"result mismatch: {outs}"
    )
    # identical selected SETS, not just identical (count, sum): both anti
    # joins must be empty (untimed — this is the correctness gate)
    a, b = naive_frame().select("id"), bucketed_frame().select("id")
    diff = a.join(b, "id", "leftanti").count() + b.join(a, "id", "leftanti").count()
    assert diff == 0, f"selected sets differ by {diff} ids"
    print(
        "FINAL:"
        + json.dumps(
            {
                "rows": args.rows,
                "budget": budget,
                "selected_rows": outs["bucketed"][0],
                **results,
            }
        )
    )


if __name__ == "__main__":
    main()
