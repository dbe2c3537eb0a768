#!/usr/bin/env python
"""Scaling evidence for fuzzy_join: the positional q-gram filter must keep
the edit-distance self-join sub-quadratic — candidate pairs ∝ gram
collisions, never N².

Synthetic corpus: N random 24-char strings over a 20-letter alphabet
(collision-sparse, like real names/titles) + N/100 planted 1-edit typo
pairs. Reports, at two sizes (N and 4N):

- wall clock of the full fuzzy_join (k=1) — a quadratic operator would
  read ~16x at 4N; the gram join should track the candidate count;
- candidate pairs entering the exact verify (via the module's own _grams
  composition) vs the N*(N-1)/2 all-pairs a cross join would check;
- verified pairs (>= the planted count — random near-collisions possible).

Two passes per size, second reported; clearCache+GC isolation.

Usage: python scripts/fuzzy_bench.py [--n 200000]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PATH = "/tmp/fuzzy_bench.parquet"


def build(spark, n: int) -> None:
    from pyspark.sql import functions as F

    alphabet = "abcdefghijklmnopqrst"
    # 24 hash-derived letters per id — deterministic, no RNG
    letters = [
        F.substring(
            F.lit(alphabet),
            (F.pmod(F.xxhash64("id", F.lit(i)), F.lit(20)) + 1).cast("int"),
            1,
        )
        for i in range(24)
    ]
    base = spark.range(n).select(F.col("id"), F.concat(*letters).alias("s"))
    # every 100th string gets a planted typo twin: first char replaced
    twins = (
        base.where(F.col("id") % 100 == 0)
        .select(
            (F.col("id") + n).alias("id"),
            F.concat(F.lit("z"), F.substring("s", 2, 23)).alias("s"),
        )
    )
    base.unionByName(twins).repartition(32).write.mode("overwrite").parquet(PATH)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--q", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from oni_ml_spark.datapipe.fuzzy import _grams, _prep, fuzzy_join
    from oni_ml_spark.session import get_spark

    spark = get_spark("fuzzy-bench")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, dict] = {}
    for size in (args.n, 4 * args.n):
        build(spark, size)
        df = spark.read.parquet(PATH)
        n_rows = df.count()

        # candidate pairs entering the verify (the filter's selectivity):
        # same gram->position-window->count composition fuzzy_join builds
        p = _prep(df, "id", "s", "l")
        q = args.q
        g = _grams(p, "l", q)
        cands = (
            g.select(F.col("l_id").alias("a"), "gram", F.col("pos").alias("pa"))
            .join(
                g.select(F.col("l_id").alias("b"), "gram", F.col("pos").alias("pb")),
                "gram",
            )
            .where((F.col("a") < F.col("b")) & (F.abs(F.col("pa") - F.col("pb")) <= 1))
            .groupBy("a", "b")
            .count()
            .where(F.col("count") >= 24 - q + 1 - q)  # max-len bound, k=1
        )
        n_cand = cands.count()

        wall = None
        n_pairs = None
        for _ in (1, 2):
            spark.catalog.clearCache()
            gc.collect()
            t0 = time.time()
            n_pairs = (
                # guard OFF: this harness deliberately measures the
                # quadratic regime the guard exists to refuse (r8)
                fuzzy_join(df, df, "id", "s", max_edits=1, q=q,
                           max_expansion_per_gram_row=None)
                .where(F.col("id_l") < F.col("id_r"))
                .count()
            )
            wall = round(time.time() - t0, 2)
        all_pairs = n_rows * (n_rows - 1) // 2
        out[str(size)] = {
            "rows": n_rows,
            "wall_s": wall,
            "verified_pairs": n_pairs,
            "candidate_pairs": n_cand,
            "all_pairs": all_pairs,
            "candidate_fraction": round(n_cand / all_pairs, 10),
        }
        print(json.dumps({size: out[str(size)]}), flush=True)
    small, big = out[str(args.n)], out[str(4 * args.n)]
    print(
        "FINAL:"
        + json.dumps(
            {
                **out,
                "wall_ratio_at_4x": round(big["wall_s"] / small["wall_s"], 2),
                "quadratic_would_be": 16.0,
                "q": args.q,
            }
        )
    )


if __name__ == "__main__":
    main()
