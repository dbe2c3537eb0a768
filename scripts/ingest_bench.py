#!/usr/bin/env python
"""Shuffle-reduction evidence for plans.bloom (anti/semi joins) and
plans.skipping (file-level pruned reads) — the two round-7 incremental-
ingest operators whose reason to exist is avoiding work at scale.

Bloom part: a 20M-row "fact" ingest batch (64-byte payload) anti-joined
against a 5M-key "seen" ledger that is too big to broadcast (so the plain
anti join is a shuffled SMJ carrying every fact row), with a ~1% true-match
fraction — the incremental-dedup shape.  Measures plain ``leftanti`` vs
``bloom_anti_join`` (and the semi variants), validating result counts
match.  The action sums payload length so the shuffle genuinely carries the
payload bytes (a bare count() would let Catalyst prune the payload column
and flatter the plain join).

Skipping part: the same rows written as 64 range-partitioned files sorted
by ``ts`` (each file a tight ts span — the write_zordered layout premise),
then a narrow interval read: full scan + filter vs ``read_pruned`` via a
``build_file_stats`` manifest.  Reports files kept vs total alongside
wall clock — on one warm node the wall gap understates the 100 TB win
(scheduling + footer reads for never-opened files dominate there).

Two passes per plan, second reported (first absorbs codegen); cache
cleared between plans per BASELINE.md's isolation discipline.

Usage: python scripts/ingest_bench.py [--rows 20000000] [--seen 5000000]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FACT = "/tmp/ingest_bench_fact.parquet"
SEEN = "/tmp/ingest_bench_seen.parquet"
EVENTS = "/tmp/ingest_bench_events.parquet"


def build(spark, n_rows: int, n_seen: int, payload_bytes: int) -> None:
    from pyspark.sql import functions as F

    # ~1% of fact keys exist in the seen ledger: fact keys are dense ids
    # scaled by 100; seen holds every 100th slot's key for the first
    # n_seen ids plus (n_seen - overlap) keys outside the fact domain.
    fact = (
        spark.range(n_rows)
        .repartition(32)
        .select(
            (F.col("id") * 100).alias("key"),
            F.concat(F.lit("p" * payload_bytes), F.col("id").cast("string"))
            .alias("payload"),
        )
    )
    fact.write.mode("overwrite").parquet(FACT)
    overlap = n_rows // 100  # 1% of fact rows match
    seen = (
        spark.range(n_seen)
        .repartition(32)
        .select(
            F.when(F.col("id") < overlap, F.col("id") * 10000)  # hits (key % 100 == 0)
            .otherwise(F.col("id") * 100 + 7)  # misses (key % 100 == 7)
            .alias("key")
        )
    )
    seen.write.mode("overwrite").parquet(SEEN)
    # events layout for the skipping part: 64 files, each a tight ts span
    (
        spark.range(n_rows)
        .select(
            F.col("id").alias("ts"),
            (F.col("id") % 997).alias("dim"),
            F.concat(F.lit("e" * payload_bytes), F.col("id").cast("string"))
            .alias("payload"),
        )
        .repartitionByRange(64, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(EVENTS)
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    ap.add_argument("--seen", type=int, default=5_000_000)
    ap.add_argument("--payload-bytes", type=int, default=64)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from oni_ml_spark.plans.bloom import bloom_anti_join, bloom_semi_join, expected_fpp
    from oni_ml_spark.plans.skipping import (
        build_file_stats,
        manifest_selectivity,
        read_pruned,
    )
    from oni_ml_spark.session import get_spark

    spark = get_spark("ingest-bench")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark, args.rows, args.seen, args.payload_bytes)
    fact = spark.read.parquet(FACT)
    seen = spark.read.parquet(SEEN)

    num_bits, num_hashes = 1 << 26, 5  # fpp ~0.003 at 5M keys
    print(json.dumps({
        "rows": args.rows, "seen": args.seen,
        "expected_fpp": round(expected_fpp(args.seen, num_bits, num_hashes), 5),
    }), flush=True)

    def run_agg(df):
        # payload must flow through the join shuffle — see module docstring
        return df.agg(F.sum(F.length("payload"))).collect()[0][0]

    plans = {
        "plain_anti": lambda: run_agg(fact.join(seen, "key", "leftanti")),
        "bloom_anti": lambda: run_agg(
            bloom_anti_join(fact, seen, "key", num_bits, num_hashes)),
        "plain_semi": lambda: run_agg(fact.join(seen, "key", "leftsemi")),
        "bloom_semi": lambda: run_agg(
            bloom_semi_join(fact, seen, "key", num_bits, num_hashes)),
    }
    results: dict[str, float] = {}
    sums: dict[str, int] = {}
    for pass_no in (1, 2):
        for name, thunk in plans.items():
            spark.catalog.clearCache()
            gc.collect()
            t0 = time.time()
            sums[name] = thunk()
            results[name] = round(time.time() - t0, 2)
            print(json.dumps({"pass": pass_no, name: results[name]}), flush=True)
    assert sums["plain_anti"] == sums["bloom_anti"], "anti result mismatch"
    assert sums["plain_semi"] == sums["bloom_semi"], "semi result mismatch"

    # --- skipping part ---
    events = spark.read.parquet(EVENTS)
    manifest = build_file_stats(events, ["ts"]).localCheckpoint(eager=True)
    lo, hi = args.rows // 2, args.rows // 2 + args.rows // 100  # 1% span
    sel = manifest_selectivity(manifest, {"ts": (lo, hi)})
    skip_res: dict[str, float] = {}
    counts: dict[str, int] = {}
    for pass_no in (1, 2):
        for name, thunk in {
            "full_filter": lambda: events.where(
                F.col("ts").between(lo, hi)).agg(
                F.sum(F.length("payload"))).collect()[0][0],
            "read_pruned": lambda: read_pruned(
                spark, EVENTS, manifest, {"ts": (lo, hi)}).agg(
                F.sum(F.length("payload"))).collect()[0][0],
        }.items():
            spark.catalog.clearCache()
            gc.collect()
            t0 = time.time()
            counts[name] = thunk()
            skip_res[name] = round(time.time() - t0, 2)
            print(json.dumps({"pass": pass_no, name: skip_res[name]}), flush=True)
    assert counts["full_filter"] == counts["read_pruned"], "pruned result mismatch"

    print("FINAL:" + json.dumps({
        "rows": args.rows, "seen": args.seen, "payload_bytes": args.payload_bytes,
        **results, **skip_res, "selectivity": sel,
    }))


if __name__ == "__main__":
    main()
