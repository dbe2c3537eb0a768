"""Scale evidence for the CDC/SCD2 ring (r7 verdict item 4): bench
apply_changelog and scd2_history in BOTH regimes at 1x and 5x.

Regimes (the two real shapes of the operator):
- daily:  snapshot >> changelog — the incremental-refresh case a 100 TB
  state table sees every day (4M-row snapshot, ~40k-change log at 1x:
  n_log/2 distinct inserts + up-to-n_log/2 key-deduped updates);
- replay: changelog >> snapshot — the rebuild-from-log case (40k-row
  base; the log's update half dedups to <= n_snap keys, so the replay
  log is ~2M inserts + 40k updates at 1x).

Both operators' plan contracts say cost should track the CHANGELOG for
`daily` (the snapshot contributes one column-pruned anti-join probe) and
stay near-linear in the log for `replay` (one max_by aggregate / one
lead window partitioned by key). The 5x/1x time ratio printed against the
5x row ratio is the check; isolation (clearCache + GC) between runs per
the skew_bench lesson.

Usage: python scripts/cdc_bench.py [--scale N] (from /root/repo)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_ap = argparse.ArgumentParser()
_ap.add_argument("--scale", type=int, default=5)
_ap.add_argument("--base-snap", type=int, default=4_000_000)
_ap.add_argument("--base-log", type=int, default=40_000)
_args = _ap.parse_args()


def frames(spark, n_snap: int, n_log: int):
    """Synthetic snapshot + changelog with realistic key overlap: half the
    changes hit existing keys (updates/deletes), half insert new ones;
    seqs are unique per key by construction (seq = key + shift)."""
    from pyspark.sql import functions as F

    snap = spark.range(n_snap).select(
        F.col("id").alias("k"),
        F.md5(F.col("id").cast("string")).alias("payload"),
        (F.col("id") % 1000).cast("double").alias("score"),
    )
    half = n_log // 2
    # EVERY column of an update row derives from k, so the dropDuplicates
    # survivor is value-identical whichever physical row wins — the benched
    # row counts are deterministic (review finding: op derived from the raw
    # id made the surviving op partition-order-dependent)
    k = F.col("id") * 7 % n_snap
    upd = spark.range(half).select(
        k.alias("k"),
        F.lit("updated").alias("payload"),
        F.lit(1.0).alias("score"),
        F.when(k % 5 == 0, "delete").otherwise("upsert").alias("op"),
        # unique (k, seq): derive seq from the key itself + a distinct band
        (k * 4 + 1).alias("seq"),
    ).dropDuplicates(["k"])
    ins = spark.range(half).select(
        (F.col("id") + n_snap * 10).alias("k"),
        F.lit("inserted").alias("payload"),
        F.lit(2.0).alias("score"),
        F.lit("upsert").alias("op"),
        ((F.col("id") + n_snap * 10) * 4 + 2).alias("seq"),
    )
    return snap, upd.unionByName(ins)


def run_regime(spark, label: str, n_snap: int, n_log: int) -> dict:
    from oni_ml_spark.datapipe.snapshots import apply_changelog, scd2_history

    snap, log = frames(spark, n_snap, n_log)
    out = {}
    t0 = time.time()
    n1 = apply_changelog(snap, log, "k").count()
    out["apply_changelog"] = {"sec": round(time.time() - t0, 2), "rows": n1}
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    t0 = time.time()
    # scd2 always seeded with the snapshot — the full production shape:
    # the window carries snapshot+log rows, which is exactly the cost
    # being measured in BOTH regimes
    n2 = scd2_history(log, "k", initial=snap, initial_seq=0).count()
    out["scd2_history"] = {"sec": round(time.time() - t0, 2), "rows": n2}
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    print(json.dumps({label: out}), flush=True)
    return out


def main():
    from oni_ml_spark.session import get_spark

    spark = get_spark("cdc-bench")
    spark.sparkContext.setLogLevel("ERROR")
    s = _args.scale
    results = {}
    # pass 1 warms the JVM; pass 2 is the reading (ab_check two-regime lesson)
    for pass_no in (1, 2):
        for label, n_snap, n_log in (
            ("daily_1x", _args.base_snap, _args.base_log),
            (f"daily_{s}x", _args.base_snap * s, _args.base_log * s),
            ("replay_1x", _args.base_log, _args.base_snap),
            (f"replay_{s}x", _args.base_log * s, _args.base_snap * s),
        ):
            results[label] = run_regime(spark, f"pass{pass_no}:{label}", n_snap, n_log)
    for op in ("apply_changelog", "scd2_history"):
        for reg in ("daily", "replay"):
            r = results[f"{reg}_{s}x"][op]["sec"] / max(
                results[f"{reg}_1x"][op]["sec"], 1e-9
            )
            print(f"RATIO {op} {reg}: {r:.2f}x time at {s}x rows", flush=True)
    print("FINAL:" + json.dumps(results))


if __name__ == "__main__":
    main()
