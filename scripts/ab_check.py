#!/usr/bin/env python
"""Interleaved fresh-process A/B timing for individual battery entries —
the ONLY protocol BASELINE.md accepts for cross-round per-query claims
(single battery totals swing ±50% with ambient load; see the variance
caveat there).

Usage:
    python scripts/ab_check.py ENTRY [ENTRY ...] [--rounds 3] [--sf DIR]

Each round spawns one fresh Python process per entry (cold JVM, same
session config as bench.py), interleaved in the given order so every entry
samples the same ambient window. The child warms the session, then runs
the entry twice — the first reading carries per-entry plan/codegen
compilation, the second is the warm floor — and both are reported.
Output: one JSON line per (round, entry) plus a summary block.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CHILD_FLAG = "--child-entry"


def child(entry: str, sf_dir: str) -> None:
    import time

    from oni_ml_spark.entry_queries import QUERIES
    from oni_ml_spark.session import get_spark

    spark = get_spark(f"ab_{entry}")
    spark.range(1000).count()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).count()
    out = {}
    for label in ("cold", "warm"):
        t0 = time.perf_counter()
        QUERIES[entry](spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[label] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    print("ABCHILD " + json.dumps(out), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("entries", nargs="+")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    results: dict[str, list[dict]] = {e: [] for e in args.entries}
    for rnd in range(args.rounds):
        for entry in args.entries:
            proc = subprocess.run(
                [sys.executable, __file__, _CHILD_FLAG, entry, "--sf", args.sf],
                capture_output=True, text=True, cwd=os.path.dirname(
                    os.path.dirname(os.path.abspath(__file__))),
            )
            line = next(
                (ln for ln in proc.stdout.splitlines()
                 if ln.startswith("ABCHILD ")), None)
            if proc.returncode != 0 or line is None:
                print(f"FAIL round={rnd} entry={entry}\n{proc.stderr[-2000:]}",
                      file=sys.stderr)
                continue
            timing = json.loads(line[len("ABCHILD "):])
            timing["round"] = rnd
            results[entry].append(timing)
            print(json.dumps({"entry": entry, **timing}), flush=True)
    summary = {
        e: {
            "cold": [t["cold"] for t in ts],
            "warm": [t["warm"] for t in ts],
        }
        for e, ts in results.items()
    }
    print(json.dumps({"summary": summary, "sf": args.sf}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == _CHILD_FLAG:
        ap = argparse.ArgumentParser()
        ap.add_argument(_CHILD_FLAG, dest="entry")
        ap.add_argument("--sf", required=True)
        a = ap.parse_args()
        child(a.entry, a.sf)
    else:
        main()
