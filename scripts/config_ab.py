#!/usr/bin/env python
"""Interleaved fresh-process A/B over SESSION CONFIG variants (r13).

Same child protocol as scripts/ab_check.py (cold JVM, warm-up, entry run
twice, min = warm floor), but the interleaving axis is a named
SPARK_GRAFT_EXTRA_CONF variant instead of the entry: every round runs
variant1, variant2, ... for each entry back to back, so all variants
sample the same ambient window. Used for the VERDICT r12 item-3/item-5
config adjudications (reducer sizing by bytes; preferSortMergeJoin
scoping).

Usage:
    python scripts/config_ab.py --entries a,b,c --rounds 3 \
        --variant base= \
        --variant pf_false=spark.sql.adaptive.coalescePartitions.parallelismFirst=false
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CHILD_FLAG = "--child-entry"


def child(entry: str, sf_dir: str) -> None:
    import time

    from oni_ml_spark.entry_queries import QUERIES
    from oni_ml_spark.session import get_spark

    spark = get_spark(f"cab_{entry}")
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
    ap.add_argument("--entries", required=True)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--variant", action="append", required=True,
                    help="name=conf;conf (empty conf = session defaults)")
    args = ap.parse_args()

    entries = [e.strip() for e in args.entries.split(",") if e.strip()]
    variants: list[tuple[str, str]] = []
    for v in args.variant:
        name, _, conf = v.partition("=")
        variants.append((name, conf))

    results: dict[tuple[str, str], list[float]] = {}
    here = os.path.abspath(__file__)
    for rnd in range(args.rounds):
        for entry in entries:
            for vname, conf in variants:
                env = dict(os.environ)
                env["SPARK_GRAFT_EXTRA_CONF"] = conf
                p = subprocess.run(
                    [sys.executable, here, _CHILD_FLAG, entry, args.sf],
                    capture_output=True, text=True, env=env,
                )
                warm = None
                for line in p.stdout.splitlines():
                    if line.startswith("ABCHILD "):
                        d = json.loads(line[len("ABCHILD "):])
                        warm = min(d["cold"], d["warm"])
                if warm is None:
                    print(f"CHILD FAIL r{rnd} {entry} {vname}:\n"
                          + p.stderr[-2000:], file=sys.stderr)
                    continue
                results.setdefault((entry, vname), []).append(warm)
                print(json.dumps({"round": rnd, "entry": entry,
                                  "variant": vname, "warm_min": warm}),
                      flush=True)

    print("== summary (median of per-process min-of-2 warm readings) ==")
    for entry in entries:
        base = None
        for vname, _ in variants:
            vals = results.get((entry, vname), [])
            if not vals:
                continue
            med = statistics.median(vals)
            if base is None:
                base = med
            ratio = base / med if med else 0.0
            runs = [round(v, 2) for v in vals]
            print(f"{entry:30s} {vname:12s} med={med:7.3f} "
                  f"vs_first={ratio:5.2f}x  runs={runs}")


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == _CHILD_FLAG:
        child(sys.argv[2], sys.argv[3])
    else:
        main()
