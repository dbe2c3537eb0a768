#!/usr/bin/env python
"""Capture .explain("formatted") for every battery entry into plans/r12/.

Usage:
    python scripts/dump_plans.py [--suffix before] [--sf /root/testdata/sf0.001]
        [--only a,b,c]

Plans are captured at sf0.001 (pre-AQE plan shape is size-independent;
PLANS.md uses the same convention).  Entries that fit models or
localCheckpoint during construction execute that work eagerly — cheap at
sf0.001 — and their checkpointed inputs appear as scan leaves.
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def explain_formatted(df) -> str:
    sc = df.sparkSession.sparkContext
    jmode = sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(jmode)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--only", default="")
    ap.add_argument("--outdir", default=None)
    args = ap.parse_args()

    from oni_ml_spark.entry_queries import QUERIES
    from oni_ml_spark.session import get_spark

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = args.outdir or os.path.join(repo, "plans", "r12")
    os.makedirs(outdir, exist_ok=True)

    names = sorted(QUERIES)
    if args.only:
        wanted = {n.strip() for n in args.only.split(",") if n.strip()}
        names = [n for n in names if n in wanted]

    spark = get_spark("dump_plans")
    for name in names:
        path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        try:
            df = QUERIES[name](spark, args.sf)
            text = explain_formatted(df)
        except Exception:  # noqa: BLE001 — record the failure, keep dumping
            text = "PLAN CAPTURE FAILED\n" + traceback.format_exc()
        with open(path, "w") as fh:
            fh.write(f"== {name} ({args.suffix}, sf={args.sf}) ==\n\n")
            fh.write(text)
        print(f"{name}: {len(text)} chars -> {path}")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
