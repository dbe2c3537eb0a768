"""Per-part timing breakdown for multi-part battery entries (r8 verdict
item 7: dimension_profile carries 13 parts — when its battery reading
moves, attribute the move to a PART, not the whole entry).

How it works without duplicating entry code: every multi-part entry is a
UNION of branches each tagged with a literal part column, so
``entry_df.where(part == X)`` constant-folds every other branch to an
empty LocalRelation — the timed job executes ONLY the selected part's
subtree. (Verified: the filtered plan for one part contains one pair of
corpus scans, not 13.)

Readings are pass-2 warm-floor numbers (pass 1 absorbs codegen/session
warm-up); compare them with each other, not with battery numbers (which
carry session-context inflation — see BASELINE.md).

Usage: python scripts/part_breakdown.py [--entry dimension_profile]
       [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_ap = argparse.ArgumentParser()
_ap.add_argument("--entry", default="dimension_profile")
_ap.add_argument("--sf", default="/root/testdata/sf0.1")
_args = _ap.parse_args()


def main():
    from pyspark.sql import functions as F

    from oni_ml_spark.entry_queries import QUERIES
    from oni_ml_spark.session import get_spark

    spark = get_spark("part-breakdown")
    spark.sparkContext.setLogLevel("ERROR")
    fn = QUERIES[_args.entry]
    df = fn(spark, _args.sf)
    if "part" not in df.columns:
        raise SystemExit(f"entry {_args.entry} has no 'part' column")
    parts = [r["part"] for r in df.select("part").distinct().orderBy("part").collect()]
    out = {}
    for pass_no in (1, 2):
        for p in parts:
            t0 = time.time()
            n = fn(spark, _args.sf).where(F.col("part") == p).count()
            out[p] = {"sec": round(time.time() - t0, 3), "rows": n}
            spark.catalog.clearCache()
    t0 = time.time()
    total_rows = fn(spark, _args.sf).count()
    out["__whole_entry"] = {"sec": round(time.time() - t0, 3), "rows": total_rows}
    print("FINAL:" + json.dumps(out))


if __name__ == "__main__":
    main()
