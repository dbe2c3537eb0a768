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

Constant-folding caveat: entries built as UNIONs of literal-tagged
branches prune fully; entries whose tags come from stack() over wide
1-row aggregates (quality_gate) do NOT — their per-part readings are
family floors (the shared scans still run), attribute only large deltas.

Usage: python scripts/part_breakdown.py [--entry dimension_profile]
       [--sf /root/testdata/sf0.1] [--col part]
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
_ap.add_argument("--col", default="part",
                 help="tag column (quality_gate uses 'rule'); prefix "
                      "matching up to the first '|' groups rows like "
                      "'lmq_aucg|web' under one family")
_args = _ap.parse_args()


def main():
    from pyspark.sql import functions as F

    from oni_ml_spark.entry_queries import QUERIES
    from oni_ml_spark.session import get_spark

    spark = get_spark("part-breakdown")
    spark.sparkContext.setLogLevel("ERROR")
    fn = QUERIES[_args.entry]
    df = fn(spark, _args.sf)
    col = _args.col
    if col not in df.columns:
        raise SystemExit(f"entry {_args.entry} has no {col!r} column")
    fam = F.split(F.col(col), r"\|").getItem(0)
    parts = [
        r["p"] for r in df.select(fam.alias("p")).distinct().orderBy("p").collect()
    ]
    out = {}
    for pass_no in (1, 2):
        for p in parts:
            t0 = time.time()
            n = fn(spark, _args.sf).where(fam == p).count()
            out[p] = {"sec": round(time.time() - t0, 3), "rows": n}
            spark.catalog.clearCache()
    t0 = time.time()
    total_rows = fn(spark, _args.sf).count()
    out["__whole_entry"] = {"sec": round(time.time() - t0, 3), "rows": total_rows}
    print("FINAL:" + json.dumps(out))


if __name__ == "__main__":
    main()
