"""Scale evidence for the round-8 drift + PII operators: time each at
sf0.1 and at a derived 25x corpus and report time-ratio vs the 25x
row-ratio (both are map-only scans or bounded aggregates — expect
strongly sub-linear wall-clock growth on local[32], where the 1x reading
is dominated by fixed job overhead).

Scaled inputs are DERIVED from the driver-generated sf0.1 tables:
- events: 25 copies with shifted event_id/user_id (the drift split and
  the null/relabel injections key on those ids, so every copy exercises
  the same bin/category structure);
- documents: 25 copies with shifted doc_id (PII planting keys on doc_id;
  scrubbing is content-independent map work, so repeated text does not
  flatter the measurement).

Usage: python scripts/drift_pii_bench.py [--copies N]   (~3-5 min)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_ap = argparse.ArgumentParser()
_ap.add_argument("--copies", type=int, default=25)
_args = _ap.parse_args()

COPIES = _args.copies
BASE = "/root/testdata/sf0.1"
SCALED = f"/tmp/driftpii_{COPIES}x_sf01"


def build_scaled(spark):
    from pyspark.sql import functions as F

    for table, idcols in (
        ("events", ["event_id", "user_id"]),
        ("documents", ["doc_id"]),
        ("embeddings", ["vec_id"]),
    ):
        src = spark.read.parquet(f"{BASE}/{table}.parquet")
        parts = []
        for c in range(COPIES):
            d = src
            for col in idcols:
                d = d.withColumn(col, F.col(col) + F.lit(c * 10_000_000))
            parts.append(d)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{SCALED}/{table}.parquet")


def main():
    from pyspark.sql import functions as F

    from oni_ml_spark.datapipe.drift import (
        drift_compare,
        drift_compare_categorical,
        drift_compare_grouped,
    )
    from oni_ml_spark.datapipe.textstats import pii_counts, scrub_pii
    from oni_ml_spark.session import get_spark

    spark = get_spark("drift-pii-bench")
    spark.sparkContext.setLogLevel("ERROR")
    build_scaled(spark)

    def drift_numeric(sfdir):
        e = spark.read.parquet(f"{sfdir}/events.parquet")
        ref = e.filter((F.col("user_id") % 2) == 0).select("value")
        cur = e.filter((F.col("user_id") % 2) == 1).select(
            F.when((F.col("event_id") % 97) == 0, F.lit(None).cast("double"))
            .otherwise(F.col("value") * 1.35).alias("value")
        )
        return drift_compare(ref, cur, "value", edges=[5.0, 15.0, 35.0, 70.0, 150.0])

    def drift_cat(sfdir):
        e = spark.read.parquet(f"{sfdir}/events.parquet")
        return drift_compare_categorical(
            e.filter((F.col("user_id") % 2) == 0).select("event_type"),
            e.filter((F.col("user_id") % 2) == 1).select("event_type"),
            "event_type",
            top_k=3,
        )

    def pii_scrub_audit(sfdir):
        d = spark.read.parquet(f"{sfdir}/documents.parquet")
        planted = d.select(
            "doc_id",
            F.concat(
                F.col("text"), F.lit(" user"), F.col("doc_id").cast("string"),
                F.lit("@ex.org from 10.0.0.1 ssn 123-45-6789"),
            ).alias("pt"),
        )
        # scrub then re-audit: two chained map-only regex projections + one
        # bounded aggregate (the quality_gate residual shape)
        return pii_counts(scrub_pii(planted, "pt"), "doc_id", "pt").agg(
            F.sum("pii_total").alias("residual")
        )

    def drift_grouped(sfdir):
        e = spark.read.parquet(f"{sfdir}/events.parquet")
        return drift_compare_grouped(
            e.filter((F.col("user_id") % 2) == 0),
            e.filter((F.col("user_id") % 2) == 1),
            "event_type",
            "value",
            edges=[5.0, 15.0, 35.0, 70.0, 150.0],
        )

    def emb_centroid(sfdir):
        from oni_ml_spark.datapipe.drift import centroid_shift

        emb = spark.read.parquet(f"{sfdir}/embeddings.parquet")
        return centroid_shift(
            emb.filter((F.col("vec_id") % 2) == 0),
            emb.filter((F.col("vec_id") % 2) == 1),
            "embedding",
            dim=64,
        )

    def summary_mixed(sfdir):
        # the r9 single-pass summary: 3 numeric + 1 categorical columns,
        # frozen edges -> exactly one scan per corpus regardless of the
        # column count (the r8 per-column composition planned 10 scans)
        from oni_ml_spark.datapipe.drift import drift_summary

        e = spark.read.parquet(f"{sfdir}/events.parquet")
        return drift_summary(
            e.filter((F.col("user_id") % 2) == 0),
            e.filter((F.col("user_id") % 2) == 1),
            ["value", "event_id", "user_id"],
            categorical_cols=["event_type"],
            top_k=100,
            edges={
                "value": [5.0, 15.0, 35.0, 70.0, 150.0],
                "event_id": [10_000.0, 30_000.0, 60_000.0],
                "user_id": [100.0, 400.0, 800.0],
            },
        )

    def contracts_suite(sfdir):
        # r9: eight contract rules in ONE aggregate over ONE scan (the
        # two exact count_distincts add an Expand, never a second scan)
        from oni_ml_spark.datapipe.contracts import (
            expect_distinct_count,
            expect_in_set,
            expect_not_null,
            expect_null_rate,
            expect_range,
            expect_regex,
            expect_row_count,
            expect_unique,
            run_expectations,
        )

        e = spark.read.parquet(f"{sfdir}/events.parquet")
        return run_expectations(e, [
            expect_row_count(min_rows=1),
            expect_not_null("event_type"),
            expect_unique("event_id"),
            expect_range("value", lo=0.0, hi=100.0),
            expect_in_set("event_type", ["click", "view", "purchase", "signup"]),
            expect_null_rate("props", max_rate=0.5),
            expect_regex("event_type", "^[a-z]+$", min_rate=0.9),
            expect_distinct_count("event_type", lo=1, hi=10),
        ])

    ops = {
        "drift_numeric": drift_numeric,
        "drift_categorical": drift_cat,
        "drift_grouped": drift_grouped,
        "drift_summary_mixed": summary_mixed,
        "embedding_centroid_shift": emb_centroid,
        "pii_scrub_audit": pii_scrub_audit,
        "contracts_suite": contracts_suite,
    }
    # r9 reservoir sink: per-batch cost of folding a micro-batch into the
    # k-row state (one TakeOrderedAndProject + 2k-row merge + commit) —
    # measured separately because write_batch is an action, not a frame
    import shutil
    import tempfile

    from oni_ml_spark.streaming.sample_stream import sample_writer

    res = {}
    for pass_no in (1, 2):
        for label, sfdir in (("sf0.1", BASE), (f"{COPIES}x", SCALED)):
            root = tempfile.mkdtemp(prefix="resv_")
            shutil.rmtree(root, ignore_errors=True)
            batch = spark.read.parquet(f"{sfdir}/events.parquet")
            w = sample_writer(root, "event_id", 10_000)
            t0 = time.time()
            w(batch, 0)
            w(batch.withColumn("event_id", F.col("event_id") + 500_000_000), 1)
            res[label] = round(time.time() - t0, 2)
            shutil.rmtree(root, ignore_errors=True)
            spark.catalog.clearCache()
    res["time_ratio"] = round(res[f"{COPIES}x"] / res["sf0.1"], 2)
    print(json.dumps({"reservoir_two_batches": res}), flush=True)

    rows = {"reservoir_two_batches": res}
    for pass_no in (1, 2):  # report pass 2; pass 1 absorbs session warm-up
        for name, fn in ops.items():
            timings = {}
            for label, sfdir in (("sf0.1", BASE), (f"{COPIES}x", SCALED)):
                t0 = time.time()
                n = fn(sfdir).count()
                timings[label] = {"sec": round(time.time() - t0, 2), "rows": n}
                spark.catalog.clearCache()
            timings["time_ratio"] = round(
                timings[f"{COPIES}x"]["sec"] / timings["sf0.1"]["sec"], 2
            )
            rows[name] = timings
            print(json.dumps({"pass": pass_no, name: timings}), flush=True)
    print("FINAL:" + json.dumps(rows))


if __name__ == "__main__":
    main()
