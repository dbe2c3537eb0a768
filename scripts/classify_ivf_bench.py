"""Scale evidence for the round-9 classifier / IVF-append / compaction
surfaces: time each at sf0.1 and at a derived N-x input and report the
time ratio vs the N-x row ratio.

- classifier_score: hashed_linear_score over documents (explode →
  broadcast model join → per-doc sum, folded to a 1-row report
  aggregate) — map-side-combinable scan work, expect sub-linear.
- ivf_assign_delta: assign_cells of a delta against a FROZEN 64-cell
  centroid table (the O(delta) claim of ivf_append — the index itself is
  never scanned during assignment).
- compaction_plan_100k: driver-side bin-packing over a synthetic
  100k-file manifest (the 100 TB listing size at 1 GiB files) — pure
  planning cost, no FS.
- compact_execute: real journaled compaction of a fragmented on-disk
  dataset (64 fragments -> target bins), wall clock for plan + stage +
  swap.

Usage: python scripts/classify_ivf_bench.py [--copies N]   (~3-4 min)
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_ap = argparse.ArgumentParser()
_ap.add_argument("--copies", type=int, default=25)
_args = _ap.parse_args()

COPIES = _args.copies
BASE = "/root/testdata/sf0.1"
SCALED = f"/tmp/classifyivf_{COPIES}x_sf01"


def build_scaled(spark, n_copies: int, dest: str):
    """Derive an n_copies-x corpus through the SAME Spark writer for BOTH
    sides of the comparison — the driver-generated sf0.1 tables are single
    parquet files (one scan task), so timing them directly against a
    multi-file derived corpus would compare serial vs parallel layouts,
    not row scaling."""
    from pyspark.sql import functions as F

    for table, idcol in (("documents", "doc_id"), ("embeddings", "vec_id")):
        src = spark.read.parquet(f"{BASE}/{table}.parquet")
        parts = [
            src.withColumn(idcol, F.col(idcol) + F.lit(c * 10_000_000))
            for c in range(n_copies)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(
            f"{dest}/{table}.parquet"
        )


def main():
    from pyspark.sql import functions as F

    from oni_ml_spark.datapipe.classify import hashed_linear_score
    from oni_ml_spark.datapipe.similarity import (
        _prep_members,
        assign_cells,
        build_ivf_index,
    )
    from oni_ml_spark.plans.compaction import compact_dataset, compaction_plan
    from oni_ml_spark.session import get_spark

    spark = get_spark("classify-ivf-bench")
    spark.sparkContext.setLogLevel("ERROR")
    base1 = f"{SCALED}_base1"
    build_scaled(spark, 1, base1)
    build_scaled(spark, COPIES, SCALED)

    from oni_ml_spark.datapipe.classify import demo_weights

    weights = demo_weights(spark, 4096).localCheckpoint()

    def classifier_score(sfdir):
        d = spark.read.parquet(f"{sfdir}/documents.parquet")
        return hashed_linear_score(d, "doc_id", "text", weights, 4096).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("score_micro").alias("mass"),
            F.sum((F.col("score_micro") < 0).cast("long")).alias("flagged"),
        )

    # frozen centroids fitted ONCE on the 1x corpus — both deltas assign
    # against the same model table, so the timing isolates the delta cost
    cent, _ = build_ivf_index(
        spark.read.parquet(f"{BASE}/embeddings.parquet"), n_cells=64, seed=7
    )
    cent = cent.localCheckpoint()

    def ivf_assign_delta(sfdir):
        emb = spark.read.parquet(f"{sfdir}/embeddings.parquet")
        return assign_cells(cent, _prep_members(emb, "vec_id", "embedding")).agg(
            F.count(F.lit(1)).alias("n"), F.count_distinct("cell").alias("cells")
        )

    def auc_score(sfdir):
        from oni_ml_spark.datapipe.classify import binary_auc

        d = spark.read.parquet(f"{sfdir}/documents.parquet")
        scored = hashed_linear_score(d, "doc_id", "text", weights, 4096)\
            .withColumn("label", (F.col("id") % 2).cast("int"))
        return binary_auc(scored, "label", "score_micro")

    def line_filter_clean(sfdir):
        from oni_ml_spark.datapipe.textstats import line_filter

        d = spark.read.parquet(f"{sfdir}/documents.parquet")
        planted = d.select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.lit("\nThis line mentions javascript and dies."),
                F.lit("\nA keeper line with plenty of words, terminated."),
            ).alias("text"),
        )
        return line_filter(planted, "doc_id", "text", dedup_lines=True).agg(
            F.sum("n_lines").alias("lines"), F.sum("n_kept").alias("kept")
        )

    def dmatch(sfdir):
        from oni_ml_spark.datapipe.sampling import match_distribution

        d = spark.read.parquet(f"{sfdir}/documents.parquet")
        kept, _ = match_distribution(
            d.filter(F.col("doc_id") % 3 != 0),
            d.filter(F.col("doc_id") % 3 == 0),
            "doc_id", "n_chars", [150.0, 300.0, 450.0],
        )
        return kept.agg(
            F.count(F.lit(1)).alias("n"), F.sum("doc_id").alias("id_sum")
        )

    def multiclass_route(sfdir):
        from oni_ml_spark.datapipe.classify import hashed_linear_argmax

        classes = ["de", "en", "es"]
        w3 = (
            spark.range(0, 4096, 2)
            .crossJoin(spark.createDataFrame([(c,) for c in classes], "cls string"))
            .select(
                F.col("id").alias("bucket"), "cls",
                (F.xxhash64("cls", "id") % 2001 - 1000).alias("w_micro"),
            )
        )
        d = spark.read.parquet(f"{sfdir}/documents.parquet")
        return hashed_linear_argmax(
            d, "doc_id", "text", w3, 4096, classes
        ).groupBy("label").agg(F.count(F.lit(1)).alias("n"))

    results = {}
    for name, fn in (("classifier_score", classifier_score),
                     ("ivf_assign_delta", ivf_assign_delta),
                     ("auc_score", auc_score),
                     ("line_filter_clean", line_filter_clean),
                     ("dmatch", dmatch),
                     ("multiclass_route", multiclass_route)):
        # interleaved floor protocol: alternate 1x/25x passes and take the
        # min of 5 per side — single readings on this host swing 3-5x
        # outside the ±30% ambient band at 1-10 s job sizes; interleaving
        # makes drift hit both sides and the FLOOR is the number the scale
        # claim is about (the work the plan actually schedules)
        sides = [(base1, "1x"), (SCALED, f"{COPIES}x")]
        best: dict = {}
        for sfdir, tag in sides:
            fn(sfdir).collect()  # warm code paths
        for _ in range(5):
            for sfdir, tag in sides:
                t0 = time.monotonic()
                rows = fn(sfdir).collect()
                dt = time.monotonic() - t0
                if tag not in best or dt < best[tag][0]:
                    best[tag] = (dt, rows)
        for _, tag in sides:
            results[f"{name}_{tag}"] = round(best[tag][0], 2)
            results[f"{name}_{tag}_rows"] = [list(r) for r in best[tag][1]]
        results[f"{name}_ratio"] = round(
            results[f"{name}_{COPIES}x"] / results[f"{name}_1x"], 2
        )

    # planning cost over a 100 TB-shaped manifest: 100k files, 400 dirs
    rng = random.Random(7)
    manifest = [
        {
            "file": f"day={i % 400}/part-{i:06d}.parquet",
            "bytes": rng.randint(1 << 20, 2 << 30),
            "dir": f"day={i % 400}",
        }
        for i in range(100_000)
    ]
    t0 = time.monotonic()
    plan = compaction_plan(manifest, target_bytes=1 << 30)
    results["compaction_plan_100k_sec"] = round(time.monotonic() - t0, 2)
    results["compaction_plan_100k"] = plan.summary()

    # real execution: 64-fragment dataset -> bins
    frag = f"/tmp/classifyivf_frag_{COPIES}"
    df = spark.read.parquet(f"{BASE}/documents.parquet")
    for i in range(16):
        df.filter((F.col("doc_id") % 16) == i).write.mode(
            "append" if i else "overwrite"
        ).parquet(frag)
    t0 = time.monotonic()
    res = compact_dataset(spark, frag, target_bytes=1 << 26)
    results["compact_execute_sec"] = round(time.monotonic() - t0, 2)
    results["compact_execute"] = res

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
