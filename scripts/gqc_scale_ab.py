#!/usr/bin/env python
"""grouped_quantile_cuts sharing A/B at a LARGER scale factor (r13,
VERDICT r12 item 7: "A/B pin-vs-no-pin at sf0.1 *and* a larger SF").

Synthesizes a ~10x lineitem (6M rows) by unioning shifted copies of the
sf0.1 table into /tmp parquet, then times the entry's exact dataflow
(cuts + winsorize clip + winsorize filter + percentile ranks, unioned,
noop-forced) under three sharing strategies for the per-group CDF table:

    none  — parts=None everywhere (r11 shape: 3 independent full-data
            (key, value) shuffles)
    cache — one _cdf_table().cache() fed to all consumers (r13 shape)
    pin   — one _cdf_table().localCheckpoint() (r12 shape)

Each strategy runs twice per process round (min = warm floor),
strategy-interleaved so all sample the same ambient window.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BIG = "/tmp/gqc_big_lineitem.parquet"


def build_big(spark, copies: int = 10) -> None:
    from pyspark.sql import functions as F

    li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet").select(
        "l_returnflag", "l_quantity"
    )
    out = None
    for i in range(copies):
        c = li.withColumn("l_quantity", F.col("l_quantity") + (i % 3))
        out = c if out is None else out.unionByName(c)
    out.write.mode("overwrite").parquet(BIG)


def entry_shape(spark, strategy: str):
    from pyspark.sql import functions as F

    from oni_ml_spark.transforms.quantiles import (
        _cdf_table,
        grouped_quantile_cuts,
        percentile_rank,
        winsorize,
    )

    li = spark.read.parquet(BIG)
    ct = None
    if strategy != "none":
        ct = _cdf_table(
            li.select(
                F.col("l_returnflag").alias("key"), F.col("l_quantity").alias("value")
            ),
            "value", ["key"],
        )
        ct = ct.cache() if strategy == "cache" else ct.localCheckpoint()
    cuts = grouped_quantile_cuts(
        li, "l_returnflag", "l_quantity", [0.25, 0.5, 0.75, 1.0], parts=ct
    ).select(F.lit("cuts").alias("part"), "key", "p", F.col("cutoff").alias("v"))
    q = li.select("l_returnflag", "l_quantity")

    def agg_rows(df, part, val_col):
        return (
            df.groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).cast("double").alias("p"),
                 F.sum(val_col).cast("double").alias("v"))
            .select(F.lit(part).alias("part"),
                    F.col("l_returnflag").alias("key"), "p", "v")
        )

    winsor = agg_rows(
        winsorize(q, "l_quantity", 0.05, 0.95, group_col="l_returnflag",
                  out_col="cv", cuts_parts=ct), "winsor", "cv")
    winsf = agg_rows(
        winsorize(q, "l_quantity", 0.05, 0.95, group_col="l_returnflag",
                  mode="filter", cuts_parts=ct), "winsorf", "l_quantity")
    pr = percentile_rank(q, "l_quantity", group_col="l_returnflag", out_col="pct")
    prank = agg_rows(pr.withColumn("qr", F.floor(F.col("pct") * 1000000)),
                     "prank", "qr")
    return cuts.unionByName(winsor).unionByName(winsf).unionByName(prank)


def main() -> None:
    from oni_ml_spark.session import get_spark

    spark = get_spark("gqc_scale_ab")
    if not os.path.exists(BIG + "/_SUCCESS"):
        build_big(spark)
    spark.read.parquet(BIG).limit(1).count()
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    res: dict[str, list[float]] = {}
    for _ in range(rounds):
        for strat in ("none", "cache", "pin"):
            best = None
            for _run in range(2):
                t0 = time.perf_counter()
                entry_shape(spark, strat).write.format("noop").mode(
                    "overwrite").save()
                el = time.perf_counter() - t0
                best = el if best is None else min(best, el)
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
            res.setdefault(strat, []).append(round(best, 3))
            print(f"{strat}: {best:.3f}", flush=True)
    print("SUMMARY", {k: v for k, v in res.items()})


if __name__ == "__main__":
    main()
