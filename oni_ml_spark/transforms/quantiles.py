"""Exact discrete quantiles, ECDF, and quantile binning.

Semantics match the reference (utilities/Quantiles.scala:21-99):

- ``ecdf``: for each distinct value x, the fraction of rows with value <= x.
- ``quantile_cuts``: for threshold t, the least x in the data with
  P(X <= x) >= t ("discrete" quantiles, = DuckDB ``quantile_disc``); empty
  input yields +inf cutoffs (Quantiles.scala:70-75).
- ``bin_expr``: index of the first cutoff >= value, -1 when the value
  exceeds every cutoff (Quantiles.scala:97-99).

Scale notes: the ECDF aggregates to distinct values first (shuffle on value,
map-side partial agg), so the window's input is |distinct values|, not |rows|.
The cumulative-sum window is a single global sort — fine for the bounded
cardinalities these cuts are computed over (feature columns); for raw
high-cardinality columns at 100 TB use ``approx_quantile_cuts`` (Greenwald-
Khanna sketch, one pass, no global sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DECILES = [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0]
QUINTILES = [0.2, 0.4, 0.6, 0.8, 1.0]


def ecdf(df: DataFrame, value_col: str, num_buckets: int | None = None) -> DataFrame:
    """Empirical CDF over one column → DataFrame[value double, cdf double].

    Reference: utilities/Quantiles.scala:21-40 (reduceByKey + sortByKey +
    manual per-partition prefix sums). Same two-phase shape, DataFrame-
    native: hash-aggregate to distinct-value counts, split the value domain
    into ~num_buckets ranges, per-bucket running sums via a partitioned
    window, then add per-bucket offsets (a tiny driver-side cumulative of
    bucket subtotals — the same totalCountPerPartition collect the
    reference does, ≤ num_buckets longs).

    Robustness: bucket membership is derived from the DATA (value vs a
    driver-held boundary list), never from a physical partition id — so a
    recomputed/lost partition reproduces the identical bucketing. Earlier
    designs keyed offsets on spark_partition_id() over repartitionByRange,
    which silently corrupts the CDF if the cached layout is evicted and the
    range sampler re-draws different boundaries. Offsets attach via a
    broadcast join, so plan depth is independent of the bucket count.

    No single-partition global window anywhere: the per-bucket window's
    input is |distinct values| / num_buckets, balanced by the approximate
    boundary quantiles, so the exact path scales with distinct-value
    cardinality across the cluster.
    """
    spark = df.sparkSession
    counts = (
        df.select(F.col(value_col).cast("double").alias("value"))
        .where(F.col("value").isNotNull())
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    b = num_buckets or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # cache is a pure optimization here (three jobs read counts); correctness
    # does not depend on residency — see docstring.
    counts = counts.cache()
    boundaries: list[float] = []
    if b > 1:
        probs = [i / b for i in range(1, b)]
        got = counts.approxQuantile("value", probs, 0.25 / b)
        boundaries = sorted(set(got))
    if boundaries:
        arr = F.array(*[F.lit(float(x)) for x in boundaries])
        bucket = F.size(F.filter(arr, lambda c: c < F.col("value")))
    else:
        bucket = F.lit(0)
    bucketed = counts.withColumn("bucket", bucket.cast("int"))

    subtotals = sorted(
        (r["bucket"], r["s"])
        for r in bucketed.groupBy("bucket").agg(F.sum("cnt").alias("s")).collect()
    )
    total = sum(s for _, s in subtotals) or 1
    offsets, acc = [], 0
    for bkt, s in subtotals:
        offsets.append((bkt, acc))
        acc += s
    if not offsets:
        offsets = [(0, 0)]
    offsets_df = spark.createDataFrame(offsets, "bucket int, __offset long")

    w = (
        Window.partitionBy("bucket")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return bucketed.join(F.broadcast(offsets_df), "bucket").select(
        "value",
        ((F.sum("cnt").over(w) + F.col("__offset")) / F.lit(float(total))).alias("cdf"),
    )


def quantile_cuts_df(df: DataFrame, value_col: str, probs: list[float]) -> DataFrame:
    """Cutoffs as a DataFrame[p double, cutoff double] (stays distributed).

    cutoff(p) = min value whose ecdf >= p (Quantiles.scala:54-75).
    The probs side is a tiny literal array — broadcast joined against the
    (already small) distinct-value ECDF.
    """
    probs_df = df.sparkSession.createDataFrame(
        [(float(p),) for p in probs], "p double"
    )
    e = ecdf(df, value_col)
    return (
        e.join(F.broadcast(probs_df), F.col("cdf") >= F.col("p"))
        .groupBy("p")
        .agg(F.min("value").alias("cutoff"))
    )


def quantile_cuts(df: DataFrame, value_col: str, probs: list[float]) -> list[float]:
    """Exact discrete quantile cutoffs, collected to the driver.

    Only the |probs|-sized result crosses the driver boundary (the reference
    collects the same — netflow/FlowWordCreation.scala:26-49). Empty input →
    all +inf, matching Quantiles.scala:70-75.
    """
    rows = quantile_cuts_df(df, value_col, probs).collect()
    by_p = {r["p"]: r["cutoff"] for r in rows}
    return [by_p.get(float(p), float("inf")) for p in probs]


def quantile_cuts_multi(
    df: DataFrame,
    probs_by_col: dict[str, list[float]],
    positive_only: set[str] | frozenset[str] = frozenset(),
    num_buckets: int | None = None,
) -> dict[str, list[float]]:
    """EXACT discrete quantile cutoffs for SEVERAL columns in 3 Spark jobs
    total, instead of 3 jobs per column.

    The reference ran one full-scan quantile job per featurization column
    (five per day for dns, dns/DNSWordCreation.scala:78-122). Here all
    columns melt into one (col, value) frame: one shuffle aggregates
    distinct-value counts for every column, one boundary sketch pass
    balances the per-(col, bucket) windows, one job computes the per-bucket
    prefix sums and the cutoffs.

    ``positive_only`` columns replicate the reference's >0 predicate before
    the quantile (P5, dns/DNSWordCreation.scala:98-101). Semantics per
    column are identical to ``quantile_cuts`` (least x with P(X<=x) >= t;
    empty/all-filtered input → +inf).
    """
    spark = df.sparkSession
    cols = list(probs_by_col)
    b = num_buckets or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    def _val(c: str):
        v = F.col(c).cast("double")
        return F.when(v > 0, v) if c in positive_only else v

    melted = df.select(
        F.explode(
            F.array(*[F.struct(F.lit(c).alias("col"), _val(c).alias("value")) for c in cols])
        ).alias("cv")
    ).select("cv.col", "cv.value").where(F.col("value").isNotNull())
    counts = melted.groupBy("col", "value").agg(F.count(F.lit(1)).alias("cnt")).cache()

    # job 1: one multi-column boundary sketch over the raw frame (balance
    # only — correctness never depends on the boundary values)
    raw = df.select(*[_val(c).alias(c) for c in cols])
    probs_b = [i / b for i in range(1, b)] if b > 1 else []
    bounds = raw.approxQuantile(cols, probs_b, 0.25 / b) if probs_b else [[] for _ in cols]
    bucket_of: dict[str, object] = {}
    for c, bnds in zip(cols, bounds):
        uniq = sorted({x for x in bnds if x == x})  # drop NaN from empty cols
        if uniq:
            arr = F.array(*[F.lit(float(x)) for x in uniq])
            bucket_of[c] = F.size(F.filter(arr, lambda x: x < F.col("value")))
        else:
            bucket_of[c] = F.lit(0)
    bucket = None
    for c in cols:
        bucket = (
            F.when(F.col("col") == c, bucket_of[c])
            if bucket is None
            else bucket.when(F.col("col") == c, bucket_of[c])
        )
    bucketed = counts.withColumn("bucket", bucket.cast("int"))

    # job 2: per-(col, bucket) subtotals — ≤ |cols|·b longs to the driver,
    # the same bounded collect the reference's totalCountPerPartition did
    subtotals: dict[str, list[tuple[int, int]]] = {c: [] for c in cols}
    for r in bucketed.groupBy("col", "bucket").agg(F.sum("cnt").alias("s")).collect():
        subtotals[r["col"]].append((r["bucket"], r["s"]))
    offsets_rows, totals = [], {}
    for c in cols:
        acc = 0
        for bkt, s in sorted(subtotals[c]):
            offsets_rows.append((c, bkt, acc, 0))
            acc += s
        totals[c] = acc or 1
    offsets_rows = [(c, bkt, off, totals[c]) for c, bkt, off, _ in offsets_rows]
    if not offsets_rows:
        offsets_rows = [(cols[0], 0, 0, 1)]
    offsets_df = spark.createDataFrame(
        offsets_rows, "col string, bucket int, __offset long, __total long"
    )

    probs_df = spark.createDataFrame(
        [(c, float(p)) for c in cols for p in probs_by_col[c]], "col string, p double"
    )
    w = (
        Window.partitionBy("col", "bucket")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # job 3: prefix sums + cutoff selection, all columns at once
    cdf = bucketed.join(F.broadcast(offsets_df), ["col", "bucket"]).select(
        "col", "value",
        ((F.sum("cnt").over(w) + F.col("__offset")) / F.col("__total").cast("double")).alias("cdf"),
    )
    cut_rows = (
        cdf.join(F.broadcast(probs_df), (F.col("cdf") >= F.col("p")) & (cdf["col"] == probs_df["col"]))
        .groupBy(probs_df["col"].alias("c"), "p")
        .agg(F.min("value").alias("cutoff"))
        .collect()
    )
    by_cp = {(r["c"], r["p"]): r["cutoff"] for r in cut_rows}
    return {
        c: [by_cp.get((c, float(p)), float("inf")) for p in probs_by_col[c]]
        for c in cols
    }


def approx_quantile_cuts(
    df: DataFrame, value_col: str, probs: list[float], rel_err: float = 0.001
) -> list[float]:
    """Fast path: single-pass approximate quantiles (no global sort).

    At 100 TB this is the right default for high-cardinality columns; the
    exact path exists for oracle parity. Empty input → +inf like the exact
    path.
    """
    got = df.select(F.col(value_col).cast("double").alias("v")).approxQuantile(
        "v", [min(p, 1.0) for p in probs], rel_err
    )
    return got if got else [float("inf")] * len(probs)


def approx_quantile_cuts_multi(
    df: DataFrame, cols: list[str], probs: list[float], rel_err: float = 0.001
) -> dict[str, list[float]]:
    """One-pass approximate quantiles for SEVERAL columns — one Spark action
    total, vs one per column (the reference ran five separate full-scan
    quantile jobs per featurization, dns/DNSWordCreation.scala:78-122)."""
    casted = df.select(*[F.col(c).cast("double").alias(c) for c in cols])
    got = casted.approxQuantile(cols, [min(p, 1.0) for p in probs], rel_err)
    return {
        c: (vals if vals else [float("inf")] * len(probs))
        for c, vals in zip(cols, got)
    }


def bin_expr(value: Column | str, cuts: list[float]) -> Column:
    """Quantile-bin a column against driver-held cutoffs, fully native.

    bin = index of first cutoff >= value = #{cuts strictly < value} for an
    ascending cutoff list; -1 when the value exceeds every cutoff
    (Quantiles.scala:97-99 ``indexWhere``; the -1 edge is reachable only when
    scoring values beyond the training max, SURVEY.md §7.4.3).

    Implemented as a literal-array scan (size(filter(...))) so it inlines
    into whole-stage codegen — no UDF, no join, no lookup table.
    """
    v = F.col(value) if isinstance(value, str) else value
    v = v.cast("double")
    arr = F.array(*[F.lit(float(c)) for c in cuts])
    n_below = F.size(F.filter(arr, lambda c: c < v))
    return F.when(n_below == len(cuts), F.lit(-1)).otherwise(n_below).cast("int")
