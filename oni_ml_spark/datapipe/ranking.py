"""Per-group ranking operators sized for skewed 100 TB inputs.

- ``grouped_topk``: top-k rows per group. k=1 dispatches to a pure-codegen
  min(struct) aggregate — map-side partial aggregation reduces each
  partition to one candidate per group BEFORE the shuffle, measured 2×
  faster than the rank window at 64M rows with a 50%-hot group
  (SCALE.md §ranking). k>1 runs the plain rank window by default —
  measured fastest at every locally testable scale, including 15 GB of
  one group in a single reducer (Spark's external sort spills gracefully)
  — with ``algorithm='salted'`` as the cluster-scale escape: two balanced
  window passes (rank within (group, salt) first, then rank the ≤k·salts
  survivors) whose wall-clock is bounded by balanced work instead of by
  ONE reducer streaming a hot group while the rest of the cluster idles.
- ``select_canonical``: the keep-the-best-duplicate step after
  clustering, as a single min(struct) aggregate (no window at all) — the
  k=1 plan with quality-score ordering.

A previous revision pruned k>1 through an Arrow-batched local top-k; round-7
measurement (scripts/skew_bench.py) showed the Python boundary costs 4× the
straggler it saves at up to 96M rows, so it was removed — the k>1 paths are
now entirely JVM-side, ordering on the RAW column with Spark's native
null/NaN window order. The order-class trick (0=null, 1=value, 2=NaN, with
typed-zero clean values) survives where it is still load-bearing: the k=1
struct aggregate, whose lexicographic min must reproduce that order without
a window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_NUMERIC_DTYPES = (
    "tinyint", "smallint", "int", "bigint", "float", "double",
)


def _order_class(df: DataFrame, order_col: str) -> tuple[Column, Column, str]:
    """(class_expr, clean_value_expr, dtype) for a numeric order column:
    class 0=null, 1=real value, 2=NaN; the clean value is the original
    value inside class 1 and a typed zero elsewhere (non-null, NaN-free,
    same numeric type — ordering within class 0/2 falls to the tie-break,
    exactly as Spark treats all-equal keys)."""
    dt = dict(df.dtypes).get(order_col)
    base = dt.split("(")[0] if dt else dt
    if base not in _NUMERIC_DTYPES and not (dt or "").startswith("decimal"):
        raise ValueError(
            f"order column '{order_col}' has type {dt}; only numeric order "
            "columns are supported (a string column would silently rank "
            "lexicographically in one path and numerically in another)"
        )
    col = F.col(order_col)
    if base in ("float", "double"):
        cls = (
            F.when(col.isNull(), F.lit(0))
            .when(F.isnan(col), F.lit(2))
            .otherwise(F.lit(1))
        )
    else:
        cls = F.when(col.isNull(), F.lit(0)).otherwise(F.lit(1))
    clean = F.when(cls == 1, col).otherwise(F.lit(0).cast(dt))
    return cls, clean, dt


def _neg_exact(clean: Column, dt: str) -> Column:
    """Order-reversing negation of the clean value that is EXACT for every
    input of its type. Native integer negation is undefined at the type's
    MIN value (-LONG_MIN overflows, raising under ANSI mode and silently
    wrapping — i.e. mis-ranking — otherwise), so integer types negate in
    the next-wider exact type: tinyint/smallint/int in bigint,
    bigint in decimal(20,0) (19 digits hold ±2^63 exactly). Float, double
    and decimal negate natively (their ranges are sign-symmetric). Still
    pure codegen — no Python, no double rounding."""
    base = dt.split("(")[0]
    if base in ("tinyint", "smallint", "int"):
        return -clean.cast("long")
    if base == "bigint":
        return -clean.cast("decimal(20,0)")
    return -clean


def grouped_topk(
    df: DataFrame,
    group_cols: list[str] | str,
    order_col: str,
    k: int,
    ascending: bool = False,
    tie_col: str | None = None,
    rank_name: str = "rank",
    algorithm: str = "window",
) -> DataFrame:
    """Top-``k`` rows per group by ``order_col`` with a dense 1..k ``rank``
    column — all input columns preserved.

    ``tie_col`` (required) breaks order ties ascending and must make
    (order_col, tie_col) unique within a group — the same determinism
    contract row_number demands; without it the k-th row is
    partition-order-dependent. ``tie_col`` must be non-null (uniqueness
    leaves room for at most one null per group anyway). ``order_col`` must
    be numeric; nulls and NaNs follow Spark's window order.

    k=1 always takes the pure-codegen ``min(struct(...))`` aggregate:
    partial aggregation reduces map-side to one candidate per group per
    partition, so the shuffle carries |groups|·|partitions| rows and no
    reducer ever holds a hot group — measured 2× the plain window at 64M
    rows / 50%-hot (SCALE.md §ranking). The descending path negates the
    clean value exactly for EVERY input — integer types widen before
    negating (bigint in decimal(20,0)), so LONG_MIN ranks correctly under
    ANSI mode instead of overflowing (see ``_neg_exact``).

    k>1 ``algorithm``:

    - ``'window'`` (default): the plain rank window. Measured fastest at
      every single-node-testable scale — including one group holding 15 GB
      in a single reducer (Spark's UnsafeExternalSorter spills; the
      straggler streams at disk speed while the shuffle itself is the
      dominant cost either way). Benchmarks in scripts/skew_bench.py.
    - ``'salted'``: two balanced window passes — rank within
      (group, input-partition-id salt), keep ≤k per slice (all-JVM, no
      Python), then rank the ≤k·partitions survivors per group. Both
      passes shuffle balanced slices, so wall-clock is bounded by total
      work / cluster cores instead of by ONE reducer ingesting a hot
      group's every row. Use when a single group's bytes exceed what one
      task can sort-and-spill in acceptable time (the 10⁹-row-group
      regime a single node cannot even hold — unreachable in local
      benchmarks, which is WHY the default is the measured winner, not
      this one). Results are bitwise identical: the salt prune keeps a
      superset of the global top-k under the same total order.
    """
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    if not groups:
        raise ValueError("group_cols must be non-empty")
    if k <= 0:
        raise ValueError("k must be positive")
    if algorithm not in ("window", "salted"):
        raise ValueError(f"unknown algorithm '{algorithm}' (window | salted)")
    if tie_col is None:
        raise ValueError(
            "tie_col is required: without a deterministic tie-break the "
            "k-th row depends on partition order"
        )
    for c in [*groups, order_col, tie_col]:
        if c not in df.columns:
            raise ValueError(f"column '{c}' not in input")
    if rank_name in df.columns:
        raise ValueError(f"column '{rank_name}' already exists in the input")

    if k == 1:
        # min(struct(class', value', tie, payload)) — struct comparison is
        # lexicographic, so this IS argmin under the ranking order.
        # asc wants (null, value asc, NaN) → class 0/1/2 as-is;
        # desc wants (NaN, value desc, null) → flip the class and negate
        # the clean value (overflow-exact, no double coercion).
        cls, clean, dt = _order_class(df, order_col)
        payload = list(df.columns)
        c_key = cls if ascending else (F.lit(2) - cls)
        v_key = clean if ascending else _neg_exact(clean, dt)
        best = df.groupBy(*groups).agg(
            F.min(
                F.struct(
                    c_key.alias("__c"), v_key.alias("__v"),
                    F.col(tie_col).alias("__t"),
                    *[F.col(c).alias(f"__p_{i}") for i, c in enumerate(payload)],
                )
            ).alias("__b")
        )
        return best.select(
            *[F.col(f"__b.__p_{i}").alias(c) for i, c in enumerate(payload)],
            F.lit(1).alias(rank_name),
        )

    # validate the order column's type even though the window paths could
    # rank any orderable type — a string column here is overwhelmingly a
    # caller bug (lexicographic "9" > "10"), same contract as k=1
    _order_class(df, order_col)
    in_cols = list(df.columns)
    direction = (lambda c: c.asc()) if ascending else (lambda c: c.desc())
    order = [direction(F.col(order_col)), F.col(tie_col).asc()]
    src = df
    if algorithm == "salted":
        # same collision contract as rank_name: scratch names must not
        # shadow (and then silently swallow) caller columns
        taken = [c for c in ("__gtk_salt", "__gtk_r1") if c in df.columns]
        if taken:
            raise ValueError(
                f"column(s) {taken} already exist in the input — the salted "
                "path uses them as scratch names"
            )
        w1 = Window.partitionBy(*groups, "__gtk_salt").orderBy(*order)
        src = (
            df.withColumn("__gtk_salt", F.spark_partition_id())
            .withColumn("__gtk_r1", F.row_number().over(w1))
            .filter(F.col("__gtk_r1") <= k)
            .drop("__gtk_salt", "__gtk_r1")
        )
    w = Window.partitionBy(*groups).orderBy(*order)
    return (
        src.withColumn(rank_name, F.row_number().over(w))
        .filter(F.col(rank_name) <= k)
        .select(*in_cols, rank_name)
    )


def select_canonical(
    clusters: DataFrame,
    score_col: str,
    cluster_col: str = "cluster",
    id_col: str = "id",
) -> DataFrame:
    """One representative row per cluster: the highest-``score_col`` member,
    ties broken by smallest ``id_col`` — the keep-the-BEST-duplicate step
    that follows near-dup clustering (near_dup_clusters / semantic_dedup
    keep the min-id member, which is deterministic but quality-blind;
    joining quality_metrics scores in and selecting with this keeps the
    cleanest copy of each duplicated document instead).

    Pure-codegen plan: ONE ``min(struct(class, -score, id, payload))``
    aggregate — partial aggregation reduces each map partition to one
    candidate per cluster before the shuffle, and there is no rank window.
    Score order follows Spark's descending window order: NaN ranks above
    every value (class 0), real values by score, null scores last (class
    2, they only win single-member clusters). The class column makes this
    exact for ±infinity scores too — no sentinel value can collide with a
    real score.
    """
    for c in (score_col, cluster_col, id_col):
        if c not in clusters.columns:
            raise ValueError(f"column '{c}' not in input")
    payload = list(clusters.columns)
    cls, clean, dt = _order_class(clusters, score_col)
    best = clusters.groupBy(cluster_col).agg(
        F.min(
            F.struct(
                (F.lit(2) - cls).alias("__c"),
                _neg_exact(clean, dt).alias("__v"),
                F.col(id_col).alias("__t"),
                *[F.col(c).alias(f"__p_{i}") for i, c in enumerate(payload)],
            )
        ).alias("__b")
    )
    return best.select(
        *[F.col(f"__b.__p_{i}").alias(c) for i, c in enumerate(payload)]
    )
