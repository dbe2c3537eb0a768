"""Per-group ranking operators sized for skewed 100 TB inputs.

The textbook per-group top-k — a rank window over the group key — shuffles
EVERY row to its group's reducer before any row is discarded; a hot group
(one domain, one language, one template id) becomes a straggler task
holding millions of rows to emit k. The operators here bound what the
shuffle carries:

- ``grouped_topk``: an Arrow-batched local top-k per input batch first, so
  the rank window sees at most k rows per (group, batch) instead of the
  whole input. k=1 dispatches to a pure-codegen min(struct) aggregate —
  one shuffle of one row per group per map partition.
- ``select_canonical``: the keep-the-best-duplicate step after clustering,
  as a single min(struct) aggregate (no window at all).

Null/NaN order semantics match Spark's window ordering exactly — ascending
puts nulls first and NaN last, descending puts NaN first and nulls last —
via an explicit order-class column (0=null, 1=value, 2=NaN) computed
JVM-side. The class column also keeps the Arrow prune exact: the value
column pandas sees is non-null and NaN-free (class != 1 rows carry a typed
zero), so integer order columns stay int64 end to end (no null-induced
float64 coercion losing >2^53 precision) and no pandas NA placement rule
can disagree with Spark's.
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
) -> DataFrame:
    """Top-``k`` rows per group by ``order_col`` with a dense 1..k ``rank``
    column — all input columns preserved.

    ``tie_col`` (required) breaks order ties ascending and must make
    (order_col, tie_col) unique within a group — the same determinism
    contract row_number demands; without it the k-th row is
    partition-order-dependent. ``tie_col`` must be non-null (uniqueness
    leaves room for at most one null per group anyway, and pandas/Spark
    order nulls differently). ``order_col`` must be numeric; nulls and
    NaNs follow Spark's window order (see module docstring).

    Plan shape: one Arrow-batched ``mapInPandas`` keeps each batch's local
    top-k per group under the SAME (class, value, tie) total order the
    final rank uses (top-k over a union equals top-k over per-part top-ks
    under a total order — the ``pq_search`` argument), then the standard
    rank window runs over the pruned candidates. The window's shuffle
    carries at most k rows per (group, batch) — for a hot group in a
    10⁹-row partition that is k rows instead of 10⁹.

    k=1 skips both stages for a pure-codegen ``min(struct(...))``
    aggregate: partial aggregation reduces map-side to one candidate per
    group per partition, and no Python runs at all. The descending k=1
    path negates the clean value exactly for EVERY input — integer types
    widen before negating (bigint in decimal(20,0)), so LONG_MIN ranks
    correctly under ANSI mode instead of overflowing (see ``_neg_exact``).
    """
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    if not groups:
        raise ValueError("group_cols must be non-empty")
    if k <= 0:
        raise ValueError("k must be positive")
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

    cls, clean, dt = _order_class(df, order_col)

    if k == 1:
        # min(struct(class', value', tie, payload)) — struct comparison is
        # lexicographic, so this IS argmin under the ranking order.
        # asc wants (null, value asc, NaN) → class 0/1/2 as-is;
        # desc wants (NaN, value desc, null) → flip the class and negate
        # the clean value (overflow-exact, no double coercion).
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

    in_cols = list(df.columns)
    with_keys = df.withColumn("__gtk_c", cls).withColumn("__gtk_v", clean)
    asc = ascending
    t, g = tie_col, groups

    def local_topk(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf
                continue
            yield (
                pdf.sort_values(
                    ["__gtk_c", "__gtk_v", t],
                    # class/value columns are non-null and NaN-free by
                    # construction, so no pandas NA placement rule applies
                    ascending=[asc, asc, True],
                    kind="mergesort",
                )
                .groupby(g, sort=False, dropna=False)
                .head(k)
            )

    pruned = with_keys.mapInPandas(local_topk, schema=with_keys.schema)
    direction = (lambda c: c.asc()) if asc else (lambda c: c.desc())
    w = Window.partitionBy(*g).orderBy(
        direction(F.col("__gtk_c")), direction(F.col("__gtk_v")), F.col(t).asc()
    )
    return (
        pruned.withColumn(rank_name, F.row_number().over(w))
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
