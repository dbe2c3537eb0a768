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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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
    order nulls differently). ``order_col`` nulls follow Spark's window
    order: FIRST under ascending, LAST under descending — the local
    pruning matches via na_position. The k=1 fast path negates
    ``order_col``, so it requires a numeric order column; the general path
    orders any comparable type. (The descending k=1 negation can overflow
    on LONG_MIN order values under ANSI mode — integer order columns that
    can contain the extreme sentinel should cast to double first.)

    Plan shape: one Arrow-batched ``mapInPandas`` keeps each batch's local
    top-k per group under the SAME (order, tie) total order the final rank
    uses (top-k over a union equals top-k over per-part top-ks under a
    total order — the ``pq_search`` argument), then the standard rank
    window runs over the pruned candidates. The window's shuffle carries
    at most k rows per (group, batch) — for a hot group in a 10⁹-row
    partition that is k rows instead of 10⁹.

    k=1 skips both stages for a pure-codegen ``min(struct(...))``
    aggregate: partial aggregation reduces map-side to one candidate per
    group per partition, and no Python runs at all.
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

    if k == 1:
        # min(struct(sort_key, tie, payload)) — struct comparison is
        # lexicographic, so this IS argmin under (order, tie). Null order
        # values map to ∓infinity sentinels to reproduce the window's null
        # order (asc → nulls first, desc → nulls last); a null FIELD would
        # otherwise sort first in struct comparison on BOTH directions.
        if ascending:
            key = F.coalesce(F.col(order_col), F.lit(float("-inf")))
        else:
            key = F.when(
                F.col(order_col).isNull(), F.lit(float("inf"))
            ).otherwise(-F.col(order_col))
        payload = [c for c in df.columns]
        best = df.groupBy(*groups).agg(
            F.min(F.struct(key.alias("__k"), F.col(tie_col).alias("__t"),
                           *[F.col(c).alias(f"__p_{i}") for i, c in enumerate(payload)])
                  ).alias("__b")
        )
        return best.select(
            *[F.col(f"__b.__p_{i}").alias(c) for i, c in enumerate(payload)],
            F.lit(1).alias(rank_name),
        )

    import pandas as pd  # noqa: F401 (imported for the UDF closure)

    asc = ascending
    o, t, g = order_col, tie_col, groups

    def local_topk(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf
                continue
            yield (
                pdf.sort_values(
                    [o, t],
                    ascending=[asc, True],
                    kind="mergesort",
                    # match Spark's window null order for the order col:
                    # asc → NULLS FIRST, desc → NULLS LAST (tie col is
                    # non-null by contract, so the global flag is safe)
                    na_position="first" if asc else "last",
                )
                .groupby(g, sort=False, dropna=False)
                .head(k)
            )

    pruned = df.mapInPandas(local_topk, schema=df.schema)
    order_exprs = [
        F.col(o).asc() if asc else F.col(o).desc(),
        F.col(t).asc(),
    ]
    w = Window.partitionBy(*g).orderBy(*order_exprs)
    return (
        pruned.withColumn(rank_name, F.row_number().over(w))
        .filter(F.col(rank_name) <= k)
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

    Pure-codegen plan: ONE ``min(struct(-score, id, payload))`` aggregate —
    partial aggregation reduces each map partition to one candidate per
    cluster before the shuffle, and there is no rank window. Null scores
    rank below every non-null score (they only win single-member
    clusters): the flip column orders null-last via a +infinity sentinel.
    """
    for c in (score_col, cluster_col, id_col):
        if c not in clusters.columns:
            raise ValueError(f"column '{c}' not in input")
    payload = list(clusters.columns)
    # nulls: F.min skips null STRUCTS only; a null FIELD inside the struct
    # sorts FIRST in Spark struct comparison, which would wrongly crown a
    # null-score member — map null score to +inf so it sorts last instead
    flip = F.when(
        F.col(score_col).isNull(), F.lit(float("inf"))
    ).otherwise(-F.col(score_col))
    best = clusters.groupBy(cluster_col).agg(
        F.min(
            F.struct(
                flip.alias("__k"),
                F.col(id_col).alias("__t"),
                *[F.col(c).alias(f"__p_{i}") for i, c in enumerate(payload)],
            )
        ).alias("__b")
    )
    return best.select(
        *[F.col(f"__b.__p_{i}").alias(c) for i, c in enumerate(payload)]
    )
