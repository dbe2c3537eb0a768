"""Distribution-drift monitoring between two corpus snapshots — the
data-quality gate a production training pipeline runs before every refresh
("did today's crawl shift under us?"), beyond the reference (which has no
cross-snapshot statistics at all; its closest surface is the per-run
quantile cuts, utilities/Quantiles.scala).

Design for two 100 TB corpora: NOTHING joins row-to-row. Bin edges come
from the REFERENCE side's exact quantile cuts (|bins| driver-side values,
the same bounded collect the reference's own cut tables do), then each
side reduces to one |bins|-row histogram aggregate; every comparison
statistic (PSI, KL, chi-square, missing-rate delta) is arithmetic over
those two bounded tables. Shuffle carries bin subtotals, never rows.

Why quantile edges, not equi-width: drift shows up in the tails; equal-
population reference bins give every bin the same statistical weight and
make PSI's log-ratio terms comparable across bins (the standard credit-
scoring construction of the statistic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# conventional PSI reading: < 0.1 stable, 0.1-0.25 moderate shift,
# > 0.25 action required (population-stability-index folklore thresholds,
# documented so reports are self-describing)
PSI_STABLE = 0.1
PSI_ACTION = 0.25


def binned_counts(
    df: DataFrame, value_col: str, edges: list[float], side: str
) -> DataFrame:
    """One |edges|+1-row histogram of ``value_col`` over half-open bins
    ``(-inf, e0], (e0, e1], ..., (e_last, +inf)`` plus a missing-count row
    (bin -1) holding nulls AND NaNs — a producer that starts emitting 0/0
    ratios is the same "garbage arrived" drift signal as one emitting
    nulls, and must not masquerade as a surge of large values in the open
    top bin. One aggregate, map-side combinable; the bin expression is a
    literal when-chain, codegen-inlined like transforms.bin_expr (whose
    NaN->-1 convention this matches)."""
    _validate_edges(edges)
    return (
        df.select(_bin_expr(value_col, edges).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias(f"n_{side}"))
    )


def _validate_edges(edges: list[float]) -> None:
    if not edges:
        raise ValueError("edges must be non-empty")
    if sorted(edges) != list(edges) or len(set(edges)) != len(edges):
        raise ValueError("edges must be strictly ascending")


def _bin_expr(value_col: str, edges: list[float]):
    """The literal half-open-bin when-chain shared by every binning path
    (missing bin -1 holds nulls AND NaNs — see binned_counts)."""
    v = F.col(value_col).cast("double")
    b = F.when(v.isNull() | F.isnan(v), F.lit(-1))
    for i, e in enumerate(edges):
        b = b.when(v <= F.lit(float(e)), F.lit(i))
    return b.otherwise(F.lit(len(edges)))


def _sentinel_key(raw, reserved: list[str], fn_name: str):
    """Null-coalescing key expression with an in-plan ``raise_error``
    guard (a codegen when-branch, no extra job) against REAL values that
    collide with a reserved sentinel — shared by every drift path that
    manufactures '__null' / '__other' keys."""
    return F.when(
        raw.isin(reserved),
        F.raise_error(
            F.concat(
                F.lit(f"{fn_name}: real value collides with reserved sentinel "),
                raw,
            )
        ),
    ).otherwise(F.coalesce(raw, F.lit("__null")))


def _psi_terms(both: DataFrame, smoothing: float) -> DataFrame:
    """Shared drift arithmetic over a BOUNDED (.., n_ref, n_cur) count
    table: smoothed proportions against in-plan totals, PSI and KL terms
    appended.

    Totals come from a WINDOW over the count table, not a second
    aggregate joined back: an ``agg + join`` restatement would duplicate
    the whole upstream subtree in the plan — at 100 TB that is each
    corpus scanned TWICE for one drift table. The partition-less window
    is k-bounded by construction at every call site: |edges|+2 bins, or
    top_k-coarsened categories (<= 2·top_k+2 rows). The ONE unbounded
    count table — drift_compare_categorical with top_k=None over an
    unbounded key space — routes through ``_psi_terms_broadcast_totals``
    instead, which keeps per-key arithmetic distributed."""
    return _psi_terms_grouped(both, smoothing, [])


def _psi_terms_broadcast_totals(both: DataFrame, smoothing: float) -> DataFrame:
    """The distributed-totals variant for count tables that are NOT
    k-bounded (categorical drift without top_k: one row per distinct
    key — 10^8+ for URL-like keys). A partition-less window would funnel
    all of them through one task; here the totals are a 1-row aggregate
    broadcast back, so per-key arithmetic stays distributed. The totals
    subtree is a static-plan duplicate of the count table, but its
    aggregate exchanges are AQE ReusedExchange-deduped at runtime (same
    mechanism verified on the top_k path)."""
    tot = both.agg(
        F.sum("n_ref").alias("__tr"), F.sum("n_cur").alias("__tc"),
        F.count(F.lit(1)).alias("__nb"),
    )
    return _finish_psi(both.crossJoin(F.broadcast(tot)), smoothing)


def _psi_terms_grouped(
    both: DataFrame, smoothing: float, group_cols: list[str]
) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols) if group_cols else Window.partitionBy()
    return _finish_psi(
        both.withColumn("__tr", F.sum("n_ref").over(w))
        .withColumn("__tc", F.sum("n_cur").over(w))
        .withColumn("__nb", F.count(F.lit(1)).over(w)),
        smoothing,
    )


def _finish_psi(joined: DataFrame, smoothing: float) -> DataFrame:
    k = float(smoothing)
    p_ref = (F.col("n_ref") + k) / (F.col("__tr") + k * F.col("__nb"))
    p_cur = (F.col("n_cur") + k) / (F.col("__tc") + k * F.col("__nb"))
    return (
        joined
        .withColumn("p_ref", p_ref)
        .withColumn("p_cur", p_cur)
        .withColumn(
            "psi_term",
            (F.col("p_cur") - F.col("p_ref")) * F.log(F.col("p_cur") / F.col("p_ref")),
        )
        .withColumn("kl_term", F.col("p_cur") * F.log(F.col("p_cur") / F.col("p_ref")))
        .drop("__tr", "__tc", "__nb")
    )


def drift_compare(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    n_bins: int = 10,
    edges: list[float] | None = None,
    smoothing: float = 0.5,
) -> DataFrame:
    """Per-bin drift table between a REFERENCE corpus and a CURRENT one:
    DataFrame[bin, lo, hi, n_ref, n_cur, p_ref, p_cur, psi_term, kl_term]
    — sum psi_term for the population stability index, kl_term for
    KL(cur ‖ ref). Use ``drift_summary`` for the one-row verdict.

    ``edges`` default to the reference side's EXACT ``n_bins``-quantile
    cuts (equal-population reference bins — the standard PSI
    construction; the top cut is dropped so the last bin is open-ended).
    Pass explicit ``edges`` to compare against a FROZEN binning across
    many runs — at 100 TB you compute edges once on the baseline corpus
    and reuse them, which also makes the whole comparison a pure
    composition of two bounded aggregates.

    ``smoothing`` (add-k on counts) keeps empty bins from producing
    infinite log-ratios — a bin the current corpus abandoned is exactly
    the signal PSI must flag, not a NaN. Null values are tracked as their
    own bin (-1): a producer that started emitting nulls is drift too.
    """
    if smoothing <= 0:
        raise ValueError("smoothing must be positive (log-ratio of empty bins)")
    for side, df in (("ref", ref), ("cur", cur)):
        if value_col not in df.columns:
            raise ValueError(f"{side} side lacks column {value_col!r}")
    if edges is None:
        if n_bins < 2:
            raise ValueError(f"n_bins must be >= 2, got {n_bins}")
        from oni_ml_spark.transforms.quantiles import quantile_cuts

        probs = [i / n_bins for i in range(1, n_bins)]
        # bounded collect: n_bins-1 doubles — the same boundary the
        # reference's own cut tables cross
        edges = sorted(set(quantile_cuts(ref, value_col, probs)))
        if not edges or edges[0] == float("inf"):
            raise ValueError("reference side has no non-null values to bin")
    edges = [float(e) for e in edges]

    rc = binned_counts(ref, value_col, edges, "ref")
    cc = binned_counts(cur, value_col, edges, "cur")
    # |bins|+2-row full outer join of two bounded aggregates
    both = rc.join(cc, "bin", "full_outer").select(
        "bin",
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )
    lo_edge = {i: edges[i - 1] for i in range(1, len(edges) + 1)}
    lo_expr = F.create_map(
        *[F.lit(x) for kv in lo_edge.items() for x in kv]
    )[F.col("bin")]
    hi_expr = F.create_map(
        *[F.lit(x) for kv in {i: e for i, e in enumerate(edges)}.items() for x in kv]
    )[F.col("bin")]
    return _psi_terms(both, smoothing).select(
        "bin",
        lo_expr.alias("lo"),
        hi_expr.alias("hi"),
        "n_ref",
        "n_cur",
        "p_ref",
        "p_cur",
        "psi_term",
        "kl_term",
    )


def drift_compare_grouped(
    ref: DataFrame,
    cur: DataFrame,
    group_col: str,
    value_col: str,
    edges: list[float],
    smoothing: float = 0.5,
) -> DataFrame:
    """Per-segment numeric drift — "WHICH source/domain/language
    drifted?" — in one pass: DataFrame[group, bin, n_ref, n_cur, p_ref,
    p_cur, psi_term, kl_term], where each group's terms are a
    self-contained PSI over that group's own mass (sum psi_term per
    group and compare against the PSI_* thresholds). Passing a time
    bucket (ingest date, hour window) as ``group_col`` turns this into
    the rolling drift timeline — every period scored against one frozen
    reference in a single pass.

    ``edges`` must be explicit (the frozen global binning): freezing one
    binning across segments is what makes segment PSIs comparable to
    each other and to the ungrouped monitor — per-group quantile edges
    would give every segment a different partition and an
    incomparable score.

    Scale shape: ONE (group, bin) aggregate per side (map-side
    combinable; |groups|·(|edges|+2) rows), a full-outer join of the two
    bounded tables, per-group totals via a window partitioned by group
    (<= |edges|+2 rows per partition — the one-subtree shape, never a
    second corpus scan). Nothing row-sized survives the first aggregate. Null groups are their own '__null'
    segment (a feed that stopped labeling rows is segment drift);
    a REAL '__null' group value collides and raises in-plan, as in
    drift_compare_categorical."""
    if smoothing <= 0:
        raise ValueError("smoothing must be positive (log-ratio of empty bins)")
    for side, df in (("ref", ref), ("cur", cur)):
        for c in (group_col, value_col):
            if c not in df.columns:
                raise ValueError(f"{side} side lacks column {c!r}")
    _validate_edges(edges)
    edges = [float(e) for e in edges]
    gkey = _sentinel_key(
        F.col(group_col).cast("string"), ["__null"], "drift_compare_grouped"
    )

    def counts(df, side):
        return (
            df.select(gkey.alias("group"), _bin_expr(value_col, edges).alias("bin"))
            .groupBy("group", "bin")
            .agg(F.count(F.lit(1)).alias(f"n_{side}"))
        )

    both = counts(ref, "ref").join(
        counts(cur, "cur"), ["group", "bin"], "full_outer"
    ).select(
        "group",
        "bin",
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )
    return _psi_terms_grouped(both, smoothing, ["group"]).select(
        "group", "bin", "n_ref", "n_cur", "p_ref", "p_cur", "psi_term", "kl_term"
    )


def drift_compare_categorical(
    ref: DataFrame,
    cur: DataFrame,
    key_col: str,
    top_k: int | None = None,
    smoothing: float = 0.5,
) -> DataFrame:
    """Per-category drift table between two corpora over a categorical
    column (source, language, domain, event type):
    DataFrame[key, n_ref, n_cur, p_ref, p_cur, psi_term, kl_term].

    Each side reduces to ONE (key, count) aggregate (map-side combinable;
    the shuffle carries per-key partials, never rows), full-outer joined
    on key — a category one side abandoned still appears, with the
    smoothed log-ratio flagging it. Nulls count as their own category.

    ``top_k`` bounds the comparison for unbounded key spaces (URLs,
    domains at 100 TB): the union of each side's top_k heaviest
    categories is compared individually and EVERYTHING else collapses
    into one '__other' row, so total probability mass is preserved (PSI
    over the bounded table is still a true PSI of the coarsened
    partition, not of a truncated one). The top-k sets are
    TakeOrderedAndProject over the already-aggregated count tables —
    2·top_k rows broadcast back; no global sort of the key space. Each
    count table feeds both its top-k selection and the coarsening join;
    the static plan prints the subtree twice, but AQE's exchange reuse
    dedupes it at runtime (verified: 2 ReusedExchange nodes in the
    executed plan — one corpus scan per side).

    The sentinel keys '__null' (genuine NULLs) and '__other' (the
    coarsening bucket) must not occur as REAL category values — a real
    '__null' (a common upstream null-fill token) would silently merge two
    distinct populations into one count. An in-plan ``raise_error`` guard
    (a codegen when-branch, no extra job) fails the comparison instead."""
    for side, df in (("ref", ref), ("cur", cur)):
        if key_col not in df.columns:
            raise ValueError(f"{side} side lacks column {key_col!r}")
    reserved = ["__null"] + (["__other"] if top_k is not None else [])
    key = _sentinel_key(
        F.col(key_col).cast("string"), reserved, "drift_compare_categorical"
    )
    rc = ref.select(key.alias("key")).groupBy("key").agg(
        F.count(F.lit(1)).alias("n_ref")
    )
    cc = cur.select(key.alias("key")).groupBy("key").agg(
        F.count(F.lit(1)).alias("n_cur")
    )
    if smoothing <= 0:
        raise ValueError("smoothing must be positive (log-ratio of empty bins)")
    if top_k is not None:
        if top_k < 1:
            raise ValueError("top_k must be >= 1")
        keep = (
            rc.orderBy(F.desc("n_ref"), "key").limit(top_k).select("key")
            .unionByName(
                cc.orderBy(F.desc("n_cur"), "key").limit(top_k).select("key")
            )
            .distinct()
            .withColumn("__keep", F.lit(True))
        )

        def coarsen(counts, n_col):
            return (
                counts.join(F.broadcast(keep), "key", "left_outer")
                .select(
                    F.when(F.col("__keep"), F.col("key"))
                    .otherwise(F.lit("__other")).alias("key"),
                    n_col,
                )
                .groupBy("key")
                .agg(F.sum(n_col).alias(n_col))
            )

        rc, cc = coarsen(rc, "n_ref"), coarsen(cc, "n_cur")
    both = rc.join(cc, "key", "full_outer").select(
        "key",
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )
    # with top_k the table is <= 2*top_k+2 rows (window totals are fine);
    # without it the table is one row per distinct key — keep the per-key
    # arithmetic distributed instead of a single-task window
    terms = (
        _psi_terms(both, smoothing)
        if top_k is not None
        else _psi_terms_broadcast_totals(both, smoothing)
    )
    return terms.select(
        "key", "n_ref", "n_cur", "p_ref", "p_cur", "psi_term", "kl_term"
    )


def embedding_norm_drift(
    ref: DataFrame,
    cur: DataFrame,
    vec_col: str,
    edges: list[float],
    smoothing: float = 0.5,
) -> DataFrame:
    """Drift of an embedding corpus's NORM distribution — the cheap
    first-line signal that an encoder version changed, a scaling bug
    landed, or zero vectors started arriving (they land in bin 0;
    null/NaN-bearing vectors land in bin -1). Thin composition: per-row
    L2 norm (an in-order fold over the array — bit-identical across
    engines for identical doubles) into ``drift_compare`` with frozen
    ``edges``. Same 2-scan bounded-aggregate shape."""
    from oni_ml_spark.datapipe.similarity import as_double_array, norm

    def norms(df, side):
        if vec_col not in df.columns:
            raise ValueError(f"{side} side lacks column {vec_col!r}")
        return df.select(norm(as_double_array(vec_col)).alias("__norm"))

    return drift_compare(
        norms(ref, "ref"), norms(cur, "cur"), "__norm",
        edges=edges, smoothing=smoothing,
    )


def centroid_shift(
    ref: DataFrame,
    cur: DataFrame,
    vec_col: str,
    dim: int,
    scale: float = 1_000_000.0,
) -> DataFrame:
    """Directional drift of an embedding corpus: one row
    (cosine, l2_ref, l2_cur, n_ref, n_cur, dim) where ``cosine`` is the
    angle between the two corpora's mean vectors — the "did the encoder
    or the content rotate?" companion to ``embedding_norm_drift`` (norms
    can hold perfectly still while every direction moves).

    Determinism at scale: per-dimension sums of doubles are
    addition-order-dependent, so each component is quantized to
    ``floor(x * scale)`` BEFORE summing (the tf-idf top-terms trick) —
    the per-dimension totals are exact BIGINTs on any engine and any
    partitioning, and the final cosine is double arithmetic over 2·dim
    bounded values. Overflow bound: |x|·scale·rows must stay under 2^63
    (~9.2e18) — at scale=1e6 and unit-normalized embeddings that is ~1e12
    rows per corpus; lower ``scale`` past that.

    Plan shape: posexplode → ONE (pos, sum) aggregate per side (map-side
    combinable: the shuffle carries dim·partitions partials, never
    vectors), joined on pos (dim rows), reduced to one row.

    Garbage REFUSES instead of deflecting the answer: a null/NaN
    component, a null/empty vector (posexplode_outer keeps them visible),
    or a corpus that is ragged or uniformly shorter/longer than ``dim``
    (per-side per-dimension row counts must all equal each other and
    dim_seen must equal ``dim``) each raise in-plan — a corrupted feed
    must not silently drag the centroid toward zero; its norm-drift
    sibling is the operator that COUNTS such rows (bin -1)."""
    if dim < 1:
        raise ValueError("dim must be >= 1")
    if scale <= 0:
        raise ValueError("scale must be positive")
    from oni_ml_spark.datapipe.similarity import as_double_array

    def comps(df, side):
        if vec_col not in df.columns:
            raise ValueError(f"{side} side lacks column {vec_col!r}")
        v = as_double_array(vec_col)
        x = F.col("x")
        qx = F.when(
            x.isNull() | F.isnan(x),
            F.raise_error(
                F.lit(
                    f"centroid_shift: {side} side has a null/NaN component "
                    "or a null/empty vector — refusing to fold garbage into "
                    "the centroid (use embedding_norm_drift's bin -1 to "
                    "count such rows)"
                )
            ).cast("double"),
        ).otherwise(F.floor(x * F.lit(float(scale)))).cast("long")
        return (
            df.select(F.posexplode_outer(v).alias("pos", "x"))
            .groupBy("pos")
            .agg(
                F.sum(qx).alias(f"s_{side}"),
                F.count(F.lit(1)).alias(f"n_{side}"),
            )
        )

    both = comps(ref, "ref").join(comps(cur, "cur"), "pos", "full_outer").select(
        "pos",
        F.coalesce("s_ref", F.lit(0)).alias("s_ref"),
        F.coalesce("s_cur", F.lit(0)).alias("s_cur"),
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )
    # means in quantized units; n must be the per-dimension constant
    # (= corpus rows) on BOTH sides — min==max pins rectangularity, and a
    # side uniformly shorter than dim shows up as min 0 after the
    # full-outer coalesce
    agg = both.agg(
        F.sum(F.col("s_ref").cast("double") / F.greatest("n_ref", F.lit(1))
              * (F.col("s_cur").cast("double") / F.greatest("n_cur", F.lit(1)))
              ).alias("dot"),
        F.sum(F.pow(F.col("s_ref").cast("double") / F.greatest("n_ref", F.lit(1)), 2)
              ).alias("r2"),
        F.sum(F.pow(F.col("s_cur").cast("double") / F.greatest("n_cur", F.lit(1)), 2)
              ).alias("c2"),
        F.max("n_ref").alias("n_ref"),
        F.max("n_cur").alias("n_cur"),
        F.min("n_ref").alias("__n_ref_min"),
        F.min("n_cur").alias("__n_cur_min"),
        F.count(F.lit(1)).alias("dim_seen"),
    )
    shape_ok = (
        (F.col("dim_seen") == dim)
        & (F.col("n_ref") > 0)
        & (F.col("n_cur") > 0)
        & (F.col("__n_ref_min") == F.col("n_ref"))
        & (F.col("__n_cur_min") == F.col("n_cur"))
    )
    return agg.select(
        # try_divide: an all-zero centroid (legit degenerate corpus) has
        # no defined angle — null, not an ANSI divide-by-zero; shape
        # violations raise via the dim column's guard, and CASE laziness
        # keeps this expression from tripping first on an empty side
        F.when(
            shape_ok, F.try_divide(F.col("dot"), F.sqrt("r2") * F.sqrt("c2"))
        ).alias("cosine"),
        (F.sqrt("r2") / F.lit(float(scale))).alias("l2_ref"),
        (F.sqrt("c2") / F.lit(float(scale))).alias("l2_cur"),
        "n_ref",
        "n_cur",
        F.when(shape_ok, F.col("dim_seen")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"centroid_shift: expected dim={dim}, saw "),
                    F.col("dim_seen").cast("string"),
                    F.lit(
                        " distinct positions — ragged, truncated, empty, "
                        "or mis-declared vectors"
                    ),
                )
            )
        ).alias("dim"),
    )


# cat rows in the summary's unified count table carry this bin (never
# produced by _bin_expr, whose range is >= -1) and numeric rows carry
# key '' (cat keys CAN be '' — the kinds stay disjoint because a column
# is numeric or categorical, never both); both placeholders exist so the
# (column, bin, key) full-outer join has no null keys (null != null
# would split every row into two half-counted ones)
_CAT_BIN = -2


def _summary_counts(
    df: DataFrame,
    side: str,
    value_cols: list[str],
    cat_cols: list[str],
    edges: dict[str, list[float]],
    reserved: list[str],
) -> DataFrame:
    """ONE aggregate holding everything drift_summary needs from one
    corpus: per (column, bin|key) — row count, and for numeric bins the
    non-missing count / mean / sample variance (the sufficient statistics
    that recombine exactly via the parallel-variance merge, Chan et al.
    1979). One projection fans each input row out to |cols| struct rows
    (consumed immediately by the map-side-combinable hash aggregate —
    nothing row-sized survives), so the whole summary costs ONE scan per
    side regardless of column count."""
    structs = []
    for c in value_cols:
        b = _bin_expr(c, edges[c])
        v = F.col(c).cast("double")
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                b.alias("bin"),
                F.lit("").alias("key"),
                # clean value: null for the missing bin (nulls AND NaNs),
                # so bin -1 never poisons the moment sums
                F.when(b >= 0, v).alias("val"),
            )
        )
    for c in cat_cols:
        k = _sentinel_key(F.col(c).cast("string"), reserved, "drift_summary")
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.lit(_CAT_BIN).alias("bin"),
                k.alias("key"),
                F.lit(None).cast("double").alias("val"),
            )
        )
    return (
        df.select(F.inline(F.array(*structs)))
        .groupBy("column", "bin", "key")
        .agg(
            F.count(F.lit(1)).alias(f"n_{side}"),
            F.count("val").alias(f"m_{side}"),
            F.avg("val").alias(f"mean_{side}"),
            F.var_samp("val").alias(f"var_{side}"),
        )
    )


def _summary_table(
    ref: DataFrame,
    cur: DataFrame,
    value_cols: list[str],
    cat_cols: list[str],
    edges: dict[str, list[float]],
    reserved: list[str],
) -> DataFrame:
    """The LAZY joined per-(column, bin|key) count table both summary
    passes read — exactly one scan of each corpus in its plan (the shape
    the plan-contract test pins)."""
    rc = _summary_counts(ref, "ref", value_cols, cat_cols, edges, reserved)
    cc = _summary_counts(cur, "cur", value_cols, cat_cols, edges, reserved)
    return rc.join(cc, ["column", "bin", "key"], "full_outer").select(
        "column",
        "bin",
        "key",
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        F.coalesce("m_ref", F.lit(0)).alias("m_ref"),
        F.coalesce("m_cur", F.lit(0)).alias("m_cur"),
        "mean_ref",
        "mean_cur",
        "var_ref",
        "var_cur",
    )


def drift_summary(
    ref: DataFrame,
    cur: DataFrame,
    value_cols: list[str],
    n_bins: int = 10,
    smoothing: float = 0.5,
    categorical_cols: list[str] | None = None,
    top_k: int | None = 100,
    edges: dict[str, list[float]] | None = None,
) -> DataFrame:
    """One row per column: psi, kl, null-rate delta, mean/stddev deltas,
    and the conventional verdict ('stable' / 'moderate' / 'action').

    SINGLE-PASS per side (r8 verdict item 1): every column unpivots into
    one (column, bin|key) row stream feeding ONE map-side-combinable
    aggregate per corpus — with frozen ``edges`` a 20-column summary
    scans each corpus exactly once (the per-column composition it
    replaces scanned 2 + 2·|cols| times). Default edges add ONE bounded
    pre-pass over ref (``quantile_cuts_multi`` — itself a single scan
    for all columns). Per-bin moments recombine through the exact
    parallel-variance merge; PSI totals broadcast back onto the count
    table, so no single-task window exists on any path (uncoarsened
    categorical included). The count table is per-distinct-key sized
    (post-aggregation — orders smaller than the corpus, but NOT
    top_k-bounded before coarsening). With ``top_k`` set, or no
    categorical columns, it is localCheckpoint-pinned so the five
    downstream consumers (two keep-set orders per categorical column,
    the coarsening join, totals, terms) re-read it instead of the
    corpora — the pin is the price of a guaranteed single scan per side;
    with ``top_k=None`` and categorical columns nothing is pinned
    (pinning an uncoarsened URL-scale key table buys nothing when there
    are no keep-set consumers) and AQE exchange reuse dedupes the shared
    subtree at runtime instead.

    ``categorical_cols`` adds one row per categorical column with
    drift_compare_categorical's exact semantics — '__null' key, top-k
    union coarsening to '__other' with mass preserved, in-plan sentinel-
    collision guard (mean/std/null_rate_delta are null for those; the
    '__null' share delta is baked into the PSI). ``top_k`` defaults to
    100 — summaries are usually run on columns whose key space nobody
    has audited; pass None only for provably small dictionaries.

    ``null_rate_delta`` counts nulls AND NaNs (the PSI missing bin's own
    -1 convention — a feed drifting to NaN moves both numbers
    consistently), and NaNs are likewise EXCLUDED from mean/std rather
    than poisoning them; the pre-r9 summary counted SQL nulls only and
    let one NaN turn the means into NaN."""
    if not value_cols and not categorical_cols:
        raise ValueError("need at least one of value_cols / categorical_cols")
    if smoothing <= 0:
        raise ValueError("smoothing must be positive (log-ratio of empty bins)")
    cat_cols = list(categorical_cols or [])
    overlap = set(value_cols) & set(cat_cols)
    if overlap:
        raise ValueError(
            f"columns {sorted(overlap)} listed as both numeric and categorical"
        )
    if len(set(value_cols)) != len(value_cols) or len(set(cat_cols)) != len(cat_cols):
        raise ValueError("duplicate column in value_cols / categorical_cols")
    for side, df in (("ref", ref), ("cur", cur)):
        for c in list(value_cols) + cat_cols:
            if c not in df.columns:
                raise ValueError(f"{side} side lacks column {c!r}")
    if top_k is not None and top_k < 1:
        raise ValueError("top_k must be >= 1")
    spark = ref.sparkSession

    if edges is None:
        edges = {}
        if value_cols:
            if n_bins < 2:
                raise ValueError(f"n_bins must be >= 2, got {n_bins}")
            from oni_ml_spark.transforms.quantiles import quantile_cuts_multi

            probs = [i / n_bins for i in range(1, n_bins)]
            cuts = quantile_cuts_multi(ref, {c: probs for c in value_cols})
            for c in value_cols:
                e = sorted(set(cuts[c]))
                if not e or e[0] == float("inf"):
                    raise ValueError(
                        f"reference side has no non-null values to bin "
                        f"in column {c!r}"
                    )
                edges[c] = [float(x) for x in e]
    else:
        missing = [c for c in value_cols if c not in edges]
        if missing:
            raise ValueError(f"edges missing for value columns {missing}")
        edges = {c: [float(x) for x in edges[c]] for c in value_cols}
        for c in value_cols:
            _validate_edges(edges[c])

    reserved = ["__null"] + (["__other"] if top_k is not None else [])
    both = _summary_table(ref, cur, value_cols, cat_cols, edges, reserved)
    if top_k is not None or not cat_cols:
        # ONE scan per side, then pin the per-distinct-key-sized result
        # (post-aggregation — orders smaller than the corpora) so the
        # FIVE downstream consumers (2 keep-set orders per categorical
        # column, the coarsening join, totals, terms) re-read the
        # checkpoint, never the corpora
        both = both.localCheckpoint(eager=True)
    # else (top_k=None with categorical columns): no keep-set consumers
    # exist, so pinning an uncoarsened URL-scale key table buys nothing —
    # stay lazy; the count-table subtree is shared by the totals and
    # terms consumers and AQE exchange reuse dedupes it at runtime (the
    # drift_compare_categorical-without-top_k precedent, ReusedExchange
    # verified there), keeping one scan per corpus

    num = both.where(F.col("bin") != _CAT_BIN)
    cat = both.where(F.col("bin") == _CAT_BIN)
    if cat_cols and top_k is not None:
        # per-column keep set = union of each side's top_k heaviest keys
        # (drift_compare_categorical's exact selection incl. tie order);
        # orderBy+limit is TakeOrderedAndProject over the checkpoint —
        # no per-column full sort, no single-task window
        from functools import reduce

        keeps = []
        for c in cat_cols:
            s = cat.where(F.col("column") == c)
            for n_col in ("n_ref", "n_cur"):
                keeps.append(
                    s.where(F.col(n_col) > 0)
                    .orderBy(F.desc(n_col), "key")
                    .limit(top_k)
                    .select("column", "key")
                )
        keep = (
            reduce(DataFrame.unionByName, keeps)
            .distinct()
            .withColumn("__keep", F.lit(True))
        )
        cat = (
            cat.join(F.broadcast(keep), ["column", "key"], "left_outer")
            .select(
                "column",
                F.lit(_CAT_BIN).alias("bin"),
                F.when(F.col("__keep"), F.col("key"))
                .otherwise(F.lit("__other"))
                .alias("key"),
                "n_ref",
                "n_cur",
            )
            .groupBy("column", "bin", "key")
            .agg(F.sum("n_ref").alias("n_ref"), F.sum("n_cur").alias("n_cur"))
        )
        cat = cat.select(
            "column", "bin", "key", "n_ref", "n_cur",
            F.lit(0).cast("long").alias("m_ref"),
            F.lit(0).cast("long").alias("m_cur"),
            F.lit(None).cast("double").alias("mean_ref"),
            F.lit(None).cast("double").alias("mean_cur"),
            F.lit(None).cast("double").alias("var_ref"),
            F.lit(None).cast("double").alias("var_cur"),
        )
    work = num.unionByName(cat)

    def wsum(m, mean):
        return F.sum(
            F.when(F.col(m) > 0, F.col(m) * F.col(mean)).otherwise(F.lit(0.0))
        )

    def m2sum(m, var):
        # per-bin M2 = var_samp · (m - 1); singleton/empty bins carry 0
        return F.sum(
            F.coalesce(F.col(var) * (F.col(m) - 1), F.lit(0.0))
        )

    t1 = work.groupBy("column").agg(
        F.sum("n_ref").alias("tr"),
        F.sum("n_cur").alias("tc"),
        F.count(F.lit(1)).alias("nb"),
        F.sum(F.when(F.col("bin") == -1, F.col("n_ref")).otherwise(0)).alias("miss_ref"),
        F.sum(F.when(F.col("bin") == -1, F.col("n_cur")).otherwise(0)).alias("miss_cur"),
        F.sum("m_ref").alias("nv_ref"),
        F.sum("m_cur").alias("nv_cur"),
        wsum("m_ref", "mean_ref").alias("ws_ref"),
        wsum("m_cur", "mean_cur").alias("ws_cur"),
        m2sum("m_ref", "var_ref").alias("m2_ref"),
        m2sum("m_cur", "var_cur").alias("m2_cur"),
    )
    means = t1.select(
        "column", "tr", "tc", "nb",
        F.try_divide("ws_ref", "nv_ref").alias("gm_ref"),
        F.try_divide("ws_cur", "nv_cur").alias("gm_cur"),
    )
    k = float(smoothing)
    j = work.join(F.broadcast(means), "column")
    p_ref = (F.col("n_ref") + k) / (F.col("tr") + k * F.col("nb"))
    p_cur = (F.col("n_cur") + k) / (F.col("tc") + k * F.col("nb"))

    def cross(m, mean, gm):
        return F.sum(
            F.when(
                F.col(m) > 0,
                F.col(m) * F.pow(F.col(mean) - F.col(gm), F.lit(2.0)),
            ).otherwise(F.lit(0.0))
        )

    terms = j.groupBy("column").agg(
        F.sum((p_cur - p_ref) * F.log(p_cur / p_ref)).alias("psi"),
        F.sum(p_cur * F.log(p_cur / p_ref)).alias("kl"),
        cross("m_ref", "mean_ref", "gm_ref").alias("x2_ref"),
        cross("m_cur", "mean_cur", "gm_cur").alias("x2_cur"),
    )
    stats = {r["column"]: r for r in t1.join(terms, "column").collect()}

    for side, key_col in (("ref", "tr"), ("cur", "tc")):
        if not stats or any(r[key_col] == 0 for r in stats.values()):
            # an empty current snapshot is catastrophic drift, not a
            # TypeError on float(None) — name the side and stop
            raise ValueError(
                f"{side} side has no rows — cannot compute drift moments "
                "(an empty current snapshot IS the incident; investigate "
                "the feed before asking for a PSI)"
            )

    def verdict_of(psi):
        return (
            "stable" if psi < PSI_STABLE
            else "moderate" if psi < PSI_ACTION
            else "action"
        )

    def _moments(r, side):
        nv, ws = r[f"nv_{side}"], r[f"ws_{side}"]
        if nv == 0:
            return None, None
        mean = ws / nv
        if nv < 2:
            return mean, None
        m2 = r[f"m2_{side}"] + r[f"x2_{side}"]
        return mean, (m2 / (nv - 1)) ** 0.5

    rows = []
    for c in list(value_cols) + cat_cols:
        r = stats[c]
        psi, kl = float(r["psi"]), float(r["kl"])
        if c in edges:
            mean_ref, std_ref = _moments(r, "ref")
            mean_cur, std_cur = _moments(r, "cur")
            nrd = r["miss_cur"] / r["tc"] - r["miss_ref"] / r["tr"]
            rows.append(
                (c, psi, kl, mean_ref, mean_cur, std_ref, std_cur, nrd,
                 verdict_of(psi))
            )
        else:
            rows.append(
                (c, psi, kl, None, None, None, None, None, verdict_of(psi))
            )
    return spark.createDataFrame(
        rows,
        "column string, psi double, kl double, mean_ref double, mean_cur double, "
        "std_ref double, std_cur double, null_rate_delta double, verdict string",
    )
