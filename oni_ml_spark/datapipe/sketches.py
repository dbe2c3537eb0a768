"""Mergeable sketch aggregates — the approximate-analytics layer a 100 TB
pipeline leans on when exact answers don't justify their shuffle.

Why sketches and not exact aggregates at scale: an exact COUNT(DISTINCT)
shuffles every distinct value; a Datasketches HLL sketch is a fixed-size
(~KB) state that (a) partial-aggregates map-side, (b) MERGES — a sketch per
partition/day/source can be unioned later without touching the raw data.
That second property is the one exact counts lack entirely: you cannot add
two exact distinct counts, but you can union two sketches. The functions
here expose that workflow as DataFrame transforms:

- ``approx_distinct_by_group``: one sketch per group, estimate attached.
- ``rollup_distinct_sketches``: re-aggregate SAVED sketches to a coarser
  grouping (day → month, source → all) via ``hll_union_agg`` — the
  incremental-rollup pattern (never rescans the fact table).
- ``approx_freq_items``: per-column frequent-item candidates via the native
  one-pass ``DataFrame.stat.freqItems`` (Karp-Papadimitriou-Shenker).
- ``grouped_approx_quantiles``: per-group percentile_approx (Greenwald-
  Khanna sketch) — the approximate sibling of
  ``transforms.quantiles.grouped_quantile_cuts`` for high-cardinality
  groups where exact per-group ECDFs are overkill.

Accuracy is verified against exact aggregates in tests/test_sketches.py
(these are estimators, so there is deliberately no DuckDB value oracle —
the exact sides ARE the oracles, with published error bounds as the
tolerance: HLL lgK=12 → ~1.6% standard error).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_by_group(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """(group_cols..., distinct_sketch binary, approx_distinct long) — one
    Datasketches HLL sketch per group plus its estimate.

    Keep the sketch column when persisting: it is the mergeable state that
    lets ``rollup_distinct_sketches`` build coarser rollups later without
    rescanning the data. ``lg_k=12`` → 2^12 buckets ≈ 1.6% standard error
    in ~4 KB.
    """
    return (
        df.groupBy(*group_cols)
        .agg(F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("distinct_sketch"))
        .withColumn(
            "approx_distinct", F.hll_sketch_estimate("distinct_sketch").cast("long")
        )
    )


def rollup_distinct_sketches(
    sketches: DataFrame,
    group_cols: list[str],
    sketch_col: str = "distinct_sketch",
) -> DataFrame:
    """Re-aggregate saved per-group sketches to a coarser grouping — the
    incremental-rollup pattern: daily sketches union into monthly/all-time
    distinct counts with NO rescan of the fact table (impossible with exact
    counts, which don't add).

    ``group_cols=[]`` yields the single global rollup row. The merged
    sketch keeps the ``sketch_col`` name, so rollup output chains straight
    into a further (coarser) rollup.
    """
    agg = F.hll_union_agg(sketch_col).alias(sketch_col)
    grouped = (
        sketches.groupBy(*group_cols).agg(agg) if group_cols
        else sketches.agg(agg)
    )
    return grouped.withColumn(
        "approx_distinct", F.hll_sketch_estimate(sketch_col).cast("long")
    )


def approx_freq_items(
    df: DataFrame, cols: list[str], support: float = 0.01
) -> dict[str, list]:
    """Per-column frequent-item CANDIDATES with frequency > ``support``
    (one pass, Karp-Papadimitriou-Shenker via ``DataFrame.stat.freqItems``).

    No false negatives (every item above support is present); false
    positives possible — filter with an exact count over the candidate set
    (bounded: ≤ 1/support items) when precision matters.
    """
    row = df.stat.freqItems(cols, support).collect()[0]
    return {c: list(row[f"{c}_freqItems"]) for c in cols}


def grouped_approx_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    probs: list[float],
    rel_err: float = 0.001,
) -> DataFrame:
    """(group_cols..., p double, cutoff double) — per-group approximate
    quantiles via the percentile_approx sketch (one pass, map-side
    partials, accuracy 1/rel_err).

    The approximate sibling of ``quantiles.grouped_quantile_cuts``: use
    this for millions of groups / high-cardinality values where exact
    per-group ECDFs cost a wide shuffle; use the exact one when reference
    semantics (least x with P(X<=x) >= p) must hold bit-for-bit.
    """
    probs_sorted = sorted(set(float(p) for p in probs))
    accuracy = max(int(1.0 / rel_err), 100)
    arr = F.percentile_approx(
        F.col(value_col).cast("double"),
        F.array(*[F.lit(p) for p in probs_sorted]),
        F.lit(accuracy),
    )
    g = df.groupBy(*group_cols).agg(arr.alias("__cuts"))
    pairs = F.arrays_zip(
        F.array(*[F.lit(p) for p in probs_sorted]).alias("p"),
        F.col("__cuts").alias("cutoff"),
    )
    return g.select(
        *group_cols, F.explode(pairs).alias("__pc")
    ).select(*group_cols, F.col("__pc.p").alias("p"), F.col("__pc.cutoff").alias("cutoff"))


def corpus_minhash(
    df: DataFrame, key_col: str, num_hashes: int = 128
) -> DataFrame:
    """One-row MinHash signature of the SET of ``key_col`` values — the
    O(1)-memory way to compare two corpora: how much does today's crawl
    overlap yesterday's, across datacenters, WITHOUT joining 100 TB
    against 100 TB (each side reduces to ``num_hashes`` longs; the
    comparison is driver-side arithmetic).

    Signature component i = min over the corpus of ``xxhash64(key, i)`` —
    ONE aggregate with map-side combine; duplicates collapse for free
    (min is idempotent), nulls are excluded. Persist with plain parquet.
    Broder's classic estimator: P(component_i matches) = J(A, B), so the
    matching fraction estimates Jaccard with std error ~ 1/sqrt(num
    hashes) (128 → ±0.09). EXACT merge invariant (tested bit-for-bit):
    the signature of A ∪ B is the element-wise min of the signatures —
    daily signatures fold into a running corpus signature without ever
    touching old data.

    Schema: (sig array<bigint>, n_hashes int, key_type string) —
    ``key_type`` records the key column's Spark type because xxhash64
    hashes (value, type): the same ids stored as int vs bigint hash
    differently, and comparing such signatures would silently estimate
    J ≈ 0 (the plans/bloom key_types discipline). Empty corpus → nulls
    in every component (min over nothing), which ``estimated_jaccard``
    rejects explicitly.
    """
    if num_hashes < 1:
        raise ValueError("num_hashes must be >= 1")
    if key_col not in df.columns:
        raise ValueError(f"column {key_col!r} missing from the frame")
    keyed = df.select(key_col).where(F.col(key_col).isNotNull())
    aggs = [
        F.min(F.xxhash64(F.col(key_col), F.lit(i))).alias(f"__h{i}")
        for i in range(num_hashes)
    ]
    return keyed.agg(*aggs).select(
        F.array(*[F.col(f"__h{i}") for i in range(num_hashes)]).alias("sig"),
        F.lit(num_hashes).alias("n_hashes"),
        F.lit(dict(df.dtypes)[key_col]).alias("key_type"),
    )


def _one_signature(df: DataFrame, caller: str):
    """Exactly-one-row fetch with validation: a directory of appended daily
    signatures passed whole would otherwise be silently truncated to an
    arbitrary row (merge them pairwise instead)."""
    rows = df.take(2)
    if len(rows) != 1:
        raise ValueError(
            f"{caller}: expected a single-row signature frame, got "
            f"{'none' if not rows else 'several'} row(s) — merge multi-"
            "signature tables with merge_corpus_minhash first"
        )
    return rows[0]


def _check_compatible(ra, rb, caller: str) -> None:
    if ra["n_hashes"] != rb["n_hashes"]:
        raise ValueError(
            f"{caller}: signature widths differ: {ra['n_hashes']} vs "
            f"{rb['n_hashes']}"
        )
    if ra["key_type"] != rb["key_type"]:
        raise ValueError(
            f"{caller}: signatures were built over different key types "
            f"({ra['key_type']!r} vs {rb['key_type']!r}) — xxhash64 hashes "
            "(value, type), so the comparison would silently read as "
            "disjoint; cast the keys and re-sign"
        )


def merge_corpus_minhash(a: DataFrame, b: DataFrame) -> DataFrame:
    """Signature of the UNION of two corpora: element-wise min — exact,
    not approximate (min commutes with union). Each side is fetched with
    ONE action and the merge happens driver-side over 2·num_hashes longs
    (a join formulation would re-evaluate each input's lineage once for
    validation and again for the result)."""
    ra = _one_signature(a, "merge_corpus_minhash")
    rb = _one_signature(b, "merge_corpus_minhash")
    _check_compatible(ra, rb, "merge_corpus_minhash")
    merged = [
        y if x is None else x if y is None else min(x, y)
        for x, y in zip(ra["sig"], rb["sig"])
    ]
    spark = a.sparkSession
    return spark.createDataFrame(
        [(merged, ra["n_hashes"], ra["key_type"])],
        "sig array<bigint>, n_hashes int, key_type string",
    )


def estimated_jaccard(a: DataFrame, b: DataFrame) -> float:
    """Broder estimate of J(A, B) from two ``corpus_minhash`` signatures:
    the fraction of matching components. Driver-side arithmetic over
    2·num_hashes longs — no data moves. Raises on an empty-corpus
    signature (a null component estimates nothing), a multi-row frame,
    or mismatched widths/key types."""
    ra = _one_signature(a, "estimated_jaccard")
    rb = _one_signature(b, "estimated_jaccard")
    _check_compatible(ra, rb, "estimated_jaccard")
    sa, sb = list(ra["sig"]), list(rb["sig"])
    if any(x is None for x in sa) or any(x is None for x in sb):
        raise ValueError(
            "signature contains null components (empty corpus) — Jaccard "
            "with an empty set is 0 by definition; handle that case upstream"
        )
    return sum(1 for x, y in zip(sa, sb) if x == y) / len(sa)


def estimated_overlap(a: DataFrame, b: DataFrame, key_col: str, lg_k: int = 14) -> dict:
    """Approximate set algebra between two corpora's key sets WITHOUT a
    join — the count-flavored companion to ``corpus_minhash`` (which
    estimates the Jaccard ratio): returns ``n_a``, ``n_b``, ``n_union``
    (HLL estimates), ``n_intersect`` (inclusion–exclusion), plus the
    derived ``jaccard`` and both containment fractions — "how much of
    yesterday's crawl survives in today's" with three bounded aggregates
    and kilobytes of sketch state in flight.

    Each side reduces to one ~2^lg_k-bucket Datasketches HLL sketch (plus
    its estimate, riding the SAME aggregate) in a map-side-combinable
    action; the union sketch merges the two binary states driver-side
    through ``hll_union_agg`` over a 2-row frame — three Spark jobs
    total. Inclusion–exclusion inherits HLL's relative error (``rse`` ≈
    1.04/√2^lg_k — 0.81% at the default lg_k=14) — but on |A∩B| the
    SUBTRACTION amplifies it: the intersect's ABSOLUTE error is bounded
    by ~rse·(n_a + n_b + n_union), returned as
    ``intersect_abs_error`` — size confidence intervals on the
    intersection with THAT, never with rse·n_intersect (a small true
    overlap between two huge sets can even estimate negative, clamped to
    0 here; use ``corpus_minhash`` when the RATIO is what matters). Keys
    must share one type (enforced — HLL hashes typed values, same trap
    as the MinHash/bloom family).
    """
    for side, df in (("a", a), ("b", b)):
        if key_col not in df.columns:
            raise ValueError(f"side {side} lacks key column {key_col!r}")
    ta, tb = dict(a.dtypes)[key_col], dict(b.dtypes)[key_col]
    if ta != tb:
        raise ValueError(
            f"key types differ ({ta} vs {tb}) — HLL hashes typed values; "
            "cast both sides first"
        )
    spark = a.sparkSession

    def sketch(df: DataFrame):
        # estimate rides the sketch's own action — no second job per side
        agg = df.where(F.col(key_col).isNotNull()).agg(
            F.hll_sketch_agg(key_col, F.lit(lg_k)).alias("s")
        )
        return agg.select("s", F.hll_sketch_estimate("s").alias("n")).collect()[0]

    ra, rb = sketch(a), sketch(b)
    # hll_sketch_agg over zero non-null keys yields an empty sketch
    # (estimate 0; null on some builds) — reject with the side named
    # (mirrors estimated_jaccard's empty-corpus contract) instead of
    # crashing on float(None) / silently dividing by a 0 estimate below
    for side, r in (("a", ra), ("b", rb)):
        if r["s"] is None or r["n"] is None or float(r["n"]) == 0.0:
            raise ValueError(
                f"estimated_overlap: side {side!r} has no non-null "
                f"{key_col!r} keys — overlap with an empty set is 0 by "
                "definition; handle that case upstream"
            )
    n_a, n_b = float(ra["n"]), float(rb["n"])
    two = spark.createDataFrame([(ra["s"],), (rb["s"],)], "s binary")
    n_union = float(
        two.agg(
            F.hll_sketch_estimate(F.hll_union_agg("s")).alias("n_union")
        ).collect()[0]["n_union"]
    )
    n_intersect = max(0.0, n_a + n_b - n_union)
    rse = 1.04 / (2 ** (lg_k / 2))  # standard HLL relative error
    return {
        "n_a": round(n_a),
        "n_b": round(n_b),
        "n_union": round(n_union),
        "n_intersect": round(n_intersect),
        "jaccard": n_intersect / n_union if n_union > 0 else 0.0,
        "containment_a_in_b": n_intersect / n_a if n_a > 0 else 0.0,
        "containment_b_in_a": n_intersect / n_b if n_b > 0 else 0.0,
        "rse": rse,
        "intersect_abs_error": rse * (n_a + n_b + n_union),
    }
