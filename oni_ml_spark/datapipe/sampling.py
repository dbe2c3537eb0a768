"""Deterministic sampling / splitting / cross-corpus dedup operators.

Training-data pipelines need reproducible splits and incremental dedup far
more often than random ones: every operator here is a pure function of the
row content (md5-derived), so reruns, backfills, and different engines
produce identical assignments.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from oni_ml_spark.datapipe.dedup import normalize_text


def hash_bucket(c: Column | str, buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets) from the md5 of a key column."""
    k = F.col(c) if isinstance(c, str) else c
    return (
        F.conv(F.substring(F.md5(k.cast("string")), 1, 8), 16, 10).cast("long")
        % buckets
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    split_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split (train/val/test...) by hash bucket.

    ``splits`` maps name → fraction (must sum to <= 1; remainder falls into
    the last split). Deterministic: the same key lands in the same split on
    any engine, any run — the property random sampling can't give a
    multi-stage pipeline.
    """
    b = hash_bucket(key_col, 10_000)
    out: Column | None = None
    lo = 0
    names = list(splits)
    for name in names:
        hi = lo + int(round(splits[name] * 10_000))
        cond = (b >= lo) & (b < hi)
        out = F.when(cond, F.lit(name)) if out is None else out.when(cond, F.lit(name))
        lo = hi
    return df.withColumn(split_col, out.otherwise(F.lit(names[-1])))


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    text_col: str,
    splits: dict[str, float],
    split_col: str = "split",
    clusters: DataFrame | None = None,
    **near_dup_kwargs,
) -> DataFrame:
    """Train/val/test assignment that cannot leak near-duplicates across
    splits: rows are hashed into splits by their near-dup CLUSTER id, so a
    whole duplicate component lands in exactly one split — the guard
    against a test document whose paraphrase sits in train (the
    contamination plain row-level ``hash_split`` cannot prevent).

    Composition, no new machinery: ``near_dup_clusters`` (banded LSH →
    exact-Jaccard verify → connected components; pass ``clusters`` to
    reuse an already-computed (id, cluster) table and skip the LSH pass)
    then ``hash_split`` keyed on the cluster id. The cluster table joins
    LEFT onto the corpus with a self-cluster fallback
    (``coalesce(cluster, id)``): no row can silently vanish — a row a
    stale precomputed table does not cover, or a null-id row, keeps the
    plain row-level assignment instead of being dropped (the silent-loss
    edge the review caught). Rows in no duplicate component are their own
    cluster, so for them the assignment is IDENTICAL to
    ``hash_split(df, id_col, splits)`` — adding the guard reshuffles only
    the rows that were leak risks. Deterministic on any engine, any run.

    At scale: the cluster table is (id, cluster) — two longs per row; the
    join onto the corpus is the only payload-carrying shuffle and the
    split expression itself is a pure hash projection.
    """
    from oni_ml_spark.datapipe.dedup import near_dup_clusters

    taken = {"cluster", split_col}
    clash = sorted(taken & set(df.columns))
    if clash:
        raise ValueError(
            f"input columns {clash} collide with the output cluster/"
            f"{split_col!r} columns — rename them first"
        )
    if split_col in ("id", "cluster", id_col):
        raise ValueError(f"split_col {split_col!r} collides with the cluster table")
    if clusters is None:
        clusters = near_dup_clusters(df, id_col, text_col, **near_dup_kwargs)
    else:
        if near_dup_kwargs:
            raise ValueError(
                f"near-dup parameters {sorted(near_dup_kwargs)} are ignored "
                "when a precomputed clusters= table is passed — drop them or "
                "drop clusters="
            )
        missing = [c for c in ("id", "cluster") if c not in clusters.columns]
        if missing:
            raise ValueError(f"clusters frame lacks columns {missing}")
    joined = df.join(
        clusters.select(F.col("id").alias(id_col), "cluster"), id_col, "left"
    ).withColumn("cluster", F.coalesce("cluster", F.col(id_col)))
    return hash_split(joined, "cluster", splits, split_col=split_col)


def aes_arrival(
    key_col: str,
    weight_col: str | None,
    salt: str = "",
    hash_fn: str = "xxhash64",
    caller: str = "aes_arrival",
):
    """THE Efraimidis–Spirakis exponential-clock expression every
    deterministic sampler shares (batch ``weighted_sample_k`` and the
    streaming reservoir sink): u = hash-uniform(0,1) of (key, salt),
    arrival = -ln(u) / w. ``weight_col=None`` means uniform (w = 1).
    Null/negative/NaN weights raise IN-PLAN (riding the scan, no
    validation pre-pass); zero weight yields a null arrival (callers
    filter — never sampled). Deterministic on any engine and any
    partitioning; identical (key, salt) always redraws identically."""
    if hash_fn not in ("xxhash64", "md5"):
        raise ValueError(f"hash_fn must be xxhash64|md5, got {hash_fn!r}")
    if hash_fn == "md5":
        h = F.conv(
            F.substring(F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))), 1, 8),
            16, 10,
        ).cast("long")
        u = (h.cast("double") + 1.0) / (float(1 << 32) + 2.0)
    else:
        m = F.lit(1 << 40)
        u = (
            F.pmod(F.xxhash64(F.col(key_col), F.lit(salt)), m).cast("double") + 1.0
        ) / (F.lit(float(1 << 40)) + 2.0)
    if weight_col is None:
        return -F.log(u)
    w = F.col(weight_col).cast("double")
    return (
        F.when(
            w.isNull() | (w < 0) | F.isnan(w),
            F.raise_error(
                F.concat(
                    F.lit(f"{caller}: {weight_col} must be >= 0, got "),
                    F.col(weight_col).cast("string"),
                )
            ).cast("double"),
        )
        .when(w == 0, F.lit(None).cast("double"))
        .otherwise(-F.log(u) / w)
    )


def weighted_sample_k(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    group_cols: list[str] | str | None = None,
    salt: str = "",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: k rows where
    each row's inclusion is biased by ``weight_col`` — the quality-weighted
    corpus subset / importance-sampled eval pick, reproducible on any
    engine and any partitioning (the randomness is a hash of
    ``key_col`` + ``salt``, not an RNG).

    Efraimidis–Spirakis A-ES (IPL 2006) via exponential clocks: each row
    draws u = hash-uniform(0,1) and gets arrival time ``-ln(u) / w``
    (Exp(w)); the k EARLIEST arrivals are exactly a weighted sample
    without replacement. Globally that is one
    ``orderBy(key).limit(k)`` — Spark plans TakeOrderedAndProject, a
    per-partition partial top-k with no full sort or shuffle of the data
    (plan-asserted); with ``group_cols`` it delegates to
    ``ranking.grouped_topk`` over the arrival time (k per group,
    inheriting its determinism contract and hot-group analysis).
    Zero-weight rows are never sampled; null or negative weights RAISE
    (in-plan, riding the same scan — no validation pre-pass); null-key
    rows are EXCLUDED (they all hash identically, so no deterministic
    draw exists for them). Vary ``salt`` for independent redraws;
    identical (key, salt) always redraws identically.

    Determinism precondition: ``key_col`` values must be unique — rows
    sharing a key share an arrival time, and which physical row fills a
    tied k-th slot is then partition-order-dependent (their payloads may
    differ even though the draw treats them as one). The secondary sort
    on the key itself makes everything else a total order, hash
    collisions included.

    ``hash_fn``: ``'xxhash64'`` (default — cheapest) or ``'md5'``, the
    engine-portable 32-bit md5-prefix hash the rest of the deterministic-
    sampling family uses — pick it when another engine (the DuckDB oracle,
    a warehouse job) must reproduce the exact draw.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    if hash_fn not in ("xxhash64", "md5"):
        raise ValueError(f"hash_fn must be xxhash64|md5, got {hash_fn!r}")
    for c in (key_col, weight_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} missing from the frame")
    reserved = {"__aes_key", "__aes_rn", "rank"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"input carries reserved column(s) {sorted(reserved)} — rename them"
        )
    arrival = aes_arrival(key_col, weight_col, salt, hash_fn, "weighted_sample_k")
    keyed = (
        df.where(F.col(key_col).isNotNull())
        .withColumn("__aes_key", arrival)
        .where(F.col("__aes_key").isNotNull())
    )
    if group_cols is None:
        # secondary sort on the key: total order for distinct keys even
        # under a hash collision
        return keyed.orderBy("__aes_key", key_col).limit(k).drop("__aes_key")
    from oni_ml_spark.datapipe.ranking import grouped_topk

    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    return grouped_topk(
        keyed, groups, "__aes_key", k, ascending=True, tie_col=key_col
    ).drop("__aes_key", "rank")


def select_to_token_budget(
    df: DataFrame,
    tokens_col: str,
    budget: int,
    quality_col: str,
    id_col: str,
    n_buckets: int = 1000,
    boundary: str = "exact",
    max_boundary_rows: int = 10_000_000,
) -> DataFrame:
    """Greedy corpus selection to a global token budget: take documents in
    descending ``quality_col`` order (ties broken by ``xxhash64(id)`` —
    deterministic, engine-portable) while the running token total stays
    ≤ ``budget`` — the standard "best N tokens of the crawl" construction
    step.

    A naive implementation is one UNPARTITIONED running-sum window over
    the whole corpus — the single-reducer scale-killer. This one never
    globally sorts: quality is cut into ``n_buckets`` equi-width buckets,
    ONE bounded aggregate gives each bucket's token total, the driver
    cumsums those ≤n_buckets rows to find the boundary bucket, whole
    buckets above it are selected with a pure filter, and only the
    boundary bucket's rows — expected corpus/n_buckets of them, VALIDATED
    against ``max_boundary_rows`` — pass through the exact running-sum
    window. ``boundary='drop'`` skips even that (whole-bucket
    granularity: stays under budget, no window anywhere).

    A document is selected iff the running total INCLUDING it is ≤
    budget — greedy PREFIX semantics (the first overflowing document and
    everything after it are excluded), not knapsack back-filling; the
    DuckDB prefix-cumsum oracle states the contract exactly. ``id_col``
    must be unique and non-null (it is the deterministic tie-break; null
    raises in-plan on the boundary slice). Null/negative tokens and
    null/NaN/infinite quality raise in-plan
    on the bucket scan. Heavily tied quality values concentrate in one
    bucket — if the boundary bucket exceeds ``max_boundary_rows`` the
    call refuses with sizing advice rather than silently building a
    giant window.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    if boundary not in ("exact", "drop"):
        raise ValueError(f"boundary must be exact|drop, got {boundary!r}")
    for c in (tokens_col, quality_col, id_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} missing from the frame")
    reserved = {
        "__tb_bucket", "__tb_tokens", "__tb_q", "__tb_h", "__tb_run"
    } & set(df.columns)
    if reserved:
        raise ValueError(
            f"input carries reserved column(s) {sorted(reserved)} — rename them"
        )
    qc = F.col(quality_col).cast("double")
    tc = F.col(tokens_col).cast("double")
    inf = float("inf")
    # non-finite quality would make the bucket width infinite and collapse
    # the whole corpus into bucket 0 — i.e. silently reintroduce the global
    # window this function exists to avoid
    guard_q = F.when(
        qc.isNull() | F.isnan(qc) | (qc == inf) | (qc == -inf),
        F.raise_error(
            F.lit(f"select_to_token_budget: null/NaN/infinite {quality_col}")
        ),
    ).otherwise(qc)
    guard_t = F.when(
        tc.isNull() | F.isnan(tc) | (tc < 0),
        F.raise_error(F.lit(f"select_to_token_budget: null/NaN/negative {tokens_col}")),
    ).otherwise(tc)

    stats = df.agg(
        F.min(guard_q).alias("lo"), F.max(guard_q).alias("hi")
    ).collect()[0]
    if stats["lo"] is None:
        return df  # empty frame: nothing to select
    lo, hi = float(stats["lo"]), float(stats["hi"])
    width = (hi - lo) / n_buckets if hi > lo else 1.0
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.greatest(F.lit(0), F.floor((guard_q - F.lit(lo)) / F.lit(width)).cast("int")),
    )
    with_b = df.withColumn("__tb_bucket", bucket).withColumn("__tb_tokens", guard_t)
    per_bucket = {
        r["__tb_bucket"]: (float(r["toks"]), int(r["n"]))
        for r in with_b.groupBy("__tb_bucket")
        .agg(F.sum("__tb_tokens").alias("toks"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    running = 0.0
    boundary_bucket = None
    full_from = n_buckets  # select buckets with index >= this
    for b in sorted(per_bucket, reverse=True):  # highest quality first
        toks, _n = per_bucket[b]
        if running + toks <= budget:
            running += toks
            full_from = b
        else:
            boundary_bucket = b
            break
    selected = with_b.where(F.col("__tb_bucket") >= full_from)
    if boundary_bucket is not None and boundary == "exact":
        n_boundary = per_bucket[boundary_bucket][1]
        if n_boundary > max_boundary_rows:
            raise ValueError(
                f"boundary bucket holds {n_boundary} rows "
                f"(> max_boundary_rows={max_boundary_rows}) — the quality "
                "distribution is heavily tied there; raise n_buckets, use "
                "boundary='drop', or raise max_boundary_rows explicitly"
            )
        remaining = budget - running
        w = (
            Window.orderBy(
                F.col("__tb_q").desc(), F.col("__tb_h").asc()
            ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        # a null id hashes to the constant seed and breaks the total order
        # the tie-break relies on; ids must also be UNIQUE (documented) —
        # duplicate ids make the cut inside a (quality, hash) tie group
        # partition-order-dependent
        tie_hash = F.when(
            F.col(id_col).isNull(),
            F.raise_error(F.lit(f"select_to_token_budget: null {id_col}")),
        ).otherwise(F.xxhash64(F.col(id_col)))
        edge = (
            with_b.where(F.col("__tb_bucket") == boundary_bucket)
            .withColumn("__tb_q", guard_q)
            .withColumn("__tb_h", tie_hash)
            .withColumn("__tb_run", F.sum("__tb_tokens").over(w))
            .where(F.col("__tb_run") <= remaining)
            .drop("__tb_q", "__tb_h", "__tb_run")
        )
        selected = selected.unionByName(edge)
    return selected.drop("__tb_bucket", "__tb_tokens")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    key_col: str | None = None,
) -> DataFrame:
    """Per-stratum sampling with a chosen fraction per value of
    ``strata_col`` — the class-rebalancing operator (downsample the dominant
    language / source / label before training).

    With ``key_col`` the sample is DETERMINISTIC: a row is kept iff its
    key's hash bucket falls under the stratum's fraction (same rows every
    run, any engine). The hash is SALTED with an operator tag so composing
    with hash_split on the same key stays independent — an unsalted shared
    hash would make a 10% sample land entirely inside the first split.
    Without a key column it falls back to Spark's seeded ``sampleBy``
    (Bernoulli per row, fast but only run-stable, not engine-portable).
    """
    if key_col is not None:
        if not fractions:
            return df.filter(F.lit(False))
        salted = F.concat(F.col(key_col).cast("string"), F.lit("#stratified"))
        b = hash_bucket(salted, 10_000)
        thresh = None
        for value, frac in fractions.items():
            cut = int(round(float(frac) * 10_000))
            cond = F.col(strata_col) == value
            thresh = F.when(cond, cut) if thresh is None else thresh.when(cond, cut)
        # strata absent from `fractions` are dropped entirely (sampleBy parity)
        return df.filter(b < F.coalesce(thresh, F.lit(0)))
    return df.sampleBy(strata_col, {k: float(v) for k, v in fractions.items()}, seed=7)


def anti_join_dedup(
    new_docs: DataFrame,
    existing: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Incremental corpus dedup: keep only new docs whose normalized-text
    fingerprint is absent from the existing corpus (left anti join on the
    digest — the shuffle key is 32 bytes, not the document)."""
    new_k = new_docs.withColumn("__fp", F.md5(normalize_text(text_col)))
    old_k = existing.select(F.md5(normalize_text(text_col)).alias("__fp")).distinct()
    return new_k.join(old_k, "__fp", "left_anti").drop("__fp")


def deterministic_k_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int,
) -> DataFrame:
    """Exactly min(k, |group|) rows per group, chosen by md5-hash rank of
    the key — a uniform-ish sample that is IDENTICAL on every run and
    engine (the property random sampling and LIMIT both lack), the
    per-group sibling of ``hash_split``.

    Window partitioned by group (parallelism = |groups|; rank stops early
    per partition), hash salted with an operator tag so composing with
    hash_split / stratified_sample on the same key stays independent.
    Ties broken by the key itself for full determinism on hash collisions.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    salted = F.concat(F.col(key_col).cast("string"), F.lit("#ksample"))
    h = hash_bucket(salted, 1 << 62)
    w = Window.partitionBy(group_col).orderBy(h, F.col(key_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def weighted_mix(
    df: DataFrame,
    source_col: str,
    key_col: str,
    weights: dict[str, float],
    total_rows: int,
    copy_col: str = "epoch",
    validate_sources: bool = True,
) -> DataFrame:
    """Deterministic weighted mixture resampling — the dataset-mixing
    operator of a training pipeline: resample a multi-source corpus so each
    source contributes ~``total_rows * weight/Σweights`` rows, UPSAMPLING
    (deterministic repetition with an epoch index) sources below their
    target and downsampling those above.

    Per source s: target_s = total_rows·w_s/Σw, rate_s = target_s/n_s.
    Every row emits copies 1..ceil(rate); copy i survives iff
    i <= floor(rate), or i == ceil(rate) and the full 32-bit md5 hash of
    (key, '#mix', i) falls under fraction·2³² — so the expected count
    matches target_s to within 2⁻³² per row (a coarser bucket grid would
    quantize the keep probability and bias large sources upward), the
    variance is binomial in the fraction only, and the SAME rows+epochs
    come back on any engine or rerun (portable md5 arithmetic, no RNG).
    Sources absent from ``weights`` are dropped.

    Per-source counts are an in-plan |sources|-row aggregate joined back
    (AQE broadcasts it); the fan-out is explode(sequence), so map output
    is bounded by the target mixture size, not by max(rate)·corpus.

    A source named in ``weights`` but ABSENT from the input would silently
    lose its entire target mass (the mixture totals less than
    ``total_rows``), skewing a training mix unnoticed — so by default the
    function eagerly checks presence (one bounded aggregate over the pruned
    source column, ≤ |weights| rows collected) and warns. Pass
    ``validate_sources=False`` to skip the extra scan in tight loops where
    the source set is known.
    """
    import warnings
    if total_rows <= 0:
        raise ValueError("total_rows must be positive")
    if copy_col in df.columns:
        raise ValueError(
            f"copy_col '{copy_col}' already exists in the input — pass a "
            "different name (withColumn would silently overwrite it)"
        )
    if not weights:
        return df.filter(F.lit(False)).withColumn(copy_col, F.lit(1))
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("weights must sum to a positive value")
    targets = {s: float(total_rows) * float(w) / wsum for s, w in weights.items()}
    if validate_sources:
        present = {
            r[0]
            for r in df.select(source_col)
            .where(F.col(source_col).isin(*weights))
            .distinct()
            .collect()
        }
        missing = sorted(set(weights) - present)
        if missing:
            warnings.warn(
                f"weighted_mix: weighted sources absent from input "
                f"{missing} — their target mass is lost and the mixture "
                f"will total less than total_rows={total_rows}",
                RuntimeWarning,
                stacklevel=2,
            )
    tmap = F.create_map(
        *[lit for s, t in targets.items() for lit in (F.lit(s), F.lit(t))]
    )
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n_s"))
    rate = F.element_at(tmap, F.col(source_col)) / F.col("__n_s")
    j = (
        df.join(counts, source_col)
        .withColumn("__rate", rate)
        .filter(F.col("__rate") > 0)  # also drops sources not in `weights`
    )
    copies = j.withColumn(
        copy_col,
        F.explode(F.sequence(F.lit(1), F.ceil("__rate").cast("int"))),
    )
    frac = F.col("__rate") - F.floor("__rate")
    salted = F.concat(
        F.col(key_col).cast("string"), F.lit("#mix"), F.col(copy_col).cast("string")
    )
    keep = (F.col(copy_col) <= F.floor("__rate")) | (
        (F.col(copy_col) == F.ceil("__rate"))
        # full 32-bit hash (uniform: conv of 8 hex chars is exactly [0, 2^32))
        & (hash_bucket(salted, 1 << 32) < frac * float(1 << 32))
    )
    return copies.filter(keep).drop("__n_s", "__rate")


def temperature_weights(
    df: DataFrame,
    source_col: str,
    alpha: float = 0.3,
    total_rows: int | None = None,
) -> DataFrame:
    """Per-source sampling weights by exponential smoothing — the standard
    multilingual/multi-source rebalancing rule (sample source s with
    probability ∝ n_s^alpha; alpha=1 keeps natural proportions, alpha=0 is
    uniform, alpha≈0.3 is the published multilingual-LM compromise that
    upweights low-resource sources without drowning high-resource ones —
    Lample & Conneau 2019 §3.1, the mBERT sampling note).

    Returns (source, n_rows, weight, fraction[, target_rows]) — one row per
    source, fully lazy: counts are ONE aggregate, the normalizing sum is an
    in-plan 1-row broadcast (key_skew_profile's pattern), weight = n^alpha.
    ``total_rows`` adds target_rows = round(fraction * total_rows), the
    per-source budget a ``weighted_mix`` call would aim at.
    """
    if alpha < 0:
        raise ValueError("alpha must be non-negative")
    if source_col not in df.columns:
        raise ValueError(f"column '{source_col}' not in input")
    counts = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    weighted = counts.withColumn(
        "weight", F.pow(F.col("n_rows").cast("double"), F.lit(float(alpha)))
    )
    total = weighted.agg(F.sum("weight").alias("__wsum"))
    out = weighted.crossJoin(F.broadcast(total)).select(
        "source",
        "n_rows",
        "weight",
        (F.col("weight") / F.col("__wsum")).alias("fraction"),
    )
    if total_rows is not None:
        if total_rows <= 0:
            raise ValueError("total_rows must be positive")
        out = out.withColumn(
            "target_rows",
            F.round(F.col("fraction") * total_rows, 0).cast("long"),
        )
    return out


def temperature_mix(
    df: DataFrame,
    source_col: str,
    key_col: str,
    total_rows: int,
    alpha: float = 0.3,
    copy_col: str = "epoch",
) -> DataFrame:
    """``temperature_weights`` composed with ``weighted_mix``: resample the
    corpus so source s contributes ~total_rows · n_s^alpha / Σ n^alpha rows
    (deterministic md5 thinning/repetition, epoch column for upsampled
    copies). The weights frame is |sources| rows — the one bounded collect
    here ships that row-per-source table to the driver to parameterize the
    mix, the same bounded-collect contract as weighted_mix's own
    validation.

    Null-source rows cannot key ``weighted_mix``'s literal weight map and
    are EXCLUDED from the mixture AND from the normalizing sum — the
    Σ n^alpha above ranges over non-null sources only, so the realized
    per-source counts match ``temperature_weights(df.filter(source IS NOT
    NULL), ...)``'s target_rows exactly and the mixture still totals
    ``total_rows``. (Normalizing over a group the mix then drops would
    silently redistribute the null mass and make every reported target a
    lie.) Run ``temperature_weights`` on the unfiltered frame first if you
    need the null group's size reported."""
    nn = df.filter(F.col(source_col).isNotNull())
    w = {
        r["source"]: r["weight"]
        for r in temperature_weights(nn, source_col, alpha).collect()
    }
    # sources were just read from the input — skip weighted_mix's eager
    # presence re-check
    return weighted_mix(
        nn, source_col, key_col, w, total_rows,
        copy_col=copy_col, validate_sources=False,
    )


def match_distribution(
    df: DataFrame,
    ref: DataFrame,
    key_col: str,
    value_col: str,
    edges: list[float],
    *,
    salt: str = "#dmatch",
) -> tuple[DataFrame, DataFrame]:
    """Subsample ``df`` so ``value_col``'s binned distribution matches a
    REFERENCE corpus's, keeping as much data as possible — the importance
    resampler for "make the new crawl's length/quality mix look like the
    vetted corpus" (rejection sampling against the reference shape).

    Per bin b: ratio_b = p_ref(b) / p_cur(b); acceptance rate
    r_b = ratio_b / max_c ratio_c (so the most under-represented bin keeps
    EVERYTHING — maximum retention for an exact shape match in
    expectation); a row is kept when md5_u32(key||salt)/2³² < r_b — the
    deterministic draw, identical on any engine/run.  Bins absent from the
    reference get rate 0 (their rows don't exist in the target shape);
    the null/NaN bin (-1) participates like any other.  An empty reference
    raises in-plan.

    Plan: ONE bounded histogram aggregate per side (|edges|+2 rows,
    drift.binned_counts), rates derived via windows over those bounded
    rows, broadcast back into a single filter projection over ``df`` —
    the corpus is scanned twice total (once for its histogram, once for
    the filtered output), nothing is collected.

    Returns (kept, rates): the surviving rows (original columns) and the
    per-bin (bin, n_ref, n_cur, rate) table for reporting."""
    from oni_ml_spark.datapipe.drift import _bin_expr, binned_counts

    hist = (
        binned_counts(df, value_col, edges, "cur")
        .join(binned_counts(ref, value_col, edges, "ref"), "bin", "full_outer")
        .select(
            "bin",
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        )
    )
    # windows over the |edges|+2-row histogram — bounded, never data-sized
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ratio = F.when(
        (F.col("n_cur") > 0) & (F.col("n_ref") > 0),
        (F.col("n_ref").cast("double") * F.col("__Ncur").cast("double"))
        / (F.col("n_cur").cast("double") * F.col("__Nref").cast("double")),
    )
    rates = (
        hist.withColumn("__Ncur", F.sum("n_cur").over(w_all))
        .withColumn("__Nref", F.sum("n_ref").over(w_all))
        .withColumn("__ratio", ratio)
        # guard on the MAX, not the totals: a null max means no bin is
        # populated on both sides — an empty reference OR disjoint
        # supports, and either way there is no shape to match (guarding
        # the totals alone would be pruned away: the ratio branch never
        # evaluates them when every row short-circuits false)
        .withColumn(
            "rate",
            F.when(
                F.max("__ratio").over(w_all).isNull(),
                F.raise_error(
                    F.lit(
                        "match_distribution: reference is empty or shares no "
                        "populated bin with the corpus"
                    )
                ),
            ).otherwise(
                F.coalesce(F.col("__ratio") / F.max("__ratio").over(w_all), F.lit(0.0))
            ),
        )
        .select("bin", "n_ref", "n_cur", "rate")
    )
    # a NULL key has no deterministic draw — refuse in-plan (the sibling
    # weighted samplers' convention), never silently drop the row
    key_ok = F.assert_true(
        F.col(key_col).isNotNull(),
        F.lit(f"match_distribution: NULL {key_col} — keys must be non-null"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.when(key_ok.isNull(), F.col(key_col)).cast("string"),
                        F.lit(salt),
                    )
                ),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    kept = (
        df.withColumn("__b", _bin_expr(value_col, edges))
        .join(
            F.broadcast(
                rates.select(F.col("bin").alias("__b"), F.col("rate").alias("__rate"))
            ),
            "__b",
        )
        .where(u < F.col("__rate"))
        .drop("__b", "__rate")
    )
    return kept, rates


def deterministic_shuffle(
    df: DataFrame, key_col: str, seed: str | int = 0
) -> DataFrame:
    """Global pseudo-random ordering that is identical on every run and
    engine — the final "shuffle the training data" step, md5-keyed like
    every sampler here (no RNG, no partition-order dependence).

    orderBy on the salted digest is a range-partitioned sort: Spark samples
    boundaries and sorts within partitions, so downstream writes preserve
    the order per output file. Different ``seed`` values give independent
    permutations (epoch reshuffling: seed=epoch number). Ties (md5
    collisions) break on the key itself for full determinism.
    """
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(f"#shuffle{seed}")))
    return df.orderBy(h, F.col(key_col))


def deterministic_global_sample(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Exactly min(k, |df|) rows, chosen by salted md5 rank of the key —
    the global sibling of ``deterministic_k_sample``: identical selection
    on every run and engine, for eval-slice carving and debugging samples.

    Planned as TakeOrderedAndProject (each partition keeps its local top-k,
    the driver merges k·partitions candidates) — NOT a global sort and NOT
    a single-partition row_number window, so it scales with k, not N.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    salted = F.concat(F.col(key_col).cast("string"), F.lit("#gsample"))
    h = hash_bucket(salted, 1 << 62)
    return df.orderBy(h, F.col(key_col)).limit(k)


def assign_contiguous_ids(
    df: DataFrame,
    key_col: str,
    id_name: str = "row_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add 0..N-1 contiguous row ids in ``key_col`` order — the sharding /
    sample-index primitive (map a corpus onto training steps, address rows
    by position) that RDD code did with zipWithIndex.

    Scalable formulation with NO global single-partition window:

    1. range-repartition by key and sort within partitions (equal keys — a
       rejected input, see below — would co-locate, so the adjacency check
       in step 3 is complete);
    2. count rows per partition (one bounded collect: one row PER
       PARTITION, never per row) and prefix-sum the offsets on the driver;
    3. an Arrow-batched ``mapInPandas`` adds offset[pid] + local position,
       raising on adjacent duplicate keys (duplicate keys would make the
       ordering, and therefore every downstream shard, nondeterministic).

    The result is exactly "rank of key in global key order", independent of
    where the range partitioner happens to place boundaries — but the
    counts job and the id job MUST see the SAME boundaries, so the ranged
    frame is pinned with cache() for the duration of the two jobs (released
    via unpersist() before returning; the returned frame re-derives from
    lineage).
    """
    from collections.abc import Iterator

    import pandas as pd

    from pyspark import TaskContext
    from pyspark.sql import types as T

    if id_name in df.columns:
        raise ValueError(f"column '{id_name}' already exists in the input")
    spark = df.sparkSession
    n_parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    ranged = (
        df.repartitionByRange(n_parts, F.col(key_col))
        .sortWithinPartitions(key_col)
        .cache()
    )
    try:
        counts = {
            r["pid"]: r["n"]
            for r in ranged.groupBy(
                F.spark_partition_id().alias("pid")
            ).agg(F.count(F.lit(1)).alias("n")).collect()
        }
        offsets: dict[int, int] = {}
        acc = 0
        for pid in range(max(counts) + 1 if counts else 0):
            offsets[pid] = acc
            acc += counts.get(pid, 0)

        out_schema = T.StructType(
            list(df.schema.fields) + [T.StructField(id_name, T.LongType(), False)]
        )

        # distinct sentinel, NOT None: for object-dtype keys a genuine null
        # key arrives as Python None, and a None sentinel would make two
        # null-key rows straddling a batch boundary skip the adjacency
        # check and get silently nondeterministic ids
        _unset = object()

        def add_ids(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            pid = TaskContext.get().partitionId()
            pos = offsets.get(pid, 0)
            prev_key = _unset
            for pdf in batches:
                keys = pdf[key_col]
                if len(keys):
                    k0 = keys.iloc[0]
                    # NaN == NaN is False, so a NaN/None dup straddling a
                    # batch boundary needs the explicit isna pair check
                    both_na = (
                        prev_key is not _unset
                        and pd.isna(prev_key) and pd.isna(k0)
                    )
                    if prev_key is not _unset and (
                        both_na or (not pd.isna(k0) and prev_key == k0)
                    ):
                        raise ValueError(
                            f"assign_contiguous_ids: duplicate key {k0!r} — "
                            "ids would be nondeterministic"
                        )
                    dup = keys[keys.duplicated()]
                    if len(dup):
                        raise ValueError(
                            f"assign_contiguous_ids: duplicate key "
                            f"{dup.iloc[0]!r} — ids would be nondeterministic"
                        )
                    prev_key = keys.iloc[-1]
                out = pdf.copy()
                out[id_name] = range(pos, pos + len(pdf))
                pos += len(pdf)
                yield out

        result = ranged.mapInPandas(add_ids, out_schema)
        # materialize while the boundary pin is alive: the ids are
        # boundary-independent (= global key rank), but the offsets map was
        # computed against THIS cached partitioning
        result = result.localCheckpoint()
        return result
    finally:
        ranged.unpersist()


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: list[str] | str,
    allow_insert: bool = True,
) -> DataFrame:
    """Keyed upsert (the MERGE INTO of a table-format-less pipeline):
    rows of ``base`` whose key appears in ``updates`` are REPLACED by the
    update row; unmatched update rows are appended (``allow_insert=True``)
    or dropped. Returns the merged frame — write it back with
    ``mode("overwrite")`` to a NEW path (parquet has no in-place update;
    for transactional upserts use a table format).

    Plan shape: one left-anti join of base against the distinct update
    keys (shuffle on the key only) + a union — no window, no full outer
    join carrying both payloads. ``updates`` must be key-unique AND
    key-non-null: duplicate update keys would make the surviving row
    nondeterministic, and a null update key can never equi-match a base
    row (SQL null != null), so both are rejected with one bounded
    aggregate (count, null-key count, and distinct count in one pass)
    before any work runs. Null-key rows in ``base`` are well-defined: they
    cannot match any (non-null) update key, so they always survive
    unchanged — MERGE-on-a-null-key semantics in every SQL engine.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")
    missing = [c for c in keys if c not in base.columns or c not in updates.columns]
    if missing:
        raise ValueError(f"key columns absent from one side: {missing}")
    if sorted(base.columns) != sorted(updates.columns):
        raise ValueError(
            "base and updates must share one schema "
            f"(base {sorted(base.columns)} vs updates {sorted(updates.columns)})"
        )
    null_key = F.greatest(*[F.col(c).isNull().cast("int") for c in keys]) if len(keys) > 1 \
        else F.col(keys[0]).isNull().cast("int")
    stats = updates.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(null_key).alias("nulls"),
        F.count_distinct(*[F.col(c) for c in keys]).alias("nd"),
    ).collect()[0]
    if stats["nulls"]:
        raise ValueError(
            f"updates contain {stats['nulls']} row(s) with a null key — a "
            "null key can never match a base row (SQL null != null); drop "
            "or key those rows before merging"
        )
    dup = stats["n"] - stats["nd"]
    if dup:
        raise ValueError(
            f"updates contain {dup} duplicate key row(s) — the surviving row "
            "would be nondeterministic; dedupe updates first"
        )
    kept = base.join(updates.select(*keys).distinct(), keys, "left_anti")
    upd = updates if allow_insert else updates.join(
        base.select(*keys).distinct(), keys, "left_semi"
    )
    return kept.unionByName(upd)


def shard_positions(
    df: DataFrame,
    id_name: str,
    shard_size: int,
    shard_name: str = "shard",
    pos_name: str | None = "shard_pos",
) -> DataFrame:
    """Derive the training-shard layout from contiguous ids — the exact
    arithmetic ``write_training_shards`` uses for its directory split,
    exposed as a lazy projection: ``shard = id div shard_size`` and
    (optionally) ``pos = id mod shard_size``, the sample's position within
    its shard. Pure codegen over non-negative contiguous ids; shard K holds
    samples [K*shard_size, (K+1)*shard_size) with positions 0..shard_size-1.
    """
    if shard_size <= 0:
        raise ValueError("shard_size must be positive")
    if id_name not in df.columns:
        raise ValueError(f"column '{id_name}' not in input")
    for c in (shard_name, pos_name):
        if c is not None and c in df.columns:
            raise ValueError(f"column '{c}' already exists in the input")
    # SQL `div` keeps the quotient in integer arithmetic end to end — `/`
    # would round-trip through double and mis-shard ids beyond 2^53 (same
    # >2^53 exactness contract as ranking's order columns)
    out = df.withColumn(
        shard_name,
        F.expr(f"`{id_name}` div {int(shard_size)}").cast("long"),
    )
    if pos_name is not None:
        out = out.withColumn(pos_name, (F.col(id_name) % shard_size).cast("long"))
    return out


def write_training_shards(
    df: DataFrame,
    key_col: str,
    out_dir: str,
    shard_size: int,
    id_name: str = "sample_idx",
    manifest: bool = True,
) -> int:
    """Export a corpus as deterministic, position-addressable training
    shards: contiguous 0..N-1 sample indexes in ``key_col`` order
    (``assign_contiguous_ids``), sharded as ``shard=K`` partition
    directories of exactly ``shard_size`` samples each (the last shard
    holds the remainder). Returns the shard count.

    A training job can then map global step*batch ranges onto shard files
    arithmetically — shard K holds samples [K*shard_size, (K+1)*shard_size)
    — and the layout is identical on every run and cluster because both
    the index assignment and the shard split are pure functions of the key
    order. Each shard directory is written by the tasks holding its rows
    (partitionBy on the derived shard column); Hive-partition discovery
    prunes to the shards a reader asks for.

    Deterministic-shuffle recipe: pass a ``deterministic_shuffle``-style
    hash column as ``key_col`` to get stable pseudo-random sample order
    instead of key order.

    ``manifest=True`` (default) also writes ``<out_dir>/_shard_manifest``
    — one row per shard: (shard, n_rows, idx_lo, idx_hi, ids_digest), the
    digest an order-independent bit_xor of xxhash64(sample_idx). A
    consumer can then ``verify_training_shards`` an export — count, index
    range, and membership per shard — by reading only the index column,
    never the payloads; at 100 TB that is the difference between an
    integrity check and a second export. The summary is computed from a
    READ-BACK of the written files' (shard, index) columns — a
    column-pruned scan, NOT a re-execution of the id-assignment pipeline
    (the sharded frame is bare lineage after the write; aggregating it
    would repeat the range shuffle + sort over the whole corpus) — which
    also means the manifest digests what is actually on disk, not what
    the writer intended. The shard count returns from the same read.
    """
    if shard_size <= 0:
        raise ValueError("shard_size must be positive")
    if "shard" in df.columns:
        raise ValueError(
            "column 'shard' already exists in the input — the export would "
            "silently overwrite it and move it into the directory layout"
        )
    with_ids = assign_contiguous_ids(df, key_col, id_name=id_name)
    sharded = shard_positions(
        with_ids, id_name, shard_size, shard_name="shard", pos_name=None
    )
    # partitionOverwriteMode=static per-write: under a session-level
    # "dynamic" setting, overwrite would only replace the shard=K dirs this
    # export produces — stale shards from a previous LARGER export would
    # survive, and the manifest read-back below would certify them as valid
    # data. Static overwrite truncates the whole out_dir first.
    sharded.write.mode("overwrite").option(
        "partitionOverwriteMode", "static"
    ).partitionBy("shard").parquet(out_dir)
    spark = df.sparkSession
    try:
        back = spark.read.parquet(out_dir).select("shard", id_name)
    except Exception:
        # empty input: partitionBy wrote no files, the directory has no
        # readable schema — zero shards, nothing to digest
        return 0
    if manifest:
        # shard_size is recorded in the manifest (constant column): it is
        # NOT derivable from a single partial shard, and append's layout
        # check would be vacuous without it (a one-shard export satisfies
        # idx_lo = shard*size for EVERY size)
        _shard_summary(back, id_name).withColumn(
            "shard_size", F.lit(int(shard_size)).cast("long")
        ).write.mode("overwrite").parquet(f"{out_dir}/_shard_manifest")
    n = back.agg(F.max("shard")).collect()[0][0]
    return int(n) + 1 if n is not None else 0


def _shard_summary(sharded: DataFrame, id_name: str) -> DataFrame:
    """(shard, n_rows, idx_lo, idx_hi, ids_digest) per shard — the digest
    is bit_xor(xxhash64(idx)): commutative (task order free), no overflow
    semantics to trip ANSI mode, and any single missing/extra/duplicated
    index flips it."""
    return sharded.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(id_name).alias("idx_lo"),
        F.max(id_name).alias("idx_hi"),
        F.bit_xor(F.xxhash64(F.col(id_name))).alias("ids_digest"),
    )


def append_training_shards(
    df: DataFrame,
    key_col: str,
    out_dir: str,
    shard_size: int,
    id_name: str = "sample_idx",
) -> int:
    """Append an ingest batch to an existing ``write_training_shards``
    export WITHOUT re-exporting the corpus: the batch's samples get
    indexes continuing from the manifest's max (batch-internal key order),
    the last partial shard fills up in place (parquet append into its
    ``shard=K`` directory), new shards extend the range, and the manifest
    is refreshed by re-summarizing ONLY the affected shards — partition
    pruning keeps the re-read to shards >= the first touched one, so a
    daily append to a 100 TB export reads one partial shard plus what it
    wrote, not the archive. Returns the new shard count.

    Contracts, each checked up front: ``shard_size`` must equal the
    export's (read from the manifest's recorded shard_size — the idx
    invariant alone is vacuous for a single-shard export; legacy
    manifests without the column fall back to it); the batch schema must
    match the export's by column NAMES AND TYPES (a same-named int column
    appended into a bigint export corrupts parquet reads); the tail
    shards on disk must MATCH the manifest before anything is written —
    a mismatch means a previous append crashed between its data write and
    its manifest refresh, and blindly retrying would assign the orphaned
    index range AGAIN (duplicate sample indexes the refreshed-from-disk
    manifest would then certify as clean). Global sample order is
    "export order, then batch key order" — deterministic for a fixed
    SEQUENCE of batches, the replay contract an incremental pipeline
    needs. Cross-batch duplicate keys are NOT detected (that would
    require reading every archived key); dedupe upstream
    (``anti_join_dedup`` against the export's key column, or an
    exact-digest ledger).
    """
    if shard_size <= 0:
        raise ValueError("shard_size must be positive")
    spark = df.sparkSession
    try:
        man = spark.read.parquet(f"{out_dir}/_shard_manifest")
    except Exception as exc:
        raise ValueError(
            f"no readable manifest at {out_dir}/_shard_manifest — "
            "append_training_shards needs a write_training_shards(manifest="
            "True) export to extend"
        ) from exc
    if "shard_size" in man.columns:
        sizes = [r[0] for r in man.select("shard_size").distinct().collect()]
        if sizes and sizes != [shard_size]:
            raise ValueError(
                f"shard_size={shard_size} does not match the existing "
                f"export's recorded shard_size={sizes}"
            )
    else:
        # legacy manifest without the recorded size: the idx invariant is
        # the best available check (vacuous only for single-shard exports)
        bad = man.filter(
            F.col("idx_lo") != F.col("shard").cast("long") * shard_size
        ).count()
        if bad:
            raise ValueError(
                f"shard_size={shard_size} does not match the existing "
                f"export's layout ({bad} shard(s) violate idx_lo = "
                "shard*shard_size)"
            )
    start_row = man.agg(F.max("idx_hi").alias("hi")).collect()[0]
    start = int(start_row["hi"]) + 1 if start_row["hi"] is not None else 0
    first_touched = start // shard_size

    # crash-orphan check BEFORE writing: the on-disk tail must equal the
    # manifest's view of it (bounded: the partition-pruned read covers the
    # one partial shard plus any orphan dirs beyond it)
    man_cols = ("n_rows", "idx_lo", "idx_hi", "ids_digest")
    disk_tail = {
        r["shard"]: tuple(r[c] for c in man_cols)
        for r in _shard_summary(
            spark.read.parquet(out_dir)
            .select("shard", id_name)
            .filter(F.col("shard") >= first_touched),
            id_name,
        ).collect()
    }
    man_tail = {
        r["shard"]: tuple(r[c] for c in man_cols)
        for r in man.filter(F.col("shard") >= first_touched).collect()
    }
    if disk_tail != man_tail:
        raise ValueError(
            f"export tail on disk does not match the manifest (disk shards "
            f"{sorted(disk_tail)} vs manifest {sorted(man_tail)}) — a "
            "previous append likely crashed between its data write and its "
            "manifest refresh; retrying would duplicate the orphaned index "
            "range. Repair first (remove the orphan rows, or rebuild the "
            "manifest deliberately after verifying indexes are unique)."
        )

    with_ids = assign_contiguous_ids(df, key_col, id_name=id_name)
    with_ids = with_ids.withColumn(id_name, F.col(id_name) + F.lit(start))
    sharded = shard_positions(
        with_ids, id_name, shard_size, shard_name="shard", pos_name=None
    )
    # names AND types; the partition column is excluded (directory-derived
    # on read, so its inferred type differs from the written long by design)
    batch_types = {c: t for c, t in sharded.dtypes if c != "shard"}
    export_types = {
        c: t for c, t in spark.read.parquet(out_dir).dtypes if c != "shard"
    }
    if batch_types != export_types:
        raise ValueError(
            f"batch schema {sorted(batch_types.items())} != export schema "
            f"{sorted(export_types.items())} — appending a different "
            "schema would corrupt the export"
        )
    sharded.write.mode("append").partitionBy("shard").parquet(out_dir)

    back = (
        spark.read.parquet(out_dir)
        .select("shard", id_name)
        .filter(F.col("shard") >= first_touched)
    )
    refreshed = _shard_summary(back, id_name)
    # the manifest is bounded (one row per shard) — pin the surviving old
    # rows BEFORE overwriting the files they are lazily read from
    kept = man.select("shard", *man_cols).filter(
        F.col("shard") < first_touched
    ).localCheckpoint()
    new_man = (
        kept.unionByName(refreshed)
        .withColumn("shard_size", F.lit(int(shard_size)).cast("long"))
        .localCheckpoint()
    )
    new_man.write.mode("overwrite").parquet(f"{out_dir}/_shard_manifest")
    n = new_man.agg(F.max("shard")).collect()[0][0]
    return int(n) + 1 if n is not None else 0


def verify_training_shards(spark, out_dir: str, id_name: str = "sample_idx") -> DataFrame:
    """Integrity-check a ``write_training_shards`` export against its
    manifest WITHOUT reading payload columns: re-derives each shard's
    (n_rows, idx_lo, idx_hi, ids_digest) from the index column only
    (column-pruned parquet scan) and full-outer joins the manifest.
    Returns the discrepancy frame — empty means the export is intact;
    rows carry (shard, ok, n_rows/idx_lo/idx_hi/ids_digest observed vs
    manifest) for every shard that is missing, extra, or corrupted.
    """
    data = spark.read.parquet(out_dir).select("shard", id_name)
    man = spark.read.parquet(f"{out_dir}/_shard_manifest")
    got = _shard_summary(data, id_name)
    m = man.select(
        "shard",
        *[F.col(c).alias(f"m_{c}") for c in ("n_rows", "idx_lo", "idx_hi", "ids_digest")],
    )
    joined = got.join(m, "shard", "full_outer")
    mismatch = (
        F.col("n_rows").isNull()
        | F.col("m_n_rows").isNull()
        | (F.col("n_rows") != F.col("m_n_rows"))
        | (F.col("idx_lo") != F.col("m_idx_lo"))
        | (F.col("idx_hi") != F.col("m_idx_hi"))
        | (F.col("ids_digest") != F.col("m_ids_digest"))
    )
    return joined.filter(mismatch)
