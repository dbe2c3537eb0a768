"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline — cross join + native array math
  + per-query window top-k. Cost O(Q·N); right answer, wrong scale.
- LSH-bucketed variant: sign-random-projection buckets computed with
  deterministic ±1 hyperplanes (seeded), then brute-force only within
  buckets — the scale path (candidates shrink by ~2^planes).
- IVF variant (``ivf_kmeans_topk``): coarse k-means quantization
  (ml.clustering.KMeans), probed search inside the query's nearest cells.
- near-duplicate pairs: exact all-pairs (test oracle only) and the banded
  SRP-bucketed composition (candidate buckets → exact verify) that replaces
  the O(N²) cross join at scale.
- incremental IVF maintenance (r9): ``assign_cells`` / ``ivf_append`` put
  ONLY the day's delta into the frozen-centroid index (O(delta) refresh),
  ``save_ivf_index`` / ``load_ivf_index`` persist it as crash-safe
  version directories, ``ivf_rebuild_due`` says when corpus drift
  warrants a re-fit.
- ``random_projection`` (r9): JL ±1 sign projection with an md5-parity
  matrix — seed-free, regenerable in plain SQL, the cheap dimensionality
  reduction in front of ANN/clustering.

All vector arithmetic is native zip_with/aggregate — JVM-side, no Python in
the row loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from oni_ml_spark.scoring import dot  # the engine's one native dot product


def as_double_array(c: Column | str) -> Column:
    v = F.col(c) if isinstance(c, str) else c
    return F.transform(v, lambda x: x.cast("double"))


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per query → (query_id, neighbor_id, sim, rank).

    The corpus side is broadcast when small; at scale, swap in
    ``lsh_bucketed_topk``. Ties broken by neighbor id for determinism.
    """
    # norms precomputed per side — each pair costs one dot product, not three
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("qv")
    ).withColumn("qn", norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_array(vec_col).alias("cv")
    ).withColumn("cn", norm(F.col("cv")))
    pairs = q.crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id"))
    sims = pairs.select(
        "query_id",
        "neighbor_id",
        (dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("sim"), "rank")
    )


def _hyperplanes(dim: int, planes: int, seed: int = 7) -> list[list[float]]:
    """Deterministic ±1 hyperplanes from md5 bits (reproducible across
    runs/engines). An LCG's low bit strictly alternates, which made every
    plane identical for even dims — md5 per (seed, plane, block) has no such
    correlation."""
    import hashlib

    out = []
    for p in range(planes):
        row: list[float] = []
        block = 0
        while len(row) < dim:
            digest = hashlib.md5(f"{seed}:{p}:{block}".encode()).digest()
            for byte in digest:
                for bit in range(8):
                    if len(row) >= dim:
                        break
                    row.append(1.0 if (byte >> bit) & 1 else -1.0)
            block += 1
        out.append(row)
    return out


def _checked_dim(vec_col: str, dim: int) -> Column:
    """Pass the vector through unchanged but raise at runtime if its length
    doesn't match the hyperplane dimension (assert_true returns NULL on
    success, raises on failure)."""
    v = F.col(vec_col)
    ok = F.assert_true(
        F.size(v) == dim,
        F.concat(
            F.lit(f"embedding length != dim={dim} (got "),
            F.size(v).cast("string"), F.lit(")"),
        ),
    )
    return F.when(ok.isNull(), v)


def _plane_lit(plane: list[float]) -> Column:
    """Array literal built from ONE parsed SQL expression instead of one
    py4j `lit` roundtrip per element — constructing 64 planes × 64 dims as
    individual lits costs several driver seconds; parsing is ~free. The `D`
    suffix keeps the elements DOUBLE (bare 1.0 parses as DECIMAL)."""
    return F.expr("array(" + ",".join(f"{x}D" for x in plane) + ")")


def srp_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-random-projection bucket id: bit p = sign(vec · plane_p)."""
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        bit = F.when(dot(vec, _plane_lit(plane)) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket.bitwiseOR(F.shiftleft(bit, p))
    return bucket


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    planes: int = 8,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: SRP-bucket both sides, join on bucket, rank within.

    The bucket join replaces the cross join — candidate count drops by
    ~2^planes for uniformly spread data. Recall is approximate (neighbors in
    adjacent buckets are missed); raise recall with multi-probe or fewer
    planes. Returns the same shape as brute_force_topk.

    ``dim`` must match the embedding length: hyperplanes are generated
    driver-side, and inferring the length would cost a `.first()` action
    inside a library function.
    """
    hp = _hyperplanes(dim, planes, seed)
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("qv")
    ).withColumn("qv", _checked_dim("qv", dim)).withColumn(
        "bucket", srp_bucket(F.col("qv"), hp)
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_array(vec_col).alias("cv")
    ).withColumn("cv", _checked_dim("cv", dim)).withColumn(
        "bucket", srp_bucket(F.col("cv"), hp)
    )
    pairs = q.join(c, "bucket").filter(F.col("query_id") != F.col("neighbor_id"))
    sims = pairs.select(
        "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("sim"), "rank")
    )


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Pairs (a < b) with cosine >= threshold — embedding-space near-dup.

    Exact all-pairs — O(N²), the TEST ORACLE for
    ``embedding_near_duplicates_bucketed``, not a production path. Anything
    beyond ~10^4 vectors goes through the bucketed composition.
    """
    a = df.select(
        F.col(id_col).alias("id_a"), as_double_array(vec_col).alias("va")
    ).withColumn("na", norm(F.col("va")))
    b = df.select(
        F.col(id_col).alias("id_b"), as_double_array(vec_col).alias("vb")
    ).withColumn("nb", norm(F.col("vb")))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.select(
            "id_a", "id_b",
            (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", F.round("sim", 4).alias("sim"))
    )


def _srp_banded_expr(vec_col: str, planes: list[list[float]], bands: int) -> Column:
    """Banded SRP (band, bucket) structs as ONE parsed SQL expression over a
    named column: band i's bucket packs the sign bits of its own slice of
    ``planes``. A pair of vectors is a candidate iff they share a bucket in
    at least one band — the OR-of-ANDs amplification that makes SRP recall
    tunable (more bands → higher recall, more candidates).

    A single SQL string because building 64 per-plane dot products through
    the Python HOF API costs one py4j lambda-construction roundtrip per
    plane (~3-4 driver seconds at 8×8); Catalyst parses the string JVM-side
    in one roundtrip and the unrolled dots stay whole-stage-codegen'd."""
    # escape backticks in the interpolated column name (same trap class as
    # the time.py NTZ fix; only internal names reach here today, but the
    # escape makes the helper safe for any caller)
    vec_col = vec_col.replace("`", "``")
    per_band = len(planes) // bands
    structs = []
    for bi in range(bands):
        bits = []
        for p in range(per_band):
            plane = planes[bi * per_band + p]
            arr = "array(" + ",".join(f"{x}D" for x in plane) + ")"
            d = (
                f"aggregate(zip_with(`{vec_col}`, {arr}, (x, y) -> x * y), "
                "0D, (a, x) -> a + x)"
            )
            bits.append(
                f"(CASE WHEN {d} > 0 THEN CAST({1 << p} AS BIGINT) "
                "ELSE CAST(0 AS BIGINT) END)"
            )
        structs.append(f"struct({bi} AS band, ({' + '.join(bits)}) AS bucket)")
    return F.expr("array(" + ", ".join(structs) + ")")


def embedding_near_duplicates_bucketed(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    dim: int = 64,
    planes_per_band: int = 8,
    bands: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Embedding near-dup pairs via banded SRP-LSH candidates → exact verify.

    The scale path for ``embedding_near_duplicates`` — mirrors
    dedup.near_dup_pairs (text minhash-LSH → exact Jaccard):

    1. each vector hashes to ``bands`` buckets (one per band, each from
       ``planes_per_band`` sign-random projections),
    2. the candidate set is the (band, bucket) self-join — no cross join
       anywhere in the plan,
    3. candidates (and only candidates) get an exact cosine check.

    Recall: a pair at angle θ survives one band with (1-θ/π)^planes_per_band
    and is missed by all bands with (1-that)^bands. With the default 8×8,
    true near-duplicates (cos ≥ 0.999, θ ≤ 0.045) are missed with
    probability < 1e-9; pairs sitting exactly at a 0.9 threshold boundary
    are missed ~6% of the time — lower ``planes_per_band`` or raise
    ``bands`` when boundary recall matters. For an exact-recall requirement
    use the all-pairs oracle on a bounded subset instead.
    """
    v = df.select(
        F.col(id_col).alias("id"), as_double_array(vec_col).alias("v")
    ).withColumn("n", norm(F.col("v")))
    # a dim mismatch would null every plane dot (zip_with pads with nulls)
    # and silently collapse all vectors into one bucket — the equi join
    # would then be quadratic while the no-cartesian plan test still
    # passes. Fail loudly instead. Zero-norm vectors are excluded: cosine
    # is undefined for them and the verify division would raise under
    # ANSI mode (same guard as semantic_contamination).
    # The plan below consumes v FOUR times (both bucket-join sides, both
    # verify sides) and the SRP projection twice — cache both so the
    # scan + cast + norm pass and the planes_per_band·bands plane dots
    # run once per vector, not once per consumer (r12, guide §1.2; the
    # same internal-cache pattern as near_dup_pairs' shingle table).
    # Both tables are one narrow row per vector (× bands for buckets) —
    # bounded at any corpus scale. Ownership contract (same as
    # near_dup_pairs' shingle cache, r13 per ADVICE r12): the caches
    # belong to the returned frame's lineage — they cannot be unpersisted
    # here because the result is lazy; in a long-lived session the blocks
    # are reclaimed by the ContextCleaner once the frame is GC'd, and a
    # caller needing deterministic release should unpersist via
    # spark.catalog.clearCache() after materializing its result.
    v = v.withColumn("v", _checked_dim("v", dim)).where(F.col("n") > 0).cache()

    hp = _hyperplanes(dim, planes_per_band * bands, seed)
    buckets = v.select(
        "id", F.explode(_srp_banded_expr("v", hp, bands)).alias("bb")
    ).select("id", "bb.band", "bb.bucket").cache()

    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )

    va = v.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("n").alias("na"))
    vb = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("n").alias("nb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn(
            "sim", dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
        )
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", F.round("sim", 4).alias("sim"))
    )


def semantic_contamination(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eval_id_col: str | None = None,
    eval_vec_col: str | None = None,
    threshold: float = 0.95,
    dim: int = 64,
    planes_per_band: int = 8,
    bands: int = 8,
    seed: int = 7,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Corpus documents whose embedding is within cosine ``threshold`` of
    ANY eval-set embedding — the semantic sibling of
    ``textstats.ngram_contamination`` (which catches verbatim overlap; a
    paraphrased benchmark answer shares no 8-gram but sits next to the
    eval item in embedding space).

    Bipartite variant of ``embedding_near_duplicates_bucketed``: both
    sides hash to banded SRP buckets, candidates are the corpus×eval
    (band, bucket) EQUI join, and only candidates get the exact cosine.
    The corpus carries its vector THROUGH the bucket explode, so with
    ``broadcast_eval`` (the realistic shape — an eval set is thousands
    of rows against a 100 TB corpus) both the candidate join and the
    verify are broadcast map-side work over the one corpus scan; the
    only shuffle in the plan is the final per-id max over HIT rows
    (locked by a plan-assert test). With ``broadcast_eval=False`` (an
    eval side too big to broadcast) the bucket join hash-shuffles the
    exploded corpus instead — the self-join-shaped fallback. Returns one
    row per contaminated corpus id: ``(id, eval_id, sim)`` with the
    single most-similar eval item (ties by greatest eval_id,
    deterministic). Zero-norm vectors on either side are EXCLUDED
    (cosine is undefined for them — and under ANSI mode the division
    would kill the job; ``embedding_stats`` is the pre-flight that
    counts them). Recall follows the SRP band math documented on the
    self-join variant.
    """
    eval_id_col = id_col if eval_id_col is None else eval_id_col
    eval_vec_col = vec_col if eval_vec_col is None else eval_vec_col

    def prep(df: DataFrame, idc: str, vc: str, side: str) -> DataFrame:
        v = df.select(
            F.col(idc).alias(f"{side}_id"), as_double_array(vc).alias("v")
        ).withColumn("n", norm(F.col("v")))
        return (
            v.withColumn("v", _checked_dim("v", dim))
            .where(F.col("n") > 0)
            .select(
                f"{side}_id",
                F.col("v").alias(f"{side}_v"),
                F.col("n").alias(f"{side}_n"),
            )
        )

    c = prep(corpus, id_col, vec_col, "c")
    e = prep(eval_df, eval_id_col, eval_vec_col, "e")
    hp = _hyperplanes(dim, planes_per_band * bands, seed)

    # corpus vectors ride the explode: candidates already carry (c_v, c_n),
    # so no join back to the corpus (which would rescan AND hash-shuffle
    # the full corpus payload on c_id — the contract violation the review
    # caught). Band-duplicate candidates are fine: the final per-id max
    # dedups them, and only rows >= threshold reach that shuffle.
    cb = c.select(
        "c_id", "c_v", "c_n", F.explode(_srp_banded_expr("c_v", hp, bands)).alias("bb")
    ).select("c_id", "c_v", "c_n", "bb.band", "bb.bucket")
    eb = e.select(
        "e_id", F.explode(_srp_banded_expr("e_v", hp, bands)).alias("bb")
    ).select("e_id", "bb.band", "bb.bucket")
    ev = e
    if broadcast_eval:
        eb, ev = F.broadcast(eb), F.broadcast(ev)
    verified = (
        cb.join(eb, ["band", "bucket"])
        .join(ev, "e_id")
        .withColumn(
            "sim", dot(F.col("c_v"), F.col("e_v")) / (F.col("c_n") * F.col("e_n"))
        )
        .filter(F.col("sim") >= threshold)
    )
    # one row per corpus id: most-similar eval item, ties by greatest e_id
    best = verified.groupBy("c_id").agg(
        F.max(F.struct(F.col("sim"), F.col("e_id"))).alias("__b")
    )
    return best.select(
        F.col("c_id").alias("id"),
        F.col("__b.e_id").alias("eval_id"),
        F.round("__b.sim", 4).alias("sim"),
    )


def remove_semantically_contaminated(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **kwargs,
) -> DataFrame:
    """``corpus`` minus every row ``semantic_contamination`` flags — one
    left-anti join on the id against the (bounded: ≤ |flagged|) hit
    table. The companion to ``textstats.remove_contaminated``; run both
    for verbatim + paraphrase eval hygiene."""
    hits = semantic_contamination(corpus, eval_df, id_col, vec_col, **kwargs)
    return corpus.join(
        hits.select(F.col("id").alias(id_col)), id_col, "left_anti"
    )


def ivf_kmeans_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 2,
    seed: int = 7,
) -> DataFrame:
    """IVF ANN with real k-means coarse quantization (ml.clustering.KMeans).

    The production variant of ``ivf_topk``: centroids learned from the
    corpus, assignment via the model (JVM), probed search identical. Seeded
    k-means is deterministic per Spark version but not engine-portable →
    verified by recall against the exact baseline, not a SQL oracle.
    """
    cent_df, c_assigned = build_ivf_index(corpus, id_col, vec_col, n_cells, seed)
    return ivf_search(queries, cent_df, c_assigned, id_col, vec_col, k, n_probe)


def build_ivf_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    seed: int = 7,
    max_iter: int = 20,
) -> tuple[DataFrame, DataFrame]:
    """(centroids, assigned) — the persistable halves of an IVF index:
    centroids (cell, centv, centn; n_cells rows) and the assigned corpus
    (neighbor_id, cv, cn, cell). Write both to parquet and reload for
    ``ivf_search`` — the k-means fit (the expensive, corpus-scale part)
    runs once per index build, not per query batch, which is the pattern a
    recurring retrieval job needs."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    cf = _prep_members(corpus, id_col, vec_col).withColumn(
        "fv", array_to_vector(F.col("cv"))
    )

    km = KMeans(
        k=n_cells, seed=seed, featuresCol="fv", predictionCol="cell",
        maxIter=max_iter,
    )
    model = km.fit(cf)
    c_assigned = model.transform(cf).select("neighbor_id", "cv", "cn", "cell")

    centers = model.clusterCenters()
    spark = corpus.sparkSession
    cent_df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(centers)],
        "cell int, centv array<double>",
    ).withColumn("centn", norm(F.col("centv")))
    return cent_df, c_assigned


def ivf_search(
    queries: DataFrame,
    cent_df: DataFrame,
    c_assigned: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 2,
) -> DataFrame:
    """Probed IVF search against a built (or parquet-reloaded) index: rank
    cells by query-centroid cosine, join the top ``n_probe`` cells'
    members, exact-cosine rerank to top-k. Centroids broadcast (n_cells
    rows); the member join shuffles on the cell id only."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("qv")
    ).withColumn("qn", norm(F.col("qv")))
    qsims = q.crossJoin(F.broadcast(cent_df)).withColumn(
        "csim", dot(F.col("qv"), F.col("centv")) / (F.col("qn") * F.col("centn"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("csim"), F.col("cell"))
    q_assigned = (
        qsims.withColumn("__cr", F.row_number().over(w))
        .filter(F.col("__cr") <= n_probe)
        .select("query_id", "qv", "qn", "cell")
    )

    pairs = q_assigned.join(c_assigned, "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    sims = pairs.select(
        "query_id", "neighbor_id",
        (dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("sim"),
    ).groupBy("query_id", "neighbor_id").agg(F.max("sim").alias("sim"))
    wr = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("sim"), "rank")
    )


def _prep_members(corpus: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(neighbor_id, cv, cn) member rows — shared by build_ivf_index's
    corpus prep and ivf_append's delta prep."""
    return corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_array(vec_col).alias("cv")
    ).withColumn("cn", norm(F.col("cv")))


def assign_cells(cent_df: DataFrame, members: DataFrame) -> DataFrame:
    """Assign each (neighbor_id, cv, cn) member to its nearest centroid by
    exact squared euclidean distance (KMeans' assignment metric) — the
    incremental half of IVF index maintenance.

    Plan: broadcast the model-sized centroid table (n_cells rows), stream
    the member × centroid pairs through a partial min-aggregate — each
    member's n_cells candidate rows are produced and collapsed INSIDE its
    input partition (broadcast join preserves the delta's partitioning),
    so the groupBy(neighbor_id) shuffle moves one argmin row per member,
    never the pair fan-out.  dist² = |v|² + |c|² − 2·v·c from the
    precomputed norms; ties break to the smallest cell id (struct-min),
    matching MLlib's first-minimal-index rule.  The in-plan assert refuses
    dimension-mismatched vectors instead of silently mis-assigning."""
    cent = F.broadcast(cent_df.select("cell", "centv", "centn"))
    pairs = members.crossJoin(cent).withColumn(
        "__d2",
        F.when(
            F.assert_true(
                F.size("cv") == F.size("centv"),
                F.concat(
                    F.lit("assign_cells: vector dim "), F.size("cv").cast("string"),
                    F.lit(" != centroid dim "), F.size("centv").cast("string"),
                ),
            ).isNull(),
            F.col("cn") * F.col("cn")
            + F.col("centn") * F.col("centn")
            - 2 * dot(F.col("cv"), F.col("centv")),
        ),
    )
    best = pairs.groupBy("neighbor_id").agg(
        F.min(F.struct(F.col("__d2").alias("d"), F.col("cell"))).alias("__m"),
        F.min("cv").alias("cv"),
        F.min("cn").alias("cn"),
        F.max("cv").alias("__cv_hi"),
    )
    # duplicate ids with DIFFERENT vectors would otherwise merge into a
    # hybrid row (one vector's cell, the other's cv) and the index would
    # silently mis-place it — refuse in-plan, id named.  Same-vector
    # duplicates collapse harmlessly (min == max).
    dup_ok = F.assert_true(
        F.col("cv") == F.col("__cv_hi"),
        F.concat(
            F.lit("assign_cells: id "), F.col("neighbor_id").cast("string"),
            F.lit(" appears with conflicting vectors in one batch"),
        ),
    )
    return best.select(
        "neighbor_id",
        F.when(dup_ok.isNull(), F.col("cv")).alias("cv"),
        "cn",
        F.col("__m.cell").alias("cell"),
    )


def ivf_append(
    cent_df: DataFrame,
    c_assigned: DataFrame,
    new_corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    on_conflict: str = "error",
) -> DataFrame:
    """Incrementally maintain an IVF index: assign ONLY the delta to the
    frozen centroids and union it into the posting table — the daily-refresh
    path, O(delta) instead of the O(corpus) k-means rebuild.

    ``on_conflict`` for ids already present in the index:
    - 'error'   — refuse (one validation pass over the index, new ids
      broadcast so the index is scanned, never shuffled),
    - 'replace' — the delta wins (anti-join the old rows out; same
      one-broadcast-pass shape),
    - 'ignore'  — the index wins (delta rows with existing ids dropped;
      the delta ids are broadcast into one semi scan of the index and the
      hits anti-joined out of the delta: one index scan either way).

    Centroids stay frozen, so appended members land exactly where a
    same-centroid full reassignment would put them (batching-invariant —
    pinned by tests); monitor ``ivf_index_stats`` / ``ivf_rebuild_due``
    for when drift in the corpus warrants a re-fit."""
    if on_conflict not in ("error", "replace", "ignore"):
        raise ValueError(f"ivf_append: unknown on_conflict {on_conflict!r}")
    delta = assign_cells(cent_df, _prep_members(new_corpus, id_col, vec_col))
    # ids from the RAW delta, not the assignment output — deriving them
    # from `delta` would re-run the O(delta x n_cells) argmin subtree under
    # every conflict join (and eagerly, for the 'error' check)
    new_ids = new_corpus.select(F.col(id_col).alias("neighbor_id"))
    if on_conflict == "error":
        dup = (
            c_assigned.join(F.broadcast(new_ids), "neighbor_id", "semi")
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"ivf_append: id {dup[0]['neighbor_id']!r} already in the "
                "index — pass on_conflict='replace' or 'ignore'"
            )
        kept = c_assigned
    elif on_conflict == "replace":
        kept = c_assigned.join(F.broadcast(new_ids), "neighbor_id", "anti")
    else:  # ignore
        # the index is the big side: broadcast the DELTA ids into a semi
        # scan of the index, then anti the hits out of the delta (two
        # delta-sized frames join; the index is scanned once, broadcast
        # never exceeds the delta)
        existing_hits = c_assigned.select("neighbor_id").join(
            F.broadcast(new_ids), "neighbor_id", "semi"
        )
        delta = delta.join(existing_hits, "neighbor_id", "anti")
        kept = c_assigned
    return kept.unionByName(delta.select(*c_assigned.columns))


def save_ivf_index(
    cent_df: DataFrame,
    c_assigned: DataFrame,
    root: str,
    *,
    keep_versions: int = 2,
) -> int:
    """Persist an IVF index as a self-contained VERSION directory:
    ``root/v{N}/{centroids,members,_conf}``.  The 1-row _conf table
    (n_cells, dim, n_members, version) is written LAST — it is the commit
    marker, so a crashed save leaves an orphan version dir that
    ``load_ivf_index`` never reads (the accumulating sinks' protocol).
    Versioning is what makes the daily refresh safe: ``ivf_append`` reads
    version N lazily while the save writes N+1 — never an in-place
    overwrite of an input still being scanned.  Old committed versions
    beyond ``keep_versions`` are pruned, and crashed-save orphan dirs
    observed before this save are swept after the commit (they would
    otherwise accumulate unboundedly).  Single-writer by design (the
    daily-refresh job): concurrent saves already race on version
    numbering, and the orphan sweep assumes an uncommitted dir is a
    CRASHED save, not a live concurrent one.  Returns the new version."""
    if keep_versions < 1:
        raise ValueError("keep_versions must be >= 1")
    spark = cent_df.sparkSession
    # number past EVERY existing version dir, committed or orphan — a
    # crashed save leaves an uncommitted vN, and numbering from committed
    # versions only would collide with it forever; overwrite mode clears
    # a same-numbered orphan (only orphans can exist at this number: a
    # committed dir is always behind the max)
    all_vers = _ivf_versions(spark, root, committed_only=False)
    orphans = sorted(set(all_vers) - set(_ivf_versions(spark, root)))
    version = (max(all_vers) + 1) if all_vers else 0
    vdir = f"{root}/v{version:06d}"
    cent_df.select("cell", "centv", "centn").write.mode("overwrite").parquet(
        f"{vdir}/centroids"
    )
    c_assigned.select("neighbor_id", "cv", "cn", "cell").write.mode(
        "overwrite"
    ).parquet(f"{vdir}/members")
    cent_back = spark.read.parquet(f"{vdir}/centroids")
    meta = cent_back.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.min(F.size("centv")).alias("dim_lo"),
        F.max(F.size("centv")).alias("dim_hi"),
    ).first()
    if meta["dim_lo"] != meta["dim_hi"]:
        raise ValueError(
            f"save_ivf_index: ragged centroid dims "
            f"[{meta['dim_lo']}, {meta['dim_hi']}] — refusing to commit"
        )
    n_members = spark.read.parquet(f"{vdir}/members").count()
    spark.createDataFrame(
        [(int(meta["n_cells"]), int(meta["dim_lo"]), int(n_members), version)],
        "n_cells int, dim int, n_members bigint, version int",
    ).write.mode("overwrite").parquet(f"{vdir}/_conf")
    for old in _ivf_versions(spark, root)[:-keep_versions]:
        _delete_dir(spark, f"{root}/v{old:06d}")
    # crashed-save orphans observed BEFORE this save are dead: they are
    # numbered below the version just committed and the loader never reads
    # them — without this sweep they would accumulate unboundedly
    for orphan in orphans:
        _delete_dir(spark, f"{root}/v{orphan:06d}")
    return version


def _delete_dir(spark, path: str) -> None:
    jvm = spark._jvm
    jp = jvm.org.apache.hadoop.fs.Path(path)
    jp.getFileSystem(spark._jsc.hadoopConfiguration()).delete(jp, True)


def _ivf_versions(spark, root: str, committed_only: bool = True) -> list[int]:
    """Version numbers under ``root``, ascending.  ``committed_only``
    keeps conf-bearing versions (what the loader may read);
    ``committed_only=False`` also counts crashed-save orphans (what the
    writer must number past)."""
    jvm = spark._jvm
    jp = jvm.org.apache.hadoop.fs.Path(root)
    fs = jp.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jp):
        return []
    out = []
    for st in fs.listStatus(jp):
        name = st.getPath().getName()
        if name.startswith("v") and name[1:].isdigit():
            if not committed_only or fs.exists(
                jvm.org.apache.hadoop.fs.Path(f"{root}/{name}/_conf/_SUCCESS")
            ):
                out.append(int(name[1:]))
    return sorted(out)


def load_ivf_index(
    spark, root: str, *, version: int | None = None
) -> tuple[DataFrame, DataFrame, dict]:
    """(centroids, members, conf) of the latest committed version (or a
    pinned one).  Cross-checks the conf against the centroid table so a
    corrupted/foreign directory fails loudly, not with silent bad
    searches."""
    committed = _ivf_versions(spark, root)
    if not committed:
        raise ValueError(f"load_ivf_index: no committed version under {root}")
    if version is None:
        version = committed[-1]
    elif version not in committed:
        raise ValueError(
            f"load_ivf_index: version {version} not committed (have {committed})"
        )
    vdir = f"{root}/v{version:06d}"
    conf = spark.read.parquet(f"{vdir}/_conf").first().asDict()
    cent = spark.read.parquet(f"{vdir}/centroids")
    check = cent.agg(
        F.count(F.lit(1)).alias("n"), F.min(F.size("centv")).alias("d")
    ).first()
    if check["n"] != conf["n_cells"] or check["d"] != conf["dim"]:
        raise ValueError(
            f"load_ivf_index: conf says n_cells={conf['n_cells']} dim={conf['dim']} "
            f"but centroids hold {check['n']} cells of dim {check['d']} — "
            "corrupted or foreign index directory"
        )
    return cent, spark.read.parquet(f"{vdir}/members"), conf


def ivf_index_stats(cent_df: DataFrame, c_assigned: DataFrame) -> DataFrame:
    """Per-cell member counts incl. empty cells — ONE map-side-combinable
    count over the index joined back to the n_cells-row centroid table."""
    counts = c_assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("n_members"))
    return (
        cent_df.select("cell")
        .join(counts, "cell", "left")
        .select("cell", F.coalesce("n_members", F.lit(0)).alias("n_members"))
    )


def ivf_rebuild_due(
    cent_df: DataFrame,
    c_assigned: DataFrame,
    *,
    max_cell_frac: float = 0.25,
    max_imbalance: float = 8.0,
) -> dict:
    """Heuristic re-fit trigger for an append-maintained IVF index: the
    index degrades when appends pile into few cells (probed search stops
    pruning).  Returns {n_cells, n_vectors, max_frac, imbalance, due} from
    ONE bounded aggregate over the n_cells-row stats table (collect is
    n_cells-bounded).  due = max cell holds > max_cell_frac of the corpus
    OR max/mean member count > max_imbalance."""
    stats = ivf_index_stats(cent_df, c_assigned)
    row = stats.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("n_members").alias("n_vectors"),
        F.max("n_members").alias("mx"),
        F.avg("n_members").alias("mean"),
    ).first()
    n_vec = int(row["n_vectors"] or 0)
    mx = int(row["mx"] or 0)
    max_frac = (mx / n_vec) if n_vec else 0.0
    imbalance = (mx / row["mean"]) if row["mean"] else 0.0
    return {
        "n_cells": int(row["n_cells"]),
        "n_vectors": n_vec,
        "max_frac": max_frac,
        "imbalance": imbalance,
        "due": bool(n_vec and (max_frac > max_cell_frac or imbalance > max_imbalance)),
    }


def refresh_ivf_index(
    spark,
    root: str,
    delta: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    on_conflict: str = "error",
    keep_versions: int = 2,
    max_cell_frac: float = 0.25,
    max_imbalance: float = 8.0,
    n_cells: int | None = None,
    seed: int = 7,
    max_iter: int = 20,
) -> dict:
    """The closed daily-refresh loop in one call: load the latest committed
    version, append the day's delta against the FROZEN centroids
    (O(delta) — see ``ivf_append``), evaluate ``ivf_rebuild_due`` on the
    appended candidate, and when the trigger fires RE-FIT the codebook
    over the full (old ∪ delta) corpus instead — then commit whichever
    index as the next version (``save_ivf_index``'s journaled protocol, so
    a crash anywhere leaves the prior version live).

    Returns {version, rebuilt, n_cells, n_vectors, max_frac, imbalance,
    due} — the trigger stats are the PRE-rebuild candidate's, so the
    caller can log why a re-fit happened.

    Scale shape: quiet days cost the O(delta) assignment plus two index
    scans (the n_cells-bounded stats aggregate and the save); trigger days
    additionally pay the O(corpus) k-means re-fit — which is the point of
    the trigger: the expensive fit runs only when append-drift has
    actually degraded cell balance, not on a schedule.  ``n_cells``
    defaults to the loaded index's cell count."""
    appended_cent, members, conf = load_ivf_index(spark, root)
    appended = ivf_append(
        appended_cent, members, delta, id_col, vec_col, on_conflict
    )
    stats = ivf_rebuild_due(
        appended_cent,
        appended,
        max_cell_frac=max_cell_frac,
        max_imbalance=max_imbalance,
    )
    rebuilt = False
    if stats["due"]:
        # pin the combined corpus: the k-means fit iterates over it, and
        # without the checkpoint every iteration would re-run the
        # append-assignment subtree
        corpus = appended.select(
            F.col("neighbor_id").alias(id_col), F.col("cv").alias(vec_col)
        ).localCheckpoint()
        appended_cent, appended = build_ivf_index(
            corpus,
            id_col,
            vec_col,
            n_cells=n_cells or int(conf["n_cells"]),
            seed=seed,
            max_iter=max_iter,
        )
        rebuilt = True
    version = save_ivf_index(
        appended_cent, appended, root, keep_versions=keep_versions
    )
    return {"version": version, "rebuilt": rebuilt, **stats}


def _md5_signs(out_dim: int, dim: int, salt: str = "jl") -> list[list[float]]:
    """±1 projection matrix derived from md5 parity — deterministic,
    engine-portable (any SQL dialect can recompute sign(j,i) from
    md5('<salt>:<j>:<i>')), and seed-free.  Computed ONCE driver-side with
    hashlib; the per-row work is plain literal arithmetic."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"{salt}:{j}:{i}".encode()).hexdigest()[:8], 16) % 2 == 0
            else -1.0
            for i in range(dim)
        ]
        for j in range(out_dim)
    ]


def random_projection(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    out_dim: int,
    dim: int,
    *,
    salt: str = "jl",
    scale: bool = True,
) -> DataFrame:
    """Johnson–Lindenstrauss sign projection: (id, proj array<double>) with
    proj[j] = v · sign_row_j (/ sqrt(out_dim) when ``scale`` — the JL
    normalization that preserves squared norms in expectation, Achlioptas
    2001).  The cheap dimensionality reduction in front of ANN / clustering:
    out_dim dot products of literal ±1 rows per input row — pure codegen
    column arithmetic, no shuffle, no fit, no model to store (the matrix
    regenerates from (salt, out_dim, dim) anywhere, incl. in plain SQL for
    the oracle).  The in-plan dim assert refuses mis-sized vectors."""
    if out_dim < 1:
        raise ValueError("random_projection: out_dim must be >= 1")
    signs = _md5_signs(out_dim, dim, salt)
    v = _checked_dim(vec_col, dim)
    vd = F.transform(v, lambda x: x.cast("double"))
    comps = [dot(vd, _plane_lit(row)) for row in signs]
    if scale:
        import math

        s = 1.0 / math.sqrt(out_dim)
        comps = [c * F.lit(s) for c in comps]
    return df.select(F.col(id_col).alias("id"), F.array(*comps).alias("proj"))


def group_centroids(
    df: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
    normalize: bool = False,
) -> DataFrame:
    """(group, centroid array<double>, n) — per-group mean embedding.

    The dataset-summarization / IVF-bootstrap aggregate: one JVM-side
    shuffle via ``ml.stat.Summarizer`` (vector partial sums merge map-side;
    |groups| rows out) — never a posexplode to (group, dim) rows and never
    a collect_list of whole vectors. ``normalize=True`` L2-normalizes each
    centroid (what cosine-space retrieval wants).
    """
    from pyspark.ml.functions import array_to_vector, vector_to_array
    from pyspark.ml.stat import Summarizer

    v = df.select(
        F.col(group_col).alias("group"),
        array_to_vector(as_double_array(vec_col)).alias("__v"),
    )
    agg = v.groupBy("group").agg(
        Summarizer.mean(F.col("__v")).alias("__mean"),
        F.count(F.lit(1)).alias("n"),
    )
    out = agg.select(
        "group", vector_to_array(F.col("__mean")).alias("centroid"), "n"
    )
    if normalize:
        # norm computed ONCE into a column — embedding the aggregate inside
        # the transform lambda would re-evaluate it per element (O(d^2));
        # zero-norm centroids (all-zero group mean) stay zero vectors
        # instead of dividing by zero (an error under ANSI mode).
        out = (
            out.withColumn("__n2", norm(F.col("centroid")))
            .select(
                "group",
                F.when(
                    F.col("__n2") > 0,
                    F.transform("centroid", lambda x: x / F.col("__n2")),
                ).otherwise(F.col("centroid")).alias("centroid"),
                "n",
            )
        )
    return out


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "qvec"
) -> DataFrame:
    """Per-vector symmetric int8 quantization: adds ``out_col`` as
    array<tinyint> plus ``{out_col}_scale`` (double).

    x_q = round(x / scale) with scale = max|x| / 127 — 4x smaller at rest
    than float32 (8x vs the double arrays Spark returns), which at 100 TB
    of embeddings is the difference between one storage tier and the next.
    Dequantized cosine error is bounded by the per-dim quantization step;
    the reconstruction-error test quantifies it on real vectors. All-zero
    vectors get scale 0 and quantize to zeros. Native expressions only.
    """
    v = as_double_array(vec_col)
    amax = F.array_max(F.transform(v, F.abs))
    scale = F.when(amax > 0, amax / F.lit(127.0)).otherwise(F.lit(0.0))
    return df.withColumn(f"{out_col}_scale", scale).withColumn(
        out_col,
        F.when(
            F.col(f"{out_col}_scale") > 0,
            F.transform(
                v, lambda x: F.round(x / F.col(f"{out_col}_scale")).cast("tinyint")
            ),
        ).otherwise(F.transform(v, lambda x: F.lit(0).cast("tinyint"))),
    )


def dequantize_embeddings(
    df: DataFrame, qvec_col: str = "qvec", out_col: str = "embedding"
) -> DataFrame:
    """Inverse of ``quantize_embeddings``: array<double> ≈ original, using
    ``{qvec_col}_scale``."""
    return df.withColumn(
        out_col,
        F.transform(
            F.col(qvec_col), lambda q: q.cast("double") * F.col(f"{qvec_col}_scale")
        ),
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_cells: int = 16,
    seed: int = 7,
    max_iter: int = 20,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): k-means
    the embedding space into ``n_cells`` clusters, then inside each cluster
    drop every vector that has a SMALLER-id neighbor with cosine similarity
    >= ``threshold`` (greedy min-id survivor — deterministic, one pass).

    Returns (id, cell, keep). Duplicates that land in different clusters
    are missed by design — that is SemDeDup's scale trade: the pairwise
    work is Σ|cell|², never N², so the knob for 100 TB is ``n_cells``
    (≈ N/⟨cell⟩² stays flat when cells grow with N). The within-cell join
    shuffles (cell, id, vector) once; survivors come from one left_anti
    join against the dropped-id set.

    Like the paper's implementation, "drop" is decided against ALL
    smaller-id in-cell neighbors (not only surviving ones): a chain
    a~b, b~c with a≁c keeps a only — slightly more aggressive than
    connected-component survivor selection (near_dup_clusters covers the
    exact-grouping variant for text).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if n_cells < 1:
        raise ValueError(f"n_cells must be >= 1, got {n_cells}")
    base = df.select(
        F.col(id_col).alias("id"), as_double_array(vec_col).alias("v")
    ).withColumn("n", norm(F.col("v")))
    feat = base.withColumn("fv", array_to_vector(F.col("v")))
    if n_cells == 1:
        # degenerate exact-SemDeDup: one cell, no clustering (MLlib KMeans
        # rejects k=1) — all-pairs within the corpus, caller's choice
        assigned = feat.select("id", "v", "n", F.lit(0).alias("cell"))
    else:
        km = KMeans(
            k=n_cells, seed=seed, featuresCol="fv", predictionCol="cell",
            maxIter=max_iter,
        )
        model = km.fit(feat)
        assigned = model.transform(feat).select("id", "v", "n", "cell")

    # zero-norm vectors have no defined cosine: they never generate pairs
    # (keep=True trivially) and, under ANSI mode — the Spark 4 session
    # default — an unguarded 0/0 here would fail the whole job
    nz = assigned.filter(F.col("n") > 0)
    a, b = nz.alias("a"), nz.alias("b")
    sim = dot(F.col("a.v"), F.col("b.v")) / (F.col("a.n") * F.col("b.n"))
    dropped = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell")) & (F.col("a.id") < F.col("b.id")),
        )
        .filter(sim >= threshold)
        .select(F.col("b.id").alias("id"))
        .distinct()
    )
    return (
        assigned.select("id", "cell")
        .join(dropped.withColumn("__d", F.lit(True)), "id", "left")
        .select("id", "cell", F.col("__d").isNull().alias("keep"))
    )


# ---- product quantization (PQ) --------------------------------------------

def build_pq_codebooks(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    codes_per_subspace: int = 16,
    dim: int = 64,
    seed: int = 7,
    max_iter: int = 20,
) -> list[list[list[float]]]:
    """Train product-quantization codebooks (Jégou et al. 2011): split each
    vector into ``m`` subvectors and fit one KMeans codebook of
    ``codes_per_subspace`` centroids per subspace. Returns the plain-Python
    m × K × (dim/m) centroid tensor — driver-resident and tiny
    (m·K·dim/m = K·dim floats), persist it next to the encoded table.

    PQ compresses a float vector to ``m`` small integers (2·m bytes as
    stored smallint codes) — 16x smaller than float32 at the default 8×16
    on dim=64 —
    while asymmetric-distance search (``pq_search``) still compares against
    ORIGINAL query vectors, so recall degrades far slower than quantizing
    both sides. The m KMeans fits are distributed (one pass each over the
    subvector slice); at 100 TB fit on a sample (codebooks need ~K·1000
    vectors to converge, not the corpus) and encode the full corpus with
    the fitted books.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if dim % m:
        raise ValueError(f"dim={dim} must be divisible by m={m}")
    if not 2 <= codes_per_subspace <= 32767:
        raise ValueError(
            f"codes_per_subspace must be in [2, 32767] (smallint code "
            f"storage), got {codes_per_subspace}"
        )
    sub = dim // m
    v = _checked_dim(vec_col, dim)

    # the m fits are independent (disjoint subvector slices, separate
    # estimator instances) — submit them concurrently so wall-clock is
    # ~max(fit) instead of sum(fit). Spark schedules jobs from multiple
    # driver threads fine, and each fit is seeded, so the result tensor is
    # identical to the sequential loop regardless of scheduling order.
    from concurrent.futures import ThreadPoolExecutor

    def fit_one(j: int) -> list[list[float]]:
        sliced = df.select(
            array_to_vector(F.slice(v, j * sub + 1, sub)).alias("features")
        )
        model = KMeans(
            k=codes_per_subspace, seed=seed + j, featuresCol="features",
            maxIter=max_iter,
        ).fit(sliced)
        return [[float(x) for x in c] for c in model.clusterCenters()]

    with ThreadPoolExecutor(max_workers=min(m, 8)) as pool:
        books = list(pool.map(fit_one, range(m)))
    return books


def pq_encode(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """(id, codes array<smallint>) — encode each vector to its per-subspace
    nearest-centroid indexes. One vectorized-numpy ``mapInPandas`` stage
    (argmin over K centroids per subspace has no native Spark expression;
    the Arrow batch computes all rows × all subspaces in one einsum-shaped
    pass), map-only: no shuffle.
    """
    import numpy as np
    import pandas as pd

    if not codebooks:
        raise ValueError("codebooks must be a non-empty m x K x sub tensor")
    m = len(codebooks)
    sub = len(codebooks[0][0])
    books = [np.asarray(b, dtype="float64") for b in codebooks]
    id_type = dict(df.dtypes)[id_col]
    base = df.select(
        F.col(id_col).alias("id"), as_double_array(vec_col).alias("v")
    )

    def encode(batches):
        for pdf in batches:
            vecs = np.array(pdf["v"].tolist(), dtype="float64")
            if vecs.ndim != 2 or vecs.shape[1] != m * sub:
                raise ValueError(
                    f"pq_encode: vectors of dim {vecs.shape} do not match "
                    f"codebooks (m={m}, sub={sub})"
                )
            codes = np.empty((len(vecs), m), dtype="int16")
            for j in range(m):
                seg = vecs[:, j * sub : (j + 1) * sub]
                # (N, K) squared distances to subspace-j centroids
                d = ((seg[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = d.argmin(axis=1)
            yield pd.DataFrame({"id": pdf["id"], "codes": list(codes)})

    # smallint, not tinyint: codes are centroid INDEXES in [0, K). tinyint
    # tops out at 127 and would silently wrap K in (128, 256] to negative
    # values that numpy fancy-indexing then maps to the WRONG centroid —
    # 2 bytes per code still gives 16x compression at the 8x16 default
    return base.mapInPandas(encode, schema=f"id {id_type}, codes array<smallint>")


def _adc_query_tables(
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str,
    vec_col: str,
    caller: str,
):
    """(qids, qv, tables) — ONE bounded collect of the query set and the
    per-query m × K squared-L2 subspace tables, shared by ``pq_search`` and
    ``ivf_pq_search`` so the table math and validation cannot drift."""
    import numpy as np

    m = len(codebooks)
    sub = len(codebooks[0][0])
    books = [np.asarray(b, dtype="float64") for b in codebooks]
    qrows = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("v")
    ).collect()
    if not qrows:
        raise ValueError(f"{caller}: empty query set")
    qids = [r["query_id"] for r in qrows]
    qv = np.array([r["v"] for r in qrows], dtype="float64")
    if qv.shape[1] != m * sub:
        raise ValueError(
            f"{caller}: query dim {qv.shape[1]} does not match codebooks "
            f"(m={m}, sub={sub})"
        )
    # tables[q, j, c] = ||q_j - centroid_{j,c}||^2
    tables = np.stack(
        [
            ((qv[:, j * sub : (j + 1) * sub][:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            for j in range(m)
        ],
        axis=1,
    )
    return qids, qv, tables


def pq_search(
    queries: DataFrame,
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over a PQ-encoded corpus:
    (query_id, neighbor_id, adc_dist, rank), smallest approximate squared
    L2 distance first.

    Per query the m × K subspace-distance table is precomputed ONCE from
    the ORIGINAL query vector (driver-side numpy over the bounded query
    set, broadcast in the UDF closure); scoring a corpus row is then m
    table lookups — numpy fancy indexing over the whole Arrow batch, never
    a per-row float loop. Each Arrow batch then keeps only its LOCAL
    top-k per query under the same (adc_dist, neighbor_id) total order the
    final rank uses — top-k of a union equals top-k over per-part top-ks
    under a total order, so results are identical while the shuffle into
    the rank window carries nq·k rows per batch instead of nq·N. The
    global top-k is the standard rank window over that bounded candidate
    set (queries are bounded by contract, like ``brute_force_topk``)."""
    import numpy as np
    import pandas as pd

    m = len(codebooks)
    qids, _qv, tables = _adc_query_tables(queries, codebooks, id_col, vec_col, "pq_search")
    nq = len(qids)
    id_type = dict(encoded.dtypes)["id"]

    def score(batches):
        for pdf in batches:
            codes = np.array(pdf["codes"].tolist(), dtype="int64")  # (N, m)
            n = len(codes)
            # dist[q, row] = sum_j tables[q, j, codes[row, j]]
            dist = np.zeros((nq, n), dtype="float64")
            for j in range(m):
                dist += tables[:, j, :][:, codes[:, j]]
            ids = pdf["id"]
            keep_q: list = []
            keep_i: list[int] = []
            keep_d: list[float] = []
            for qi in range(nq):
                d = dist[qi]
                # self-match exclusion must happen BEFORE the local top-k,
                # or a self row could occupy a slot the global filter then
                # drops, leaving the query one candidate short
                not_self = (ids != qids[qi]).to_numpy()
                cand = np.nonzero(not_self)[0]
                if not len(cand):
                    continue
                kk = min(k, len(cand))
                # exact tie handling: take every row at or below the kth
                # distance, then order the (bounded) candidate set by the
                # SAME (dist, neighbor_id) composite the rank window uses
                kth = np.partition(d[cand], kk - 1)[kk - 1]
                tied = cand[d[cand] <= kth]
                top = (
                    pd.DataFrame({"i": tied, "d": d[tied], "nid": ids.iloc[tied].to_numpy()})
                    .sort_values(["d", "nid"], kind="mergesort")
                    .head(kk)
                )
                keep_q.extend([qids[qi]] * len(top))
                keep_i.extend(top["i"].tolist())
                keep_d.extend(top["d"].tolist())
            yield pd.DataFrame(
                {
                    "query_id": keep_q,
                    "neighbor_id": ids.iloc[keep_i].to_numpy(),
                    "adc_dist": keep_d,
                }
            )

    scored = encoded.mapInPandas(
        score,
        schema=f"query_id {id_type}, neighbor_id {id_type}, adc_dist double",
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc_dist"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("adc_dist", 6).alias("adc_dist"), "rank")
    )


def pq_codebooks_to_df(spark, codebooks: list[list[list[float]]]) -> DataFrame:
    """Codebooks as a (subspace, code, centv) DataFrame — the persistable
    half of a PQ index (write to parquet next to the ``pq_encode`` table;
    m·K rows, trivially small). Completes the same build-once/search-many
    split as ``build_ivf_index`` and ``lsh_index``."""
    rows = [
        (j, c, centv)
        for j, book in enumerate(codebooks)
        for c, centv in enumerate(book)
    ]
    return spark.createDataFrame(rows, "subspace int, code int, centv array<double>")


def pq_codebooks_from_df(df: DataFrame) -> list[list[list[float]]]:
    """Inverse of ``pq_codebooks_to_df``: reload the m × K × sub tensor from
    its persisted table (bounded collect: m·K rows). Validates the
    (subspace, code) grid is dense — a partially-written index fails loudly
    instead of searching against missing centroids."""
    rows = df.select("subspace", "code", "centv").collect()
    if not rows:
        raise ValueError("empty PQ codebook table")
    bad = [
        (r["subspace"], r["code"])
        for r in rows
        if r["subspace"] is None or r["code"] is None
        or r["subspace"] < 0 or r["code"] < 0
    ]
    if bad:
        raise ValueError(
            f"PQ codebook table has null/negative coordinates: {bad[:5]} "
            "(negative values would silently alias tail slots)"
        )
    m = max(r["subspace"] for r in rows) + 1
    k = max(r["code"] for r in rows) + 1
    books: list[list[list[float] | None]] = [[None] * k for _ in range(m)]
    seen: set[tuple[int, int]] = set()
    for r in rows:
        coord = (r["subspace"], r["code"])
        if coord in seen:
            raise ValueError(
                f"PQ codebook table has duplicate (subspace, code) {coord} "
                "(last-write-wins would load an arbitrary centroid)"
            )
        seen.add(coord)
        books[r["subspace"]][r["code"]] = [float(x) for x in r["centv"]]
    missing = [
        (j, c) for j in range(m) for c in range(k) if books[j][c] is None
    ]
    if missing:
        raise ValueError(f"PQ codebook table is not a dense grid; missing {missing[:5]}")
    return books  # type: ignore[return-value]


def build_ivf_pq_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    m: int = 8,
    codes_per_subspace: int = 16,
    dim: int = 64,
    seed: int = 7,
    max_iter: int = 20,
) -> tuple[DataFrame, DataFrame, list[list[list[float]]]]:
    """(centroids, assigned_codes, codebooks) — the IVF-PQ composition
    (Jégou et al. 2011's full recipe): coarse k-means cells for candidate
    pruning + product-quantized codes for compact in-cell scoring. The
    assigned_codes table carries (neighbor_id, cell, codes) — 2·m bytes of
    payload per vector instead of the float array, which is what makes a
    billion-vector serving index fit a cluster's memory. All three parts
    persist (two parquet tables + ``pq_codebooks_to_df``)."""
    cent_df, c_assigned = build_ivf_index(
        corpus, id_col, vec_col, n_cells, seed, max_iter
    )
    books = build_pq_codebooks(
        corpus, vec_col, m, codes_per_subspace, dim, seed, max_iter
    )
    codes = pq_encode(corpus, id_col, vec_col, books).withColumnRenamed(
        "id", "neighbor_id"
    )
    assigned_codes = c_assigned.select("neighbor_id", "cell").join(
        codes, "neighbor_id"
    )
    return cent_df, assigned_codes, books


def ivf_pq_search(
    queries: DataFrame,
    cent_df: DataFrame,
    assigned_codes: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 2,
) -> DataFrame:
    """ADC top-k through an IVF-PQ index: probe the ``n_probe``
    L2-NEAREST cells per query, join ONLY those cells' code rows (the
    shuffle carries 2·m-byte codes, never vectors), then asymmetric-
    distance rank from per-query tables computed once from the ORIGINAL
    query vectors. Returns (query_id, neighbor_id, adc_dist, rank),
    smallest approximate squared L2 first.

    The probe metric is squared L2 — the SAME metric ADC scores with and
    the metric KMeans cells are Voronoi regions of. (A cosine probe, as in
    the cosine-reranking ``ivf_search``, can rank a far-away large-norm
    centroid above the L2-nearest one and exclude the true neighbor's cell
    entirely on unnormalized embeddings.)

    Queries are bounded by contract (same as ``pq_search`` /
    ``brute_force_topk``); they are collected ONCE — both the ADC tables
    and the cell probe (plain numpy against the n_cells-row centroid
    table) derive from that single collect, so an expensive query-side
    lineage is never evaluated twice."""
    import numpy as np
    import pandas as pd

    m = len(codebooks)
    qids, qv, tables = _adc_query_tables(
        queries, codebooks, id_col, vec_col, "ivf_pq_search"
    )
    qpos = {qid: i for i, qid in enumerate(qids)}

    cent_rows = cent_df.select("cell", "centv").collect()
    cents = np.array([r["centv"] for r in cent_rows], dtype="float64")
    cell_ids = np.array([r["cell"] for r in cent_rows])
    if cents.shape[1] != qv.shape[1]:
        raise ValueError(
            f"ivf_pq_search: centroid dim {cents.shape[1]} != query dim {qv.shape[1]}"
        )
    # (nq, n_cells) squared L2; ties break on cell id via stable lexsort
    d2 = ((qv[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    n_probe_eff = min(n_probe, len(cell_ids))
    probe_rows = []
    for i, qid in enumerate(qids):
        order = np.lexsort((cell_ids, d2[i]))[:n_probe_eff]
        probe_rows.extend((qid, int(cell_ids[j])) for j in order)
    probed = queries.sparkSession.createDataFrame(
        probe_rows, f"query_id {dict(assigned_codes.dtypes)['neighbor_id']}, cell int"
    )
    # each corpus vector lives in exactly one cell, so the probe join cannot
    # duplicate a (query, neighbor) pair — no post-join dedup needed
    pairs = probed.join(assigned_codes, "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    ).select("query_id", "neighbor_id", "codes")

    id_type = dict(assigned_codes.dtypes)["neighbor_id"]

    def score(batches):
        for pdf in batches:
            codes = np.array(pdf["codes"].tolist(), dtype="int64")  # (N, m)
            qp = pdf["query_id"].map(qpos).to_numpy(dtype="int64")
            dist = np.zeros(len(codes), dtype="float64")
            for j in range(m):
                dist += tables[qp, j, codes[:, j]]
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "neighbor_id": pdf["neighbor_id"],
                    "adc_dist": dist,
                }
            )

    scored = pairs.mapInPandas(
        score,
        schema=f"query_id {id_type}, neighbor_id {id_type}, adc_dist double",
    )
    wr = Window.partitionBy("query_id").orderBy(F.col("adc_dist"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("adc_dist", 6).alias("adc_dist"), "rank")
    )


def embedding_stats(df: DataFrame, vec_col: str) -> DataFrame:
    """One-row data-quality card for an embedding column — the pre-flight
    before any ANN/dedup run, because every operator in this module
    silently assumes what this report checks: (n_rows, n_null, n_dims
    distinct widths, dim_min, dim_max, n_zero zero-norm vectors, n_nan
    vectors containing NaN, norm_min/avg/max over clean vectors).

    ONE aggregate over ONE scan (all expressions native, map-side
    combined). Mixed widths break every zip_with pairing; zero-norm
    vectors turn cosine into a division by zero; NaN, null, or ±Inf
    COMPONENTS poison k-means fits and similarity scores — each is a
    count here (n_nan / n_null_elem / n_inf) instead of a job failure
    three hours into a 100 TB sweep. Norm stats cover clean vectors only
    (non-null, finite, no null components, norm > 0); pathological rows
    are counted, never averaged. Dim stats guard the null vector
    explicitly — ``size(NULL)`` is -1 under non-ANSI configs, which would
    invent a phantom width.
    """
    if vec_col not in df.columns:
        raise ValueError(f"column '{vec_col}' not in input")
    v = as_double_array(vec_col)
    present = F.col(vec_col).isNotNull()
    has_nan = F.coalesce(F.exists(v, lambda x: F.isnan(x)), F.lit(False))
    has_null_elem = F.coalesce(
        F.exists(v, lambda x: x.isNull()), F.lit(False)
    )
    inf = F.lit(float("inf"))
    has_inf = F.coalesce(
        F.exists(v, lambda x: (x == inf) | (x == -inf)), F.lit(False)
    )
    dims = F.when(present, F.size(v))
    nrm = norm(v)
    clean = present & ~has_nan & ~has_null_elem & ~has_inf & (nrm > 0)
    clean_norm = F.when(clean, nrm)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((~present).cast("long")).alias("n_null"),
        F.count_distinct(dims).alias("n_dims"),
        F.min(dims).alias("dim_min"),
        F.max(dims).alias("dim_max"),
        F.sum(
            (present & ~has_nan & ~has_null_elem & ~has_inf & (nrm == 0)).cast("long")
        ).alias("n_zero"),
        F.sum(has_nan.cast("long")).alias("n_nan"),
        F.sum(has_null_elem.cast("long")).alias("n_null_elem"),
        F.sum(has_inf.cast("long")).alias("n_inf"),
        F.round(F.min(clean_norm), 6).alias("norm_min"),
        F.round(F.avg(clean_norm), 6).alias("norm_avg"),
        F.round(F.max(clean_norm), 6).alias("norm_max"),
    )
