"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline — cross join + native array math
  + per-query window top-k. Cost O(Q·N); right answer, wrong scale.
- LSH-bucketed variant: sign-random-projection buckets computed with
  deterministic ±1 hyperplanes (seeded), then brute-force only within
  buckets — the scale path (candidates shrink by ~2^planes).
- IVF-style variant: coarse k-means-ish assignment via nearest of C sampled
  centroids, search within the query's cell(s).

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


def srp_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-random-projection bucket id: bit p = sign(vec · plane_p)."""
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(x) for x in plane])
        bit = F.when(dot(vec, lit_plane) > 0, F.lit(1).cast("long")).otherwise(
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
    dim: int | None = None,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: SRP-bucket both sides, join on bucket, rank within.

    The bucket join replaces the cross join — candidate count drops by
    ~2^planes for uniformly spread data. Recall is approximate (neighbors in
    adjacent buckets are missed); raise recall with multi-probe or fewer
    planes. Returns the same shape as brute_force_topk.
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    hp = _hyperplanes(dim, planes, seed)
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("qv")
    ).withColumn("bucket", srp_bucket(F.col("qv"), hp))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_array(vec_col).alias("cv")
    ).withColumn("bucket", srp_bucket(F.col("cv"), hp))
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


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 2,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus into cells around sampled
    centroids, search only the query's n_probe nearest cells.

    Centroids are a deterministic corpus sample (every ceil(N/n_cells)-th id)
    — a stand-in for k-means that keeps the operator reproducible. Both
    assignment joins are broadcasts of the tiny centroid table; the expensive
    pairwise work happens only inside probed cells (~n_probe/n_cells of the
    corpus per query).
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_array(vec_col).alias("cv")
    ).withColumn("cn", norm(F.col("cv")))

    w = Window.orderBy("neighbor_id")
    numbered = c.withColumn("__rn", F.row_number().over(w) - 1)
    n_total = numbered.count()
    stride = max(n_total // n_cells, 1)
    cents = (
        numbered.filter(F.col("__rn") % stride == 0)
        .limit(n_cells)
        .select(
            F.col("__rn").alias("cell"), F.col("cv").alias("centv"),
            F.col("cn").alias("centn"),
        )
    )

    def assign(side: DataFrame, vcol: str, ncol: str, probes: int) -> DataFrame:
        sims = side.crossJoin(F.broadcast(cents)).withColumn(
            "csim", dot(F.col(vcol), F.col("centv")) / (F.col(ncol) * F.col("centn"))
        )
        ww = Window.partitionBy(side.columns[0]).orderBy(F.desc("csim"), F.col("cell"))
        return (
            sims.withColumn("__cr", F.row_number().over(ww))
            .filter(F.col("__cr") <= probes)
            .drop("centv", "centn", "csim", "__cr")
        )

    c_assigned = assign(c, "cv", "cn", 1)
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("qv")
    ).withColumn("qn", norm(F.col("qv")))
    q_assigned = assign(q, "qv", "qn", n_probe)

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


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Pairs (a < b) with cosine >= threshold — embedding-space near-dup.

    Exact all-pairs; at scale run through lsh buckets first (same pattern as
    minhash_lsh_candidates for text).
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
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_array(vec_col).alias("cv")
    ).withColumn("cn", norm(F.col("cv")))
    cf = c.withColumn("fv", array_to_vector(F.col("cv")))

    km = KMeans(k=n_cells, seed=seed, featuresCol="fv", predictionCol="cell")
    model = km.fit(cf)
    c_assigned = model.transform(cf).select("neighbor_id", "cv", "cn", "cell")

    centers = model.clusterCenters()
    spark = corpus.sparkSession
    cent_df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(centers)],
        "cell int, centv array<double>",
    ).withColumn("centn", norm(F.col("centv")))

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
