"""Lexical retrieval operators: TF-IDF weighting and BM25 ranking.

Beyond-reference text-analysis operators for training-data curation:
TF-IDF vectors feed near-duplicate mining and quality heuristics; BM25
powers "find documents like/about X" sweeps over a corpus without an
embedding model. Both are pure DataFrame compositions — tokenize →
explode → two hash aggregates — and every statistic is an exact,
engine-portable arithmetic expression, so the whole path is verifiable
against a SQL oracle (tests/test_retrieval.py runs the DuckDB twin).

Scale shape (100 TB): one shuffle keyed by term for document frequencies
(|vocab| rows out — small), one keyed by (doc, term) for term frequencies
(corpus-sized but map-side combined), and a broadcast of the per-term IDF
table back onto the postings. No driver collect, no UDF, no global sort;
BM25 scoring of a query is a semi-join of the postings against the literal
term list followed by one per-doc aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from oni_ml_spark.datapipe.dedup import tokens


def term_frequencies(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, tf) — raw term counts per document (whitespace tokens of
    the dedup-normalized text, so TF-IDF and MinHash agree on tokenization)."""
    return (
        df.select(F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("term"))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tf_idf(
    df: DataFrame, id_col: str, text_col: str, n_docs: int | None = None,
    tf: DataFrame | None = None,
) -> DataFrame:
    """(id, term, tf, df, tfidf) with the smoothed IDF
    ln((N + 1) / (df + 1)) + 1 (the scikit-learn convention — never
    negative, defined for df = N).

    N is the number of documents with >= 1 token, computed in-plan as a
    1-row countDistinct aggregate over the postings and broadcast onto the
    tiny per-term table. NOTE: documents whose normalized text is empty do
    not count toward N (they have no postings) — sklearn's TfidfVectorizer
    counts every input row. Pass ``n_docs`` to pin N explicitly (e.g. the
    full corpus size, or a constant held fixed across incremental batches).

    ``tf`` (r12): a precomputed ``term_frequencies`` postings table. A
    caller composing several lexical operators over ONE corpus (tf-idf +
    BM25 + per-group top terms) otherwise re-runs the tokenize → explode →
    (id, term) shuffle once per operator; passing a shared (cached)
    postings table makes that one corpus pass total (guide §1.2: remove
    duplicate passes).
    """
    if tf is None:
        tf = term_frequencies(df, id_col, text_col)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if n_docs is None:
        # distinct docs with >= 1 token, computed in-plan: max over the
        # bounded per-term doc frequencies is NOT |docs|; count distinct ids
        # from the tf table instead via a 1-row broadcast aggregate
        nd = tf.agg(F.countDistinct("id").alias("__n"))
        dfreq = dfreq.join(F.broadcast(nd))
    else:
        dfreq = dfreq.withColumn("__n", F.lit(int(n_docs)))
    dfreq = dfreq.withColumn(
        "idf",
        F.log((F.col("__n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))) + F.lit(1.0),
    ).select("term", "df", "idf")
    return (
        tf.join(F.broadcast(dfreq), "term")
        .select("id", "term", "tf", "df", (F.col("tf") * F.col("idf")).alias("tfidf"))
    )


def top_terms_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    text_col: str,
    k: int = 10,
    min_df: int = 1,
    tf: DataFrame | None = None,
) -> DataFrame:
    """(group, term, sum_tfidf, n_docs, rank) — the k most characteristic
    terms of each group by summed TF-IDF: the "what is actually IN this
    source / language / domain slice" report a corpus card leads with
    (corpus-wide IDF discounts boilerplate that appears everywhere, so the
    per-group winners are the group's distinguishing vocabulary, not
    'the').

    ``min_df`` drops terms rarer than the threshold corpus-wide —
    hapaxes/typos otherwise dominate small groups with tf=1·max-IDF terms.

    Per-document contributions are quantized to 1e-6 BEFORE summing
    (floor(tfidf·1e6), summed as integer-valued doubles): raw double sums
    are addition-order-dependent, so two terms with near-identical totals
    would swap ranks run-to-run with Spark's partition merge order — a
    nondeterministic report. Integer-valued doubles add exactly in any
    order (the temporal_reshape precedent), making both the ranking and
    the value engine- and run-deterministic at a ≤1e-6-per-document cost.

    Plan: the tf_idf postings (two hash aggregates, IDF broadcast) joined
    to the (id → group) projection, one (group, term) sum with map-side
    combine, then ``grouped_topk`` — the |groups·terms|-row aggregate is
    what ranks, never the corpus."""
    for c in (group_col, id_col, text_col):
        if c not in df.columns:
            raise ValueError(f"column '{c}' not in input")
    if min_df < 1:
        raise ValueError("min_df must be >= 1")
    from oni_ml_spark.datapipe.ranking import grouped_topk

    ti = tf_idf(df, id_col, text_col, tf=tf).filter(F.col("df") >= min_df)
    labels = df.select(
        F.col(id_col).alias("id"), F.col(group_col).alias("group")
    )
    per_term = (
        ti.join(labels, "id")
        .groupBy("group", F.col("term"))
        .agg(
            (F.sum(F.floor(F.col("tfidf") * 1e6)) / 1e6).alias("sum_tfidf"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )
    return grouped_topk(
        per_term, "group", "sum_tfidf", k, tie_col="term"
    ).select("group", "term", "sum_tfidf", "n_docs", "rank")


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    tf: DataFrame | None = None,
) -> DataFrame:
    """(id, score) — Okapi BM25 of every matching document for a bag of
    query terms; documents sharing no term are absent (score 0 by
    definition).

    score(D, Q) = Σ_t qtf(t) · idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|D|/avgdl))
    with the standard idf(t) = ln(1 + (N − df + 0.5) / (df + 0.5)) and
    qtf(t) = the term's multiplicity in the query — a term repeated in Q
    contributes proportionally (true bag-of-terms Okapi; callers wanting
    set semantics dedupe query_terms themselves).

    All statistics (doc length, avgdl, df, N) are computed in-plan from the
    corpus; the query side is a literal array, so matching is a broadcast
    semi-filter on the postings — no join against a query table.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    from collections import Counter

    qtf = Counter(str(t) for t in query_terms)
    if tf is None:
        tf = term_frequencies(df, id_col, text_col)
    doclen = tf.groupBy("id").agg(F.sum("tf").alias("dl"))
    # corpus stats as a 1-row broadcast: N and avgdl
    stats = doclen.agg(
        F.count(F.lit(1)).alias("__n"), F.avg("dl").alias("__avgdl")
    )
    qset = list(qtf)
    # literal term → query-multiplicity map (bounded by the query length)
    qtf_map = F.create_map(
        *[lit for t, c in qtf.items() for lit in (F.lit(t), F.lit(float(c)))]
    )
    matched = tf.filter(F.col("term").isin(qset))
    dfreq = matched.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = (
        dfreq.join(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("__n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            ),
        )
        .select("term", "idf")
    )
    k1l, bl = F.lit(float(k1)), F.lit(float(b))
    return (
        matched.join(F.broadcast(idf), "term")
        .join(doclen, "id")
        .join(F.broadcast(stats))
        .withColumn(
            "__contrib",
            F.element_at(qtf_map, F.col("term"))
            * F.col("idf")
            * (F.col("tf") * (k1l + 1))
            / (F.col("tf") + k1l * (1 - bl + bl * F.col("dl") / F.col("__avgdl"))),
        )
        .groupBy("id")
        .agg(F.sum("__contrib").alias("score"))
    )


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k BM25 results, ties broken by id — plans as
    TakeOrderedAndProject (no global sort materialization)."""
    scored = bm25_scores(df, id_col, text_col, query_terms, k1=k1, b=b)
    return scored.orderBy(F.desc("score"), F.col("id")).limit(k)


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "id",
    rank_col: str = "rank",
    k: int = 60,
    top_k: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of several ranked
    result lists — the standard way to combine lexical (``bm25_topk``) and
    vector (``brute_force_topk`` / ``ivf_pq_search``) retrieval without
    score calibration: rrf = Σ_lists 1/(k + rank), higher is better.
    Returns (id, rrf_score, n_lists, rank) ordered best-first; ``k=60`` is
    the paper's constant (damps the head so one list cannot dominate).

    Rank-only fusion is what makes this robust at scale: BM25 scores and
    cosine similarities live on incomparable scales, but ranks always
    fuse. Each input needs (id_col, rank_col) with rank >= 1; candidates
    appearing in only some lists simply collect fewer terms (no imputed
    rank for absent lists — the conservative variant). Plan: union of the
    (already small, top-k-sized) lists → one grouped sum → one rank
    window over candidate-count rows, not corpus rows.
    """
    if not rankings:
        raise ValueError("need at least one ranking")
    if k <= 0:
        raise ValueError("k must be positive")
    parts = []
    for i, r in enumerate(rankings):
        for c in (id_col, rank_col):
            if c not in r.columns:
                raise ValueError(f"ranking {i} lacks column '{c}'")
        parts.append(
            r.select(
                F.col(id_col).alias("id"),
                (F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col).cast("double"))).alias("__term"),
            )
        )
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    fused = allp.groupBy("id").agg(
        F.sum("__term").alias("rrf_score"),
        F.count(F.lit(1)).cast("long").alias("n_lists"),
    )
    # global (unpartitioned) window is safe HERE only because the input is
    # a union of top-k lists — candidate-count rows, never corpus-sized
    w = Window.orderBy(F.desc("rrf_score"), F.col("id"))
    out = fused.withColumn("rank", F.row_number().over(w))
    if top_k is not None:
        out = out.filter(F.col("rank") <= top_k)
    return out.select("id", F.round("rrf_score", 9).alias("rrf_score"), "n_lists", "rank")
