"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All native expressions (regexp/split/length) —
these run over every document at 100 TB, so nothing leaves codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from oni_ml_spark.datapipe.dedup import normalize_text, tokens

# Marker stopwords per language for the n-gram-heuristic language ID.
# Deterministic and tiny by design (a real system would plug in fastText etc.
# — the operator contract is the same: text → lang label).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with"],
    "es": ["el", "la", "de", "que", "los", "una", "por", "con"],
    "fr": ["le", "la", "les", "des", "est", "dans", "pour", "une"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
}

TOKEN_REGEX = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def regex_token_count(c: Column | str) -> Column:
    """BPE-ish regex token count (shared by token_counts / quality_metrics)."""
    t = F.col(c) if isinstance(c, str) else c
    return F.size(F.regexp_extract_all(F.lower(t), F.lit(TOKEN_REGEX), F.lit(0)))


def _marker_hits(c: Column, words: list[str]) -> Column:
    """Count of tokens that are in the marker list."""
    return F.size(F.filter(tokens(c), lambda t: t.isin(*words)))


def lang_scores(c: Column | str) -> dict[str, Column]:
    t = F.col(c) if isinstance(c, str) else c
    return {lang: _marker_hits(t, words) for lang, words in LANG_MARKERS.items()}


def lang_id(c: Column | str) -> Column:
    """Predicted language = argmax marker-hit count; 'und' when all zero.

    Deterministic tie-break: language-code order en < es < fr < de as listed
    (first maximal wins), replicable in plain SQL with a CASE chain.
    """
    scores = lang_scores(c)
    mx = F.greatest(*scores.values())
    out = None
    for lang, s in scores.items():  # chained when → first maximal wins
        cond = (s > 0) & (s == mx)
        out = F.when(cond, F.lit(lang)) if out is None else out.when(cond, F.lit(lang))
    return out.otherwise(F.lit("und"))


def quality_metrics(
    df: DataFrame,
    id_col: str,
    text_col: str,
    extra: dict[str, Column] | None = None,
) -> DataFrame:
    """Length / punctuation / stopword / uppercase ratios + token counts.

    Returns (id, n_chars, n_tokens, regex_tokens, punct_ratio,
    stopword_ratio, upper_ratio, mean_token_len) — the standard cheap
    quality gates for a pretraining corpus filter, all rounded for stable
    comparison. n_tokens is the whitespace count; regex_tokens the BPE-ish
    regex count (both token-budget estimators in one pass).

    ``extra`` appends more named columns (e.g. ``lang_id(text_col)``) so
    per-document profiling stays one projection over one scan instead of a
    self-join of separate passes.
    """
    base_names = {
        "id", "n_chars", "n_tokens", "regex_tokens", "punct_ratio",
        "stopword_ratio", "upper_ratio", "mean_token_len",
    }
    clash = sorted(base_names & set(extra or {}))
    if clash:
        raise ValueError(
            f"extra column names collide with base outputs: {clash} — a "
            "silent duplicate column breaks any downstream reference"
        )
    t = F.col(text_col)
    toks = tokens(text_col)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    en_stop = LANG_MARKERS["en"]
    punct = F.length(F.regexp_replace(t, r"[^!-/:-@\[-`{-~]", ""))
    upper = F.length(F.regexp_replace(t, r"[^A-Z]", ""))
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*en_stop)))
    mean_tok = F.when(n_tokens > 0, n_chars.cast("double") / n_tokens).otherwise(F.lit(0.0))
    bpe = regex_token_count(t)
    return df.select(
        F.col(id_col).alias("id"),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        bpe.cast("long").alias("regex_tokens"),
        F.round(punct / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(stop_hits / F.greatest(n_tokens, F.lit(1)), 6).alias("stopword_ratio"),
        F.round(upper / F.greatest(n_chars, F.lit(1)), 6).alias("upper_ratio"),
        F.round(mean_tok, 6).alias("mean_token_len"),
        *[c.alias(name) for name, c in (extra or {}).items()],
    )


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count per document."""
    ws = F.size(tokens(text_col))
    bpe = regex_token_count(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("regex_tokens"),
    )


DEFAULT_LINE_BLACKLIST = ("javascript", "lorem ipsum", "cookie")


def line_keep_predicate(
    line: Column,
    *,
    min_words: int = 3,
    require_terminal_punct: bool = True,
    blacklist: tuple[str, ...] = DEFAULT_LINE_BLACKLIST,
    max_line_chars: int = 2000,
) -> Column:
    """C4-style per-line keep rule (Raffel et al. 2020 §2.2): at least
    ``min_words`` whitespace words, ends in terminal punctuation
    (. ! ? "), no blacklisted boilerplate phrase, bounded length.  A pure
    boolean expression over one line — shared by ``line_filter`` and any
    caller that wants the rule without the reassembly."""
    words = F.size(F.filter(F.split(F.trim(line), " "), lambda w: w != ""))
    keep = words >= F.lit(int(min_words))
    if require_terminal_punct:
        keep = keep & F.rtrim(line).rlike('[.!?"]$')
    low = F.lower(line)
    for phrase in blacklist:
        keep = keep & ~low.contains(phrase)
    keep = keep & (F.length(line) <= F.lit(int(max_line_chars)))
    return keep


def line_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_words: int = 3,
    require_terminal_punct: bool = True,
    blacklist: tuple[str, ...] = DEFAULT_LINE_BLACKLIST,
    max_line_chars: int = 2000,
    dedup_lines: bool = False,
) -> DataFrame:
    """Line-level document cleaning, the C4 recipe: split on newlines,
    keep only lines passing ``line_keep_predicate``, reassemble in order.
    Returns (id, text [the cleaned document], n_lines, n_kept).
    ``dedup_lines`` drops WITHIN-document repeats (nav menus, footers)
    keeping each line's first occurrence — array_distinct order semantics;
    cross-document repeats are the global span-dedup's job
    (dedup.remove_duplicate_spans).

    One projection over one scan — split / filter / array_join are all
    codegen HOF expressions, no explode, no shuffle, no UDF: the per-doc
    line loop stays inside the row, so this runs at full scan speed over
    100 TB.  Documents whose every line is dropped come back with empty
    text (n_kept = 0) — filter on n_kept downstream rather than silently
    dropping rows here."""
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(
        lines,
        lambda l: line_keep_predicate(
            l,
            min_words=min_words,
            require_terminal_punct=require_terminal_punct,
            blacklist=blacklist,
            max_line_chars=max_line_chars,
        ),
    )
    if dedup_lines:
        kept = F.array_distinct(kept)
    return df.select(
        F.col(id_col).alias("id"),
        F.array_join(kept, "\n").alias("text"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
    )


def unicode_normalize_col(
    c: Column | str, form: str = "NFC", casefold: bool = False
) -> Column:
    """Unicode normalization (NFC/NFD/NFKC/NFKD, optional casefold) of a
    string EXPRESSION — the column-level primitive under
    ``unicode_normalize`` (the DataFrame-level wrapper), and the pass that
    runs BEFORE exact dedup and fingerprinting: byte-different encodings
    of the same text ('é' precomposed vs 'e'+combining-acute, fullwidth
    ＡＢＣ vs ABC under the K forms) defeat hash-based dedup and inflate
    vocabulary.  Spark has no built-in normalizer, so this is the text
    stack's designated Arrow path: a pandas_udf over
    ``unicodedata.normalize`` — one Python roundtrip per batch, not per
    row.  NULLs pass through.  NFC is cross-engine checkable (DuckDB
    ``nfc_normalize``); the K forms are pinned by pytest against
    CPython's unicodedata."""
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(
            f"unicode_normalize_col: unknown form {form!r} "
            "(want NFC, NFD, NFKC or NFKD)"
        )
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(s):
        import unicodedata

        def one(x):
            if x is None:
                return None
            y = unicodedata.normalize(form, x)
            return y.casefold() if casefold else y

        return s.map(one)

    return _norm(F.col(c) if isinstance(c, str) else c)


def strip_html(c: Column | str) -> Column:
    """Remove tags and collapse whitespace — the cheap boilerplate-stripping
    pass before quality scoring (regexp, stays in codegen)."""
    t = F.col(c) if isinstance(c, str) else c
    no_tags = F.regexp_replace(t, r"<[^>]*>", " ")
    return F.trim(F.regexp_replace(no_tags, r"\s+", " "))


EMAIL_REGEX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_REGEX = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"


def mask_pii(c: Column | str, email_token: str = "<EMAIL>", ip_token: str = "<IP>") -> Column:
    """Replace emails and IPv4 literals with placeholder tokens — the
    minimal PII scrub a pretraining pipeline applies before anything else."""
    t = F.col(c) if isinstance(c, str) else c
    return F.regexp_replace(F.regexp_replace(t, EMAIL_REGEX, email_token), IPV4_REGEX, ip_token)


# Full scrub inventory. Patterns deliberately avoid lookarounds and
# backreferences so they run IDENTICALLY under Java regex (Spark, codegen)
# and RE2 (DuckDB — the test oracle; also what a Go/C++ reimplementation
# would use). Order matters and is fixed: ssn/cc before phone (a hyphenated
# SSN is phone-shaped), email before ip (an email's host can contain a
# dotted quad).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (EMAIL_REGEX, "<EMAIL>"),
    "ssn": (r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    "credit_card": (r"\b(?:[0-9]{4}[- ]){3}[0-9]{4}\b|\b[0-9]{15,16}\b", "<CC>"),
    "phone": (
        r"(?:\+?[0-9]{1,2}[-. ]?)?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}\b",
        "<PHONE>",
    ),
    "ipv4": (IPV4_REGEX, "<IP>"),
}


def scrub_pii(
    df: DataFrame,
    text_col: str,
    kinds: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Redact PII spans with typed placeholder tokens — the compliance
    pass a pretraining pipeline runs before anything is tokenized, as a
    chain of JVM-side ``regexp_replace`` (whole-stage codegen; no UDF, no
    Python in the hot path; at 100 TB this is a map-only scan).

    ``kinds`` picks from ``PII_PATTERNS`` (default: all, applied in the
    inventory's fixed precedence order regardless of the requested
    order); ``out_col`` defaults to replacing ``text_col`` in place.
    Companion ``pii_counts`` reports what WOULD be redacted — run it on a
    sample first to eyeball false-positive rates on your corpus; the
    patterns are deliberately recall-leaning (a 16-digit id redacts as
    <CC>), which for training data is the right failure direction.
    """
    if text_col not in df.columns:
        raise ValueError(f"column {text_col!r} not in input")
    use = list(PII_PATTERNS) if kinds is None else list(kinds)
    unknown = sorted(set(use) - set(PII_PATTERNS))
    if unknown:
        raise ValueError(f"unknown PII kind(s) {unknown}; have {list(PII_PATTERNS)}")
    out_col = text_col if out_col is None else out_col
    t = F.col(text_col)
    for kind in PII_PATTERNS:  # fixed precedence order
        if kind in use:
            pat, token = PII_PATTERNS[kind]
            t = F.regexp_replace(t, pat, token)
    return df.withColumn(out_col, t)


def pii_counts(
    df: DataFrame, id_col: str, text_col: str, kinds: list[str] | None = None
) -> DataFrame:
    """(id, <kind>_n per kind, pii_total) — how many PII spans each
    document carries, WITHOUT modifying anything: the audit/report side
    of ``scrub_pii`` (flag documents above a threshold, sample them,
    tune). One map-only projection (``regexp_extract_all`` + ``size``);
    counts are per-pattern on the ORIGINAL text, so overlapping kinds
    (an SSN is also phone-shaped) each count the span they match."""
    for c in (id_col, text_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in input")
    use = list(PII_PATTERNS) if kinds is None else list(kinds)
    unknown = sorted(set(use) - set(PII_PATTERNS))
    if unknown:
        raise ValueError(f"unknown PII kind(s) {unknown}; have {list(PII_PATTERNS)}")
    cols = [F.col(id_col).alias("id")]
    total = F.lit(0)
    for kind in PII_PATTERNS:
        if kind in use:
            # null text carries zero PII spans: size(null) is NULL under
            # ANSI but -1 under spark.sql.legacy.sizeOfNull — coalesce
            # handles the first, greatest clamps the second
            n = F.greatest(
                F.coalesce(
                    F.size(
                        F.regexp_extract_all(
                            F.col(text_col), F.lit(PII_PATTERNS[kind][0]), F.lit(0)
                        )
                    ),
                    F.lit(0),
                ),
                F.lit(0),
            )
            cols.append(n.alias(f"{kind}_n"))
            total = total + n
    return df.select(*cols, total.alias("pii_total"))


def fingerprint_cols(text_col: Column | str) -> dict[str, Column]:
    """The fingerprint expressions (md5 of normalized text + 16-hex rolling
    prefix) as named Columns — composable into wider per-doc selects (the
    text_normalize battery query) without a join."""
    norm = normalize_text(text_col)
    return {
        "fp_md5": F.md5(norm),
        "fp_prefix64": F.substring(F.md5(F.substring(norm, 1, 64)), 1, 16),
    }


def repetition_unit_cols(
    text_col: Column | str, unit: str = "line"
) -> dict[str, Column]:
    """Gopher's WITHIN-document duplicate line / paragraph rules (Rae et
    al. 2021, appendix A1.1 — 'duplicate line fraction', 'duplicate line
    character fraction', and the paragraph pair) as named Columns — pure
    higher-order-function expressions over the split array, ZERO shuffle,
    composable into a wider per-doc projection (the text_profile battery
    entry) exactly like ``fingerprint_cols``.

    ``repetition_metrics`` covers the n-GRAM half of Gopher's repetition
    suite (needs a per-(doc, gram) aggregate); this is the line/paragraph
    half, which never leaves the row:

    - dup_<unit>_frac: repeated units beyond their first occurrence /
      total units (1 - distinct/total)
    - dup_<unit>_char_frac: those repeats' character mass / total unit
      characters — the convention the open Gopher reproductions use
      (duplicates AFTER the first occurrence count; the first does not)

    Lines split on '\\n', paragraphs on blank-line runs ('\\n{2,}');
    units empty after the split are dropped (a trailing newline is not a
    duplicate line).  Empty documents yield 0.0 for every fraction.
    Fractions round to 6 places so cross-engine float hashing is stable.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    if unit == "line":
        sep, p = "\n", "line"
    elif unit == "paragraph":
        sep, p = "\\n{2,}", "para"
    else:
        raise ValueError(f"unit must be 'line' or 'paragraph', got {unit!r}")
    units = F.filter(F.split(c, sep), lambda x: F.length(x) > 0)
    distinct = F.array_distinct(units)

    def chars(arr: Column) -> Column:
        return F.aggregate(
            arr, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        )

    n, nd = F.size(units), F.size(distinct)
    tc, dc = chars(units), chars(distinct)
    return {
        f"dup_{p}_frac": F.round((n - nd) / F.greatest(n, F.lit(1)), 6),
        f"dup_{p}_char_frac": F.round((tc - dc) / F.greatest(tc, F.lit(1)), 6),
    }


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic document fingerprint: md5 of the normalized text plus a
    16-hex-char rolling prefix fingerprint (cheap locality clue)."""
    cols = fingerprint_cols(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        cols["fp_md5"].alias("fp_md5"),
        cols["fp_prefix64"].alias("fp_prefix64"),
    )


def robust_stats(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-key robust statistics: (key, n, median, mad) with
    mad = median(|x - median(x)|).

    r12: two JVM ``percentile`` aggregations (exact, interpolating — the
    same lower + frac·(upper−lower) rule NumPy's median applies at the
    0.5 midpoint) replace the grouped applyInPandas stage. Every row used
    to cross the JVM→Python boundary twice per run (Arrow out, Arrow
    back); now the whole operator is native partial-aggregate +
    final-aggregate (map-side combine, no Python workers, no
    FlatMapGroupsInPandas exchange pinning whole groups in one task —
    guide §4.1). MAD needs the group median first, so it is a second
    grouped pass over (value − median): one extra broadcast-joined
    aggregation instead of whole-group-in-hand Python.
    """
    # r13 hardening (ADVICE r12): project into a private namespace FIRST so
    # an input df that already carries columns named key/n/median/mad (or
    # any other name) can never make the self-join ambiguous, and use
    # F.percentile (a Column-API aggregate) instead of interpolating the
    # caller's column name into SQL text. Null-safe equality keeps the
    # null-key group the old applyInPandas path emitted (plain == would
    # silently drop it). NULL values are still ignored by percentile (SQL
    # aggregate semantics — the documented r12 change from NumPy's NaN).
    src = df.select(F.col(key_col).alias("key"), F.col(value_col).alias("__v"))
    med = src.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile(F.col("__v"), F.lit(0.5)).alias("median"),
    )
    # no broadcast hint on the median side: |keys| is data-dependent, so the
    # join strategy is left to Catalyst/AQE (broadcast when the aggregated
    # side is small, shuffle join at scale)
    dev = src.join(
        med.select(F.col("key").alias("__mk"), "median"),
        F.col("key").eqNullSafe(F.col("__mk")),
        "inner",
    ).select("key", F.abs(F.col("__v").cast("double") - F.col("median")).alias("__ad"))
    mad = dev.groupBy("key").agg(F.percentile(F.col("__ad"), F.lit(0.5)).alias("mad"))
    return med.join(
        mad.select(F.col("key").alias("__mk"), "mad"),
        F.col("key").eqNullSafe(F.col("__mk")),
        "inner",
    ).select("key", "n", "median", "mad")


def unigram_logprob(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_tokens, avg_logprob) — mean natural-log unigram probability of
    each document under the corpus's own MLE unigram model (add-one
    smoothed over the corpus vocabulary).

    The classic cheap perplexity proxy for training-data curation: very
    negative avg_logprob flags gibberish/boilerplate-mix documents, near-0
    flags degenerate repetition. Pure DataFrame composition — token
    explode, one corpus-counts shuffle (|vocab| rows out, broadcast back),
    one per-doc aggregate — every statistic exact arithmetic, so the whole
    operator verifies against a SQL oracle (tests/test_retrieval.py).

    p(t) = (cnt(t) + 1) / (N + V); tokens weighted by their occurrence
    count in the document (i.e. the sum runs over token instances).
    """
    from oni_ml_spark.datapipe.dedup import tokens

    tok = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("term")
    )
    per_doc = tok.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    corpus = per_doc.groupBy("term").agg(F.sum("tf").alias("cnt"))
    stats = corpus.agg(
        F.sum("cnt").alias("__n"), F.count(F.lit(1)).alias("__v")
    )
    model = corpus.join(F.broadcast(stats)).select(
        "term",
        F.log((F.col("cnt") + 1) / (F.col("__n") + F.col("__v")).cast("double")).alias(
            "__logp"
        ),
    )
    return (
        per_doc.join(F.broadcast(model), "term")
        .groupBy("id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            (F.sum(F.col("tf") * F.col("__logp")) / F.sum("tf")).alias("avg_logprob"),
        )
    )


def repetition_metrics(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(id, n_grams, distinct_n_grams, top_gram_frac, dup_gram_frac,
    top_gram_char_frac, dup_gram_char_frac) — the degenerate-repetition
    gate (looping generations, boilerplate spam, keyword stuffing).

    - top_gram_frac: occurrences of the single most frequent word n-gram /
      total n-grams (near 1.0 = one phrase looping)
    - dup_gram_frac: fraction of n-gram instances beyond each gram's first
      occurrence (1 - distinct/total; high = low information density)
    - top_gram_char_frac (r11, Gopher's 'top n-gram character fraction'):
      characters covered by all occurrences of the most frequent n-gram /
      document characters.  Ties on count break to the LONGEST gram —
      max(struct(count, len)) is deterministic where an arbitrary argmax
      would flap the value run-to-run (and against the SQL oracle).
    - dup_gram_char_frac (Gopher's 'duplicate n-gram character fraction'):
      characters covered by every occurrence of each gram appearing more
      than once / document characters — overlap-NAIVE, like the open
      reproductions: overlapping duplicate grams count their characters
      each time, so the ratio can exceed 1.0 on extreme loops (use the
      paper's per-n thresholds, which were tuned under the same
      convention).

    One explode + one (id, gram) count + one per-id aggregate, then an
    id-keyed join with the per-doc char count (both sides already per-id
    sized) — all map-side-combinable; no windows over data-sized input.
    Documents with fewer than n tokens have no n-grams and are absent
    (no gate signal).
    """
    from oni_ml_spark.datapipe.dedup import positional_ngrams

    exploded = df.select(
        F.col(id_col).alias("id"),
        F.explode(positional_ngrams(text_col, n)).alias("gram"),
    )
    per_gram = exploded.groupBy("id", "gram").agg(F.count(F.lit(1)).alias("c"))
    agg = per_gram.groupBy("id").agg(
        F.sum("c").cast("long").alias("n_grams"),
        F.count(F.lit(1)).cast("long").alias("distinct_n_grams"),
        F.round(F.max("c") / F.sum("c"), 6).alias("top_gram_frac"),
        F.round((F.sum("c") - F.count(F.lit(1))) / F.sum("c"), 6).alias("dup_gram_frac"),
        # lexicographic struct max = (max count, longest gram at that
        # count) — the deterministic tie-break documented above
        F.max(F.struct(F.col("c"), F.length("gram").alias("l"))).alias("__top"),
        F.sum(
            F.when(F.col("c") > 1, F.col("c") * F.length("gram")).otherwise(0)
        ).cast("long").alias("__dupchars"),
    )
    doc_chars = df.select(
        F.col(id_col).alias("id"), F.length(text_col).alias("__doc_chars")
    )
    return agg.join(doc_chars, "id").select(
        "id", "n_grams", "distinct_n_grams", "top_gram_frac", "dup_gram_frac",
        F.round(
            F.col("__top.c") * F.col("__top.l")
            / F.greatest("__doc_chars", F.lit(1)),
            6,
        ).alias("top_gram_char_frac"),
        F.round(
            F.col("__dupchars") / F.greatest("__doc_chars", F.lit(1)), 6
        ).alias("dup_gram_char_frac"),
    )


def ngram_contamination(
    df: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    eval_text_col: str | None = None,
    n: int = 8,
    train_shingles: DataFrame | None = None,
    eval_shingles: DataFrame | None = None,
) -> DataFrame:
    """(id, n_shingles, n_contaminated, contamination_frac) — per-document
    fraction of word n-gram shingles that also appear ANYWHERE in the
    evaluation corpus: the train/test leakage check run before training.

    n=8 is the usual benchmark-decontamination window (long enough that a
    shared gram implies copying, short enough to catch partial overlap).
    The eval side reduces to a DISTINCT shingle set — typically small next
    to the training corpus, so the membership probe is a broadcast-able
    left semi join keyed on the shingle; Spark/AQE picks broadcast when it
    fits and degrades to a shuffle join when the eval set is genuinely
    large. Documents shorter than n tokens have no shingles and report no
    row (no evidence either way).
    """
    from oni_ml_spark.datapipe.dedup import shingle_table

    ecol = eval_text_col or text_col
    # ``train_shingles`` / ``eval_shingles`` (r12): prebuilt per-doc distinct
    # shingle tables — (id, shingle) and (shingle,) — from a shared corpus
    # pass. Any equality-preserving shingle key works (raw gram text or an
    # md5 digest), since the operator only counts per-doc shingles and
    # probes membership against the eval set; callers must derive BOTH
    # sides with the same keying.
    train = (
        train_shingles
        if train_shingles is not None
        else shingle_table(df, id_col, text_col, n)
    )
    # the eval side reduces to its distinct shingle set — synthesize a
    # throwaway id so ANY eval frame works (a benchmark table need not
    # share the training corpus's id column)
    eval_sh = (
        eval_shingles.select("shingle").distinct()
        if eval_shingles is not None
        else shingle_table(
            eval_df.select(F.monotonically_increasing_id().alias("__eid"),
                           F.col(ecol)),
            "__eid", ecol, n,
        )
        .select("shingle")
        .distinct()
    )
    hit = train.join(eval_sh, "shingle", "left_semi").groupBy("id").agg(
        F.count(F.lit(1)).alias("__hits")
    )
    tot = train.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    return tot.join(hit, "id", "left").select(
        "id",
        F.col("n_shingles").cast("long").alias("n_shingles"),
        F.coalesce("__hits", F.lit(0)).cast("long").alias("n_contaminated"),
        F.round(
            F.coalesce("__hits", F.lit(0)) / F.col("n_shingles"), 6
        ).alias("contamination_frac"),
    )


def quality_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_mean_token_len: float = 3.0,
    max_mean_token_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
    stopwords: list[str] | None = None,
    alpha_regex: str = "[a-z]",
    max_dup_line_frac: float | None = None,
    max_dup_line_char_frac: float | None = None,
    max_dup_para_frac: float | None = None,
    max_dup_para_char_frac: float | None = None,
) -> DataFrame:
    """Gopher-style rule-based document quality gate (Rae et al. 2021,
    appendix A1.1) — the standard pretraining corpus filter, as ONE
    codegen projection returning (id, n_tokens, failed_rules, passes):

    - token count within [min_tokens, max_tokens]
    - mean token length within [min_mean_token_len, max_mean_token_len]
    - symbol-word ratio (words containing '#' or '...') <= max
    - fraction of words matching ``alpha_regex`` >= min
    - at least ``min_stopword_hits`` occurrences from ``stopwords``

    SCOPE — the DEFAULTS are English-only, like the Gopher paper's rules:
    ``alpha_regex`` matches ASCII [a-z] and ``stopwords`` defaults to the
    English marker list (LANG_MARKERS['en']), so with defaults every
    non-Latin-script document (e.g. Chinese) unconditionally fails the
    alpha and stopword rules. For a multilingual corpus, partition by
    ``lang_id`` first and gate each slice with its own ``stopwords`` (the
    other LANG_MARKERS lists are a starting point) and an appropriate
    ``alpha_regex`` (e.g. r'[\\p{L}]' for any-letter), or disable the two
    language-bound rules with min_stopword_hits=0, min_alpha_word_frac=0.

    failed_rules names every violated rule (empty array = clean), so the
    gate doubles as per-rule rejection accounting — aggregate
    explode(failed_rules) for the corpus rejection report; filter on
    ``passes`` for the corpus itself. Thresholds are keyword args: tighten
    or loosen per corpus without touching the plan shape.

    r11: the four ``max_dup_*`` kwargs arm Gopher's within-document
    repetition rules (``repetition_unit_cols`` — still zero-shuffle HOF
    expressions folded into the same projection).  Default ``None`` = off,
    preserving pre-r11 behavior; the paper's thresholds are 0.30 for the
    line/paragraph duplicate fractions and 0.20 for their character
    fractions (Rae et al. 2021, table A1).
    """
    stop_list = LANG_MARKERS["en"] if stopwords is None else list(stopwords)
    if not stop_list:
        raise ValueError(
            "stopwords must be non-empty (pass min_stopword_hits=0 to "
            "disable the rule instead)"
        )
    toks = tokens(text_col)
    n = F.size(toks)
    mean_len = F.when(n > 0, F.length(F.array_join(toks, "")) / n).otherwise(0.0)
    symbolic = F.size(
        F.filter(toks, lambda t: t.contains("#") | t.contains("..."))
    )
    alpha = F.size(F.filter(toks, lambda t: t.rlike(alpha_regex)))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*stop_list)))

    def rule(name: str, failed: Column) -> Column:
        return F.when(failed, F.lit(name)).otherwise(F.lit(None).cast("string"))

    rules = [
        rule("too_few_tokens", n < min_tokens),
        rule("too_many_tokens", n > max_tokens),
        rule("mean_token_len_low", mean_len < min_mean_token_len),
        rule("mean_token_len_high", mean_len > max_mean_token_len),
        rule(
            "symbol_ratio",
            symbolic > max_symbol_word_ratio * F.greatest(n, F.lit(1)),
        ),
        rule(
            "alpha_words",
            alpha < min_alpha_word_frac * F.greatest(n, F.lit(1)),
        ),
        rule("stopword_hits", stop_hits < min_stopword_hits),
    ]
    line_rep = repetition_unit_cols(text_col, "line")
    para_rep = repetition_unit_cols(text_col, "paragraph")
    for name, cap, col in (
        ("dup_line_frac", max_dup_line_frac, line_rep["dup_line_frac"]),
        ("dup_line_char_frac", max_dup_line_char_frac,
         line_rep["dup_line_char_frac"]),
        ("dup_para_frac", max_dup_para_frac, para_rep["dup_para_frac"]),
        ("dup_para_char_frac", max_dup_para_char_frac,
         para_rep["dup_para_char_frac"]),
    ):
        if cap is not None:
            rules.append(rule(name, col > float(cap)))
    failed = F.filter(F.array(*rules), lambda x: x.isNotNull())
    return df.select(
        F.col(id_col).alias("id"),
        n.cast("long").alias("n_tokens"),
        failed.alias("failed_rules"),
        (F.size(failed) == 0).alias("passes"),
    )


def unicode_normalize(
    df: DataFrame,
    col: str,
    form: str = "NFKC",
    casefold: bool = False,
    out_col: str | None = None,
) -> DataFrame:
    """Unicode-normalize a text column (NFC/NFD/NFKC/NFKD, optional
    casefold) — the canonicalization pass a multilingual corpus needs
    before ANY digest-keyed dedup: visually-identical strings with
    different codepoint sequences (composed é vs e+combining accent,
    full-width digits, ligatures) otherwise hash to different keys and
    slip through exact and MinHash dedup alike.

    Delegates to ``unicode_normalize_col`` — the single pandas_udf
    implementation (one copy to fix when pandas NA handling or the
    Unicode version ever needs pinning); this wrapper adds only the
    DataFrame/withColumn plumbing.  Deterministic; NULL passes through.
    """
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"form must be NFC/NFD/NFKC/NFKD, got {form!r}")
    return df.withColumn(
        out_col or col, unicode_normalize_col(col, form, casefold=casefold)
    )


def remove_contaminated(
    df: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    eval_text_col: str | None = None,
    n: int = 8,
    max_contamination: float = 0.0,
    fractions: DataFrame | None = None,
) -> DataFrame:
    """Benchmark decontamination REMOVAL: drop every training document whose
    word n-gram overlap with the evaluation corpus exceeds
    ``max_contamination`` (default 0.0 — any shared ``n``-gram rejects, the
    standard strict policy for benchmark decontamination).

    The measurement is ``ngram_contamination`` (distinct eval shingle set →
    semi-joinable membership probe); the removal is one left join + filter
    on its per-document fractions, so documents too short to have shingles
    (no evidence) are KEPT — they cannot contain an n-gram by construction.
    Returns the input rows minus the contaminated ones, schema unchanged.

    ``fractions``: a precomputed ``ngram_contamination(df, eval_df, ...)``
    result to reuse. The measurement is the expensive half (two shingle
    passes + a distributed semi join); a pipeline that already computed it
    for reporting should pass it (ideally cached/checkpointed) instead of
    paying for it twice.
    """
    # compare on the raw counts, NOT the (rounded) contamination_frac: a
    # 3M-shingle document with one shared gram rounds to 0.0 at 6 decimals
    # and would slip through the strict max_contamination=0.0 policy
    if fractions is None:
        fractions = ngram_contamination(df, eval_df, id_col, text_col, eval_text_col, n)
    frac = fractions.select(
        F.col("id").alias("__cid"), "n_shingles", "n_contaminated"
    )
    return (
        df.join(frac, df[id_col] == frac["__cid"], "left")
        .filter(
            F.col("n_contaminated").isNull()
            | (F.col("n_contaminated") <= max_contamination * F.col("n_shingles"))
        )
        .drop("__cid", "n_shingles", "n_contaminated")
    )
