"""Byte-pair-encoding tokenization (Sennrich et al. 2016) for token-budget
accounting and sequence packing that match a real trained tokenizer.

Split of labor, sized for 100 TB:

- TRAINING reduces the corpus to a word-frequency table first — a single
  distributed hash aggregate whose result is bounded by ``max_vocab_words``
  (language vocabularies plateau in the low millions regardless of corpus
  size). The merge loop itself is the classic driver-side algorithm over
  that table: O(num_merges · |vocab|) pure-Python work on counts, never on
  the corpus.
- APPLICATION is embarrassingly parallel: an Arrow-batched pandas UDF
  (mapInPandas) carrying the merge ranks, with a per-batch word →
  segmentation memo — natural text repeats words heavily, so the memo
  collapses most lookups to a dict hit. No shuffle at all: tokenization is
  a map-only stage.

Both halves are deterministic (ties in the merge loop break
lexicographically), so retraining on the same corpus or re-tokenizing on a
different cluster reproduces identical merges and identical token streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oni_ml_spark.datapipe.dedup import tokens

END = "</w>"  # end-of-word sentinel (distinguishes "in" from "in…g")


def word_frequencies(df: DataFrame, text_col: str, max_vocab_words: int) -> DataFrame:
    """(word, freq) for the ``max_vocab_words`` most frequent normalized
    whitespace words — the distributed reduction BPE training runs on.
    Deterministic top-K (freq desc, word asc)."""
    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(max_vocab_words)
    )


def _merge_word(sym: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(sym):
        if i + 1 < len(sym) and (sym[i], sym[i + 1]) == pair:
            out.append(sym[i] + sym[i + 1])
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def train_bpe_merges(
    df: DataFrame,
    text_col: str,
    num_merges: int = 200,
    max_vocab_words: int = 100_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Only the bounded
    word-frequency table leaves the cluster; the merge loop is the standard
    count-the-adjacent-pairs algorithm with lexicographic tie-breaking
    (fully deterministic across runs and engines)."""
    wf = {
        r["word"]: r["freq"]
        for r in word_frequencies(df, text_col, max_vocab_words).collect()
    }
    syms: list[tuple[str, ...]] = [tuple(list(w) + [END]) for w in wf]
    freqs: list[int] = list(wf.values())

    # Incremental pair bookkeeping (r05): each merge touches ONLY the words
    # that contain the merged pair — O(num_merges · |affected|), not
    # O(num_merges · |vocab| · word_len) — raising practical num_merges from
    # hundreds to tens of thousands. pair_counts mirrors what a full recount
    # over syms would produce at every step (zero-count pairs are deleted so
    # the argmax never sees them), so merges are identical to the original
    # from-scratch loop.
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, (sym, f) in enumerate(zip(syms, freqs)):
        for p in zip(sym, sym[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + f
            pair_words.setdefault(p, set()).add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        best, cnt = max(pair_counts.items(), key=lambda kv: (kv[1], kv[0]))
        # a pair must actually repeat to be worth a merge rule
        if cnt < 2:
            break
        merges.append(best)
        # pop first: the removal pass below drives best's count to exactly 0
        affected = pair_words.pop(best, set())
        for wi in affected:
            sym, f = syms[wi], freqs[wi]
            for p in zip(sym, sym[1:]):
                c = pair_counts[p] - f
                if c:
                    pair_counts[p] = c
                else:
                    pair_counts.pop(p, None)
                s = pair_words.get(p)
                if s is not None:
                    s.discard(wi)
            new = _merge_word(sym, best)
            syms[wi] = new
            for p in zip(new, new[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + f
                pair_words.setdefault(p, set()).add(wi)
    return merges


def merges_to_df(spark, merges: list[tuple[str, str]]) -> DataFrame:
    """Merge list as a (rank, left, right) DataFrame — the persistable half
    of a trained tokenizer (write to parquet next to the corpus it was
    trained on; num_merges rows, trivially small). Completes the same
    build-once/apply-many split as ``pq_codebooks_to_df`` and
    ``build_ivf_index``: train on the full corpus once, then every daily
    ingest reloads the table and runs the map-only ``apply_bpe``."""
    rows = [(i, left, right) for i, (left, right) in enumerate(merges)]
    return spark.createDataFrame(rows, "rank int, left string, right string")


def merges_from_df(df: DataFrame) -> list[tuple[str, str]]:
    """Inverse of ``merges_to_df``: reload the rank-ordered merge list from
    its persisted table (bounded collect: num_merges rows). Validates the
    rank sequence is exactly 0..n-1 — a partially-written or duplicated
    table would silently retokenize with wrong merge priorities."""
    rows = df.select("rank", "left", "right").collect()
    if not rows:
        raise ValueError("empty BPE merges table")
    by_rank: dict[int, tuple[str, str]] = {}
    for r in rows:
        if r["rank"] is None or r["left"] is None or r["right"] is None:
            raise ValueError(f"BPE merges table has null fields: {tuple(r)}")
        if r["rank"] in by_rank:
            raise ValueError(
                f"BPE merges table has duplicate rank {r['rank']} "
                "(priority order would be arbitrary)"
            )
        by_rank[r["rank"]] = (r["left"], r["right"])
    missing = [i for i in range(len(by_rank)) if i not in by_rank]
    if missing:
        raise ValueError(
            f"BPE merges table is not a contiguous 0..n-1 rank sequence; "
            f"missing ranks {missing[:5]}"
        )
    return [by_rank[i] for i in range(len(by_rank))]


def segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word by rank order — the exact inference rule of
    the trained tokenizer (lowest-rank applicable merge first)."""
    sym = tuple(list(word) + [END])
    while len(sym) > 1:
        best_rank, best_pair = None, None
        for p in zip(sym, sym[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        sym = _merge_word(sym, best_pair)
    return list(sym)


def apply_bpe(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """(id, bpe_tokens array<string>, n_bpe_tokens) — tokenize every
    document with the trained merges. Map-only Arrow-batched stage; the
    per-batch word memo makes cost proportional to DISTINCT words per
    batch, not total words."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    out_schema = (
        f"{id_col} {dict(df.dtypes)[id_col]}, "
        "bpe_tokens array<string>, n_bpe_tokens long"
    )
    # NULL text tokenizes to NULL (None in the Arrow batch), which would
    # TypeError inside the segment loop — coalesce to the empty stream so
    # null documents tokenize to [] like they train as nothing
    base = df.select(
        id_col,
        F.coalesce(
            tokens(text_col), F.array().cast("array<string>")
        ).alias("__toks"),
    )

    def run(batches):
        memo: dict[str, list[str]] = {}

        def seg(w: str) -> list[str]:
            got = memo.get(w)
            if got is None:
                got = memo[w] = segment_word(w, ranks)
            return got

        for pdf in batches:
            toks = pdf["__toks"].map(
                lambda ws: [s for w in ws for s in seg(w)]
            )
            yield type(pdf)({
                id_col: pdf[id_col],
                "bpe_tokens": toks,
                "n_bpe_tokens": toks.map(len),
            })

    return base.mapInPandas(run, schema=out_schema)
