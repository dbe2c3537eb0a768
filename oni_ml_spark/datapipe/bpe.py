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
    vocab: dict[tuple[str, ...], int] = {
        tuple(list(w) + [END]): f for w, f in wf.items()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, f in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))
        # a pair must actually repeat to be worth a merge rule
        if best[1] < 2:
            break
        merges.append(best[0])
        vocab = {_merge_word(s, best[0]): f for s, f in vocab.items()}
    return merges


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
    base = df.select(id_col, tokens(text_col).alias("__toks"))

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
