"""Document chunking and sequence packing — the shape operators between a
cleaned corpus and a training run.

- ``chunk_documents``: split each document into fixed-size token windows
  (with overlap) — one row per chunk. Pure native expressions: tokenize
  once, explode a window-start sequence, slice + rejoin. Linear, no
  shuffle, no Python.
- ``pack_sequences``: greedily pack documents into fixed-capacity bins
  (context windows) so short documents don't waste sequence slots.
  Bin packing is inherently sequential, so the scalable formulation packs
  WITHIN partitions: documents range-repartition and sort by descending
  token count, then an Arrow-batched ``mapInPandas`` runs first-fit-
  decreasing per partition (the iterator spans the whole sorted partition,
  so the greedy state survives Arrow batch boundaries). Bin ids are
  globally unique via (partition, local bin). Guarantee: no bin exceeds
  ``capacity`` unless a single document alone does (chunk first for strict
  caps — compose with ``chunk_documents``). A naive cumsum/div bucketing
  does NOT give this guarantee: a bin straddling a capacity boundary can
  collect two documents that jointly overflow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oni_ml_spark.datapipe.dedup import tokens


class _FirstFitTree:
    """Leftmost bin with remaining capacity >= need, in O(log bins).

    A max segment tree over bins in creation order (leaves = remaining
    capacities, inner nodes = subtree max), doubling on growth. Selecting
    the LEFTMOST fitting bin is what makes this first-fit — bit-identical
    assignments to the naive linear scan it replaced (a plain bisect over
    sorted capacities would be best-fit, a different packing) — so packing
    output is unchanged while per-document cost drops from O(open bins) to
    O(log bins)."""

    __slots__ = ("size", "tree", "n")

    def __init__(self) -> None:
        self.size = 1
        self.tree = [-1, -1]  # 1-indexed heap layout; leaves at [size, 2*size)
        self.n = 0

    def _grow(self) -> None:
        old_size, old = self.size, self.tree
        self.size *= 2
        tree = [-1] * (2 * self.size)
        tree[self.size : self.size + old_size] = old[old_size : 2 * old_size]
        for i in range(self.size - 1, 0, -1):
            tree[i] = tree[2 * i] if tree[2 * i] >= tree[2 * i + 1] else tree[2 * i + 1]
        self.tree = tree

    def _pull_up(self, i: int) -> None:
        while i > 1:
            i //= 2
            v = self.tree[2 * i] if self.tree[2 * i] >= self.tree[2 * i + 1] else self.tree[2 * i + 1]
            if self.tree[i] == v:
                break
            self.tree[i] = v

    def append(self, rem: int) -> None:
        if self.n == self.size:
            self._grow()
        i = self.size + self.n
        self.n += 1
        self.tree[i] = rem
        self._pull_up(i)

    def take(self, idx: int, need: int) -> None:
        i = self.size + idx
        self.tree[i] -= need
        self._pull_up(i)

    def first_fit(self, need: int) -> int:
        """Index of the leftmost bin with remaining >= need, or -1."""
        if self.tree[1] < need:
            return -1
        i = 1
        while i < self.size:
            i *= 2
            if self.tree[i] < need:
                i += 1
        return i - self.size


def chunk_token_arrays(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    chunk_tokens: int = 512,
    overlap: int = 0,
) -> DataFrame:
    """(id, chunk_no, tokens array, n_tokens) — token-window chunks over a
    PRETOKENIZED array column: the variant a tokenizer-faithful pipeline
    uses (e.g. ``bpe.apply_bpe``'s pieces, where whitespace counts under-
    or over-estimate the real sequence budget). ``chunk_documents`` is the
    whitespace-text wrapper over this same window logic — one home for the
    stride/edge arithmetic.

    Windows start every ``chunk_tokens - overlap`` tokens; the final window
    may be shorter. Empty arrays yield zero rows.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}")
    stride = chunk_tokens - overlap
    toks = F.col(tokens_col)
    n = F.size(toks)
    # window starts: 1, 1+stride, ... while start <= n (1-based slice);
    # any non-empty doc yields at least one chunk even when n <= overlap
    n_chunks = F.when(
        n > 0, F.greatest(F.ceil((n - F.lit(overlap)) / F.lit(stride)), F.lit(1))
    ).otherwise(F.lit(0))
    starts = F.sequence(F.lit(0), n_chunks - 1)
    exploded = df.select(
        F.col(id_col).alias("id"), toks.alias("__toks"),
        F.posexplode(
            F.when(n_chunks > 0, starts).otherwise(F.array().cast("array<long>"))
        ).alias("chunk_no", "__start_idx"),
    )
    chunk = F.slice(
        F.col("__toks"), F.col("__start_idx").cast("int") * stride + 1, chunk_tokens
    )
    return exploded.select(
        "id",
        F.col("chunk_no").cast("long").alias("chunk_no"),
        chunk.alias("tokens"),
        F.size(chunk).cast("long").alias("n_tokens"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 512,
    overlap: int = 0,
) -> DataFrame:
    """(id, chunk_no, chunk_text, n_tokens) — token-window chunks of a text
    column (whitespace tokens; see ``chunk_token_arrays`` for pretokenized
    input). Windows start every ``chunk_tokens - overlap`` tokens; the
    final window may be shorter. Empty/whitespace-only documents yield
    zero rows.
    """
    base = df.select(F.col(id_col).alias("id"), tokens(text_col).alias("__t"))
    out = chunk_token_arrays(base, "id", "__t", chunk_tokens, overlap)
    return out.select(
        "id",
        "chunk_no",
        F.array_join("tokens", " ").alias("chunk_text"),
        "n_tokens",
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    capacity: int = 2048,
    num_partitions: int | None = None,
    n_tokens_col: str | None = None,
) -> DataFrame:
    """(id, n_tokens, bin_id) — assign each document to a packing bin.

    First-fit-decreasing per partition (see module docstring). Documents
    longer than the capacity get a bin of their own.

    ``n_tokens_col`` (r12): callers that already carry a whitespace token
    count (``chunk_documents`` emits one per chunk) can name it to skip
    re-tokenizing ``text_col`` — the count feeds both the range
    partitioner's sampling pass and the shuffle itself, so without it the
    corpus is tokenized twice per pack (guide §2.3: shuffle metadata, not
    payloads). Values are identical by construction for chunk output
    (chunk_text is the single-space join of the counted tokens).
    """
    from collections.abc import Iterator

    import pandas as pd

    from pyspark.sql import types as T

    spark = df.sparkSession
    n_parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    count_col = (
        F.col(n_tokens_col) if n_tokens_col is not None else F.size(tokens(text_col))
    )
    sized = df.select(
        F.col(id_col).alias("id"), count_col.cast("long").alias("n_tokens")
    )
    ranged = sized.repartitionByRange(
        n_parts, F.desc("n_tokens")
    ).sortWithinPartitions(F.desc("n_tokens"), F.col("id"))

    out_schema = T.StructType(
        [
            T.StructField("id", sized.schema["id"].dataType),
            T.StructField("n_tokens", T.LongType()),
            T.StructField("bin_id", T.StringType()),
        ]
    )

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        ff = _FirstFitTree()  # remaining capacity per open bin, O(log bins)/doc
        for pdf in batches:
            bins = []
            for n in pdf["n_tokens"]:
                n = int(n)
                bi = ff.first_fit(n)
                if bi >= 0:
                    ff.take(bi, n)
                else:
                    bi = ff.n
                    ff.append(max(capacity - n, 0))
                bins.append(bi)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_tokens": pdf["n_tokens"].astype("int64"),
                    "bin_id": [f"{pid}_{b}" for b in bins],
                }
            )

    return ranged.mapInPandas(pack, out_schema)
