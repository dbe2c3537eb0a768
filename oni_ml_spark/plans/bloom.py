"""Bloom-filter pre-filtered equi joins (semi / anti) for very large fact sides.

At the 100 TB target, ``fact LEFT ANTI JOIN seen`` (incremental-ingest dedup,
"remove everything already in the corpus") shuffles the ENTIRE fact table on
the join key even when almost nothing matches.  A Bloom filter built over the
small side is a few-MB broadcast bitmap that classifies every fact row
JVM-side, pre-shuffle:

- "definitely absent"  -> the row's final join outcome is already known
  (kept for anti, dropped for semi) WITHOUT shuffling it;
- "maybe present"      -> only these rows (true matches + the false-positive
  fraction of non-members) flow into the exact shuffle join, which settles
  them precisely.

The result is bitwise-identical to the plain semi/anti join — the bitmap has
no false negatives, and every "maybe" is re-checked exactly — but the shuffle
carries ``matches + fpp * non_members`` rows instead of all of them.  With the
default 2^23-bit / 5-hash filter, 100k build keys give fpp ~= 1e-4.

Spark's own runtime row-level bloom pushdown (SPARK-32268) covers inner joins
chosen by the optimizer; this module makes the pattern explicit, persistable
(the filter is a 1-row DataFrame you can write to parquet and reuse across
daily ingests), and available for semi/anti shapes.

Beyond-reference operator (SURVEY.md §7.5 ingest-dedup family); the classic
construction follows Bloom (CACM 1970).

Implementation notes (all JVM-side, no Python boundary):
- build: explode ``num_hashes`` seed literals, ``xxhash64(key, seed) % m``,
  bit_or partial-aggregated per 64-bit word — the shuffle after map-side
  combine is at most ``m/64`` rows per partition;
- the dense word array is assembled in-plan (map_from_entries over the sparse
  words + transform(sequence)); the single-row collect_list is bounded by
  ``num_bits/64`` entries (1 MiB at the default, 16 MiB at the cap);
- probe: crossJoin(broadcast(1-row filter)) + k getbit checks inside
  whole-stage codegen.  Null probe keys hash to some bit pattern; whichever
  branch they land in, the outcome matches SQL equi-join semantics (null
  never matches: semi drops, anti keeps) because the "maybe" branch ends in
  the exact join.
"""

from __future__ import annotations

import math
from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MAX_BITS = 1 << 27  # 16 MiB of words — broadcast-sized ceiling

# Names the probe plumbing introduces on the big side; a user column with
# one of these names would be silently overwritten/dropped, so the join
# wrappers reject the collision up front.
_RESERVED = frozenset(
    {"__might", "__bloom_words", "__bloom_num_bits", "__bloom_num_hashes"}
)


def _keys(key: str | Sequence[str]) -> list[str]:
    return [key] if isinstance(key, str) else list(key)


def expected_fpp(n_keys: int, num_bits: int, num_hashes: int) -> float:
    """Textbook Bloom false-positive probability (1 - e^{-kn/m})^k."""
    if n_keys <= 0:
        return 0.0
    return (1.0 - math.exp(-num_hashes * n_keys / num_bits)) ** num_hashes


def optimal_num_hashes(num_bits: int, n_keys: int) -> int:
    """fpp-minimizing hash count round((m/n) ln 2), clamped to [1, 16]."""
    if n_keys <= 0:
        return 1
    return max(1, min(16, round(num_bits / n_keys * math.log(2.0))))


def _validate_params(num_bits: int, num_hashes: int) -> None:
    if num_bits < 64 or num_bits % 64 != 0 or num_bits > _MAX_BITS:
        raise ValueError(
            f"num_bits must be a multiple of 64 in [64, {_MAX_BITS}], got {num_bits}"
        )
    if not 1 <= num_hashes <= 16:
        raise ValueError(f"num_hashes must be in [1, 16], got {num_hashes}")


def build_bloom_filter(
    df: DataFrame,
    key: str | Sequence[str],
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
) -> DataFrame:
    """Build a Bloom filter over ``df``'s key column(s) as a 1-row DataFrame.

    Schema ``(words array<bigint>, num_bits bigint, num_hashes int,
    key_types array<string>)`` — plain data, so ``io.write_parquet``
    persists it and a reloaded filter probes identically (hashes are
    xxhash64: engine-stable across sessions).  ``key_types`` records the
    build keys' Spark SQL types: xxhash64 hashes (value, type), so probing
    a filter built over int keys with bigint keys would silently produce
    false NEGATIVES — the join wrappers validate the stored types against
    the probe side and refuse the mismatch.

    Rows with any null key component are excluded: they can never satisfy an
    equi join, and both join wrappers route them to their exact SQL outcome.
    """
    _validate_params(num_bits, num_hashes)
    keys = _keys(key)
    dtypes = dict(df.dtypes)
    n_words = num_bits // 64
    non_null = reduce(lambda a, b: a & b, [F.col(k).isNotNull() for k in keys])
    seeds = F.array(*[F.lit(i).cast("int") for i in range(num_hashes)])
    pos = F.pmod(F.xxhash64(*[F.col(k) for k in keys], F.col("__seed")), F.lit(num_bits))
    sparse = (
        df.select(*keys)
        .where(non_null)
        .select(F.explode(seeds).alias("__seed"), *keys)
        .select(pos.alias("__pos"))
        .select(
            F.shiftright(F.col("__pos"), 6).cast("int").alias("word_idx"),
            # SQL form: the DSL shiftleft only takes a literal shift amount
            F.expr("shiftleft(cast(1 as bigint), cast(__pos & 63 as int))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )
    # Dense word array assembled in-plan: left-join the sparse words onto a
    # generated [0, n_words) index (absent words are zero), then ONE
    # array_sort(collect_list(struct)) orders them positionally — O(n log n).
    # (The first formulation probed a collected MAP once per index;
    # Catalyst's element_at on a map is a linear scan, so that was
    # O(n_words²) — a 2^26-bit filter took effectively forever.)  The
    # one-row collect_list is bounded by n_words entries (16 MiB at the
    # cap).  An empty build side yields an all-zero filter (groupBy() over
    # empty input still emits one row).
    spark = df.sparkSession
    dense = (
        spark.range(n_words)
        .select(F.col("id").cast("int").alias("word_idx"))
        .join(sparse, "word_idx", "left")
        .select("word_idx", F.coalesce("word", F.lit(0).cast("bigint")).alias("word"))
    )
    return dense.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("word_idx", "word"))),
            lambda s: s["word"],
        ).alias("words"),
        F.lit(num_bits).cast("bigint").alias("num_bits"),
        F.lit(num_hashes).cast("int").alias("num_hashes"),
        F.array(*[F.lit(dtypes[k]) for k in keys]).alias("key_types"),
    )


def merge_bloom_filters(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two Bloom filters: the filter of ``keys(a) ∪ keys(b)`` is the
    element-wise OR of the word arrays — exact, not approximate (Bloom
    filters with identical (num_bits, num_hashes, key_types) are closed
    under union).  Build parameters are validated against each other at
    plan-construction time via two bounded 1-row reads; a mismatch raises
    (OR-ing differently-parameterized bitmaps would produce false
    NEGATIVES).  One ``zip_with`` over the two 1-row frames — no shuffle
    beyond the broadcast of a 1-row side."""
    pa = a.select("num_bits", "num_hashes", "key_types").first()
    pb = b.select("num_bits", "num_hashes", "key_types").first()
    if (int(pa[0]), int(pa[1]), list(pa[2])) != (int(pb[0]), int(pb[1]), list(pb[2])):
        raise ValueError(
            f"cannot merge bloom filters with different build parameters: "
            f"(num_bits, num_hashes, key_types) = "
            f"({int(pa[0])}, {int(pa[1])}, {list(pa[2])}) vs "
            f"({int(pb[0])}, {int(pb[1])}, {list(pb[2])})"
        )
    other = b.select(F.col("words").alias("__other_words"))
    return a.crossJoin(F.broadcast(other)).select(
        F.zip_with("words", "__other_words", lambda x, y: x.bitwiseOR(y)).alias(
            "words"
        ),
        "num_bits",
        "num_hashes",
        "key_types",
    )


def update_bloom_filter(
    bloom: DataFrame, df: DataFrame, key: str | Sequence[str]
) -> DataFrame:
    """Fold ``df``'s keys into an existing filter WITHOUT rescanning the
    original build side: build a filter over just the new keys with the
    stored parameters, then OR the bitmaps.  The daily-ingest shape — the
    per-refresh cost is ∝ the new batch, never the accumulated ledger.
    Deletions are impossible (bits are shared); rebuild when the fpp
    budget erodes (``expected_fpp`` with the new total key count)."""
    keys = _keys(key)
    stored = bloom.select("num_bits", "num_hashes", "key_types").first()
    got = [dict(df.dtypes).get(k) for k in keys]
    if list(stored[2]) != got:
        raise ValueError(
            f"stored bloom filter was built over key types {list(stored[2])} "
            f"but the update batch carries {got} — rebuild or cast the keys"
        )
    # pin: merge_bloom_filters validates via first() and the merged plan
    # reads the frame again — without the pin the delta build runs twice
    delta = build_bloom_filter(df, keys, int(stored[0]), int(stored[1])).localCheckpoint(
        eager=True
    )
    return merge_bloom_filters(bloom, delta)


def might_contain_col(
    key: str | Sequence[str], num_bits: int, num_hashes: int, words_col: str = "words"
) -> "F.Column":
    """Boolean probe expression against a joined-in ``words`` array column.

    All ``num_hashes`` getbit checks run inside whole-stage codegen.  The
    seed literals and modulus MUST match the build call (the join wrappers
    guarantee this).
    """
    _validate_params(num_bits, num_hashes)
    keys = _keys(key)
    checks = []
    for i in range(num_hashes):
        pos = F.pmod(
            F.xxhash64(*[F.col(k) for k in keys], F.lit(i).cast("int")), F.lit(num_bits)
        )
        word = F.element_at(F.col(words_col), F.shiftright(pos, 6).cast("int") + F.lit(1))
        checks.append(F.getbit(word, pos.bitwiseAND(F.lit(63)).cast("int")) == F.lit(1))
    return F.coalesce(reduce(lambda a, b: a & b, checks), F.lit(False))


def _check_key_types(big: DataFrame, small: DataFrame, keys: list[str]) -> None:
    # xxhash64 hashes (value, type) — an int build key probed as bigint would
    # hash differently and manufacture false NEGATIVES, i.e. wrong results.
    big_t = dict(big.dtypes)
    small_t = dict(small.dtypes)
    for k in keys:
        if k not in big_t or k not in small_t:
            raise ValueError(f"join key {k!r} missing from one side")
        if big_t[k] != small_t[k]:
            raise ValueError(
                f"join key {k!r} type mismatch: big={big_t[k]} small={small_t[k]} — "
                "cast both sides to the same type before the bloom join"
            )


def _prefiltered(
    big: DataFrame,
    small: DataFrame,
    keys: list[str],
    num_bits: int,
    num_hashes: int,
    bloom: DataFrame | None,
    materialize: bool,
) -> DataFrame:
    _check_key_types(big, small, keys)
    reserved = _RESERVED & set(big.columns)
    if reserved:
        raise ValueError(
            f"big side carries reserved column(s) {sorted(reserved)} — rename "
            "them before the bloom join (they would be silently overwritten "
            "and dropped by the probe plumbing)"
        )
    if bloom is None:
        bloom = build_bloom_filter(small, keys, num_bits, num_hashes)
    else:
        # A reloaded filter probed with different parameters than it was
        # built with would hash to the wrong bit positions and manufacture
        # false NEGATIVES (wrong results, silently).  The frame stores its
        # own build parameters — make them authoritative.  Bounded: a 1-row
        # first() on a 1-row frame.
        if "key_types" not in bloom.columns:
            raise ValueError(
                "bloom filter frame lacks the key_types column — rebuild it "
                "with build_bloom_filter (a filter of unknown key types "
                "cannot be safely probed: a type drift since build time "
                "would silently drop matching rows)"
            )
        stored = bloom.select("num_bits", "num_hashes", "key_types").first()
        num_bits, num_hashes = int(stored[0]), int(stored[1])
        _validate_params(num_bits, num_hashes)
        big_t = dict(big.dtypes)
        got = [big_t[k] for k in keys]
        if list(stored[2]) != got:
            raise ValueError(
                f"stored bloom filter was built over key types {list(stored[2])} "
                f"but the probe side carries {got} — xxhash64 hashes (value, "
                "type), so probing across a type change silently produces "
                "false negatives; rebuild the filter or cast the keys"
            )
    if materialize:
        # The 1-row filter feeds both the keep and the maybe branch; pin it so
        # the build aggregation runs once (bounded: <= num_bits/64 longs).
        bloom = bloom.localCheckpoint(eager=True)
    # Rename the filter's columns to reserved names before the crossJoin so a
    # big side that ALREADY has a "words"/"num_bits"/"num_hashes" column (a
    # text corpus very plausibly does) never collides: with duplicates, the
    # probe's F.col("words") would be ambiguous and drop("words") would take
    # the user's column with it.
    bloom = bloom.select(
        F.col("words").alias("__bloom_words"),
        F.col("num_bits").alias("__bloom_num_bits"),
        F.col("num_hashes").alias("__bloom_num_hashes"),
    )
    return big.crossJoin(F.broadcast(bloom)).withColumn(
        "__might", might_contain_col(keys, num_bits, num_hashes, "__bloom_words")
    ).drop("__bloom_words", "__bloom_num_bits", "__bloom_num_hashes")


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    key: str | Sequence[str],
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
    bloom: DataFrame | None = None,
    materialize: bool = True,
) -> DataFrame:
    """``big LEFT SEMI JOIN small`` with a Bloom pre-filter on the big side.

    Result-identical to ``big.join(small, key, "leftsemi")``: definite-miss
    rows are dropped pre-shuffle (no false negatives), and the surviving
    "maybe" rows — true matches plus the fpp sliver — are settled by the
    exact semi join.  Pass a persisted ``bloom`` to skip the build scan; its
    stored num_bits / num_hashes override the arguments (probing with
    mismatched parameters would silently produce false negatives).
    """
    keys = _keys(key)
    pre = _prefiltered(big, small, keys, num_bits, num_hashes, bloom, materialize)
    maybes = pre.where(F.col("__might")).drop("__might")
    return maybes.join(small.select(*keys).distinct(), keys, "leftsemi")


def bloom_anti_join(
    big: DataFrame,
    small: DataFrame,
    key: str | Sequence[str],
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
    bloom: DataFrame | None = None,
    materialize: bool = True,
) -> DataFrame:
    """``big LEFT ANTI JOIN small`` with a Bloom pre-filter on the big side.

    Definite-miss rows (the overwhelming majority in incremental-ingest
    dedup) are KEPT pre-shuffle; only "maybe" rows enter the exact anti
    join.  Costs a second pass over ``big``'s key+payload columns in
    exchange for shuffling ``matches + fpp * non_members`` rows instead of
    all of them — the winning trade whenever the scan is columnar and the
    match fraction is small.  Result-identical to the plain anti join
    (null-key rows: fail the filter -> kept directly; pass it -> kept by
    the exact join — SQL anti semantics either way).
    """
    keys = _keys(key)
    pre = _prefiltered(big, small, keys, num_bits, num_hashes, bloom, materialize)
    kept = pre.where(~F.col("__might")).drop("__might")
    maybes = pre.where(F.col("__might")).drop("__might")
    settled = maybes.join(small.select(*keys).distinct(), keys, "leftanti")
    return kept.unionByName(settled)
