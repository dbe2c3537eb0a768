"""Streaming deterministic reservoir sample: maintain a uniform /
weighted / stratified sample of EVERYTHING a stream has delivered,
exactly-once, with state bounded at k rows (k per stratum in
``group_col`` mode) — the "keep a representative eval slice of the
whole crawl while it lands" sink (beyond the reference, which has no
streaming surface; the batch sibling is datapipe.sampling's
Efraimidis–Spirakis ``weighted_sample_k``).

Why this is exact, not approximate: the sample is the k EARLIEST
exponential-clock arrivals (``sampling.aes_arrival`` — a deterministic
hash of (key, salt), no RNG) over all delivered rows, and "k smallest of
a union" is computable incrementally: state holds the current best k
rows WITH their arrival keys, each micro-batch reduces to its own best k
(ungrouped: TakeOrderedAndProject — per-partition partial top-k, no
sort/shuffle of the batch; stratified ``group_col`` mode: one
grouped_topk window, a batch shuffle by group), and the merge is a
union + re-rank over <=2k rows (per group). State is k rows ungrouped,
|groups|·k stratified. The final sample is therefore IDENTICAL for any
micro-batch partitioning of the same rows — batching-invariance is the
test contract — and identical to the batch ``weighted_sample_k`` over
the union of all batches (per stratum in grouped mode).

Exactly-once and provenance follow the module-shared
``_accumulate_batch`` protocol: replayed batch ids are no-ops, a marker
under a different query-token lineage raises, and the sampling
configuration (key/weight/salt/hash/k, plus group_col when stratified)
commits WITH the state — a writer re-supplying a different
configuration, or a root lacking one, refuses (draws from different
salts/hashes are incomparable order statistics; grouped and ungrouped
states have different shapes).

Determinism precondition (inherited from A-ES): key values must be
unique across the stream's lifetime — re-deliveries of the same key are
upstream's problem (compose with ``dedup_append_writer``); two state
rows sharing a key would share an arrival and the k-th slot tie would be
partition-order-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oni_ml_spark.datapipe.sampling import aes_arrival
from oni_ml_spark.streaming.upsert_sink import (
    _accumulate_batch,
    _read_side_list,
    _validate_sink_args,
    read_upsert_table,
)

_CONF_TABLE = "_sample_conf"
_ARRIVAL = "__arrival"


def sample_writer(
    root: str,
    key_col: str,
    k: int,
    weight_col: str | None = None,
    group_col: str | None = None,
    salt: str = "",
    hash_fn: str = "xxhash64",
    keep_versions: int = 2,
    query_token: str = "default",
):
    """foreachBatch function maintaining the k-row reservoir:
    ``stream.writeStream.foreachBatch(sample_writer(root, "doc_id", 10_000))``.

    ``weight_col=None`` is the uniform reservoir; a weight column gives
    the Efraimidis–Spirakis weighted sample without replacement (null /
    negative / NaN weights raise in-plan; zero-weight rows are never
    sampled). ``group_col`` makes it a STRATIFIED reservoir — k rows per
    stratum (source, language, day), the "balanced eval slice" shape:
    per batch one ``grouped_topk`` (k earliest arrivals per group), the
    merge a bounded per-group re-rank over <=2k rows per group; state is
    |groups|·k rows, so the group space must be bounded (it is a
    stratification key, not an id). A null group is its own stratum
    (SQL window-partition semantics — a feed that stopped labeling rows
    still gets sampled evidence). The same batching-invariance holds
    per stratum, and equals batch ``weighted_sample_k(...,
    group_cols=group_col)`` over the union. Read the current sample back
    with ``stream_sample`` — any committed version is a valid exact
    sample of everything applied so far, so readers never wait for the
    stream to end."""
    if k <= 0:
        raise ValueError("k must be positive")
    if hash_fn not in ("xxhash64", "md5"):
        raise ValueError(f"hash_fn must be xxhash64|md5, got {hash_fn!r}")
    if group_col is not None and group_col == key_col:
        raise ValueError("group_col must differ from key_col")
    _validate_sink_args(keep_versions, query_token)
    # repr-quoted values: 'weight_col=None' (no weighting) and a column
    # literally named "None" must commit DIFFERENT payloads, or a grouped
    # writer could silently merge into an ungrouped root; the group_col
    # line is appended only when set, so ungrouped roots keep the
    # original 5-line payload across releases
    conf = [
        f"key_col={key_col!r}",
        f"k={int(k)}",
        f"weight_col={weight_col!r}",
        f"salt={salt!r}",
        f"hash_fn={hash_fn!r}",
    ]
    if group_col is not None:
        conf.append(f"group_col={group_col!r}")

    def _topk(df: DataFrame) -> DataFrame:
        if group_col is None:
            return df.orderBy(_ARRIVAL, key_col).limit(k)
        from oni_ml_spark.datapipe.ranking import grouped_topk

        return grouped_topk(
            df, [group_col], _ARRIVAL, k, ascending=True, tie_col=key_col
        ).drop("rank")

    def make_part(batch_df: DataFrame) -> DataFrame:
        reserved = {_ARRIVAL} | ({"rank"} if group_col is not None else set())
        hit = sorted(reserved & set(batch_df.columns))
        if hit:
            raise ValueError(
                f"input carries reserved column(s) {hit} — rename them"
            )
        for c in (key_col, weight_col, group_col):
            if c is not None and c not in batch_df.columns:
                raise ValueError(f"column {c!r} missing from the stream")
        arr = aes_arrival(key_col, weight_col, salt, hash_fn, "sample_writer")
        return _topk(
            batch_df.where(F.col(key_col).isNotNull())
            .withColumn(_ARRIVAL, arr)
            .where(F.col(_ARRIVAL).isNotNull())
        )

    def merge(current: DataFrame, part: DataFrame) -> DataFrame:
        # <=2k rows (per group); the secondary sort on the key makes the
        # cut a total order even under a hash collision
        return _topk(current.unionByName(part))

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        _accumulate_batch(
            batch_df,
            batch_id,
            root,
            keep_versions,
            query_token,
            make_part=make_part,
            merge_fn=merge,
            side_table=_CONF_TABLE,
            payload=conf,
            payload_schema="i int, v string",
            payload_col="v",
            what="sampling configuration",
            mismatch_msg=lambda stored: (
                f"sample state at {root} was built with {stored}, not "
                f"{conf} — draws under different keys/salts/hashes are "
                "incomparable order statistics; start a new root"
            ),
        )

    return write_batch


def stream_sample(spark: SparkSession, root: str) -> DataFrame:
    """The current sample — k rows, or k per stratum for a
    ``group_col`` root (original stream schema — the internal arrival
    key is dropped). Reads the committed snapshot through the
    atomic pointer, so it never sees a half-merged state; refuses roots
    without a committed sampling configuration."""
    cur = read_upsert_table(spark, root)
    if cur is None:
        raise ValueError(f"no committed sample state at {root} yet")
    if _read_side_list(spark, root, _CONF_TABLE, "v") is None:
        raise ValueError(
            f"sample state at {root} has no committed {_CONF_TABLE} table "
            "— was this root written by sample_writer?"
        )
    return cur.drop(_ARRIVAL)
