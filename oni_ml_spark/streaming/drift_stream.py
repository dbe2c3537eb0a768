"""Streaming drift monitoring: maintain a live corpus's binned histogram
exactly-once as micro-batches arrive, and compare it on demand against a
frozen reference distribution — the "is today's crawl shifting under us,
WHILE it lands" composition of datapipe.drift and the exactly-once sink
discipline of streaming.upsert_sink (beyond the reference, which has no
streaming surface at all).

100 TB design: the state table is |edges|+2 rows (one per bin plus the
null bin) for the numeric sink and |keys|+2 rows ('__null' + '__other')
for the categorical one, regardless of stream volume. Each micro-batch
reduces to ONE map-side-combinable bounded aggregate; the merge is a
bounded full-outer join of two bounded frames. The report is pure
arithmetic over two bounded tables — the fact stream flows through and
is never stored. Replays are exactly-once via the same in-version batch
marker + query-token lineage guard as ``stats_writer`` (a replayed
histogram batch would otherwise double-count every bin). The binning /
dictionary travels WITH the state (committed ``_edges`` / ``_keys``
tables), so readers never trust a re-supplied list and roots of unknown
provenance refuse to merge.

Both sinks run ONE shared accumulate-merge-commit protocol
(``_accumulate_batch``): fixes to the replay guard, the unknown-root /
mismatch refusals, or the merge itself land once and apply to both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oni_ml_spark.datapipe.drift import _psi_terms, _sentinel_key, binned_counts
from oni_ml_spark.streaming.upsert_sink import (
    _accumulate_batch,
    _counts_merge,
    _read_side_list,
    _validate_sink_args,
    read_upsert_table,
)


def drift_writer(
    root: str,
    value_col: str,
    edges: list[float],
    keep_versions: int = 2,
    query_token: str = "default",
):
    """foreachBatch function accumulating the stream's binned histogram:
    ``stream.writeStream.foreachBatch(drift_writer(root, "value", EDGES))``.

    ``edges`` must be the FROZEN reference binning (compute it once on the
    baseline corpus — datapipe.drift's frozen-binning production mode);
    freezing it is what makes per-batch work a pure projection +
    aggregate with no driver round-trip, and makes histograms from
    different days directly comparable. The accumulated state is read
    back with ``read_upsert_table`` (columns bin, n_cur) and scored with
    ``stream_drift_report``.

    Merging counts is NOT idempotent, so the sink records the applied
    micro-batch id inside each committed version (``stats_writer``'s
    exactly-once protocol): replayed batches are skipped, and a marker
    written under a different ``query_token`` lineage raises instead of
    silently comparing incomparable batch ids. The binning travels with
    the state (committed ``_edges`` table); a root whose versions lack it
    (unknown binning) or committed different edges refuses to merge."""
    if not edges:
        raise ValueError("edges must be non-empty")
    _validate_sink_args(keep_versions, query_token)
    edges = [float(e) for e in edges]

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        _accumulate_batch(
            batch_df,
            batch_id,
            root,
            keep_versions,
            query_token,
            make_part=lambda b: binned_counts(b, value_col, edges, "cur"),
            merge_fn=_counts_merge("bin"),
            side_table="_edges",
            payload=edges,
            payload_schema="i int, edge double",
            payload_col="edge",
            what="binning",
            mismatch_msg=lambda stored: (
                f"drift state at {root} was built with edges {stored}, "
                f"not {edges} — accumulated bins are not comparable "
                "across binnings; start a new root to rebin"
            ),
        )

    return write_batch


def _read_edges(spark: SparkSession, root: str) -> list[float] | None:
    """The binning committed with the current state version (None before
    the first commit). Bounded read: |edges| rows."""
    return _read_side_list(spark, root, "_edges", "edge")


def stream_drift_report(
    spark: SparkSession,
    root: str,
    ref: DataFrame,
    value_col: str,
    edges: list[float] | None = None,
    smoothing: float = 0.5,
) -> DataFrame:
    """Per-bin drift table (same schema semantics as
    ``datapipe.drift.drift_compare``: bin, n_ref, n_cur, p_ref, p_cur,
    psi_term, kl_term) between a frozen REFERENCE corpus and everything a
    ``drift_writer`` sink has accumulated so far. The binning is read
    from the state itself (the sink commits its edges with every
    version), so the reference side is binned with the identical literal
    when-chain and the comparison is bin-for-bin exact by construction;
    pass ``edges`` only as an assertion — a mismatch against the stored
    binning raises instead of silently producing a phantom-bin PSI.

    Run it between batches (it reads the committed snapshot through the
    atomic pointer, so it never sees a half-merged state); sum psi_term
    against the drift.PSI_* thresholds for the go/no-go verdict."""
    if smoothing <= 0:
        raise ValueError("smoothing must be positive (log-ratio of empty bins)")
    cur = read_upsert_table(spark, root)
    if cur is None:
        raise ValueError(f"no committed drift state at {root} yet")
    stored = _read_edges(spark, root)
    if edges is None:
        edges = stored
    elif stored is not None and [float(e) for e in edges] != stored:
        raise ValueError(
            f"drift state at {root} was built with edges {stored}, not "
            f"{list(edges)} — rebinning the reference against accumulated "
            "bins would compare different partitions; start a new root"
        )
    if edges is None:
        raise ValueError(
            f"drift state at {root} has no committed _edges table and no "
            "edges were passed — was this root written by drift_writer?"
        )
    edges = [float(e) for e in edges]
    rc = binned_counts(ref, value_col, edges, "ref")
    both = rc.join(cur, "bin", "full_outer").select(
        "bin",
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )
    return _psi_terms(both, smoothing).select(
        "bin", "n_ref", "n_cur", "p_ref", "p_cur", "psi_term", "kl_term"
    )


def categorical_counts(
    df: DataFrame, key_col: str, keys: list[str], side: str
) -> DataFrame:
    """ONE (key, count) aggregate with FROZEN-DICTIONARY coarsening: keys
    in ``keys`` count individually, genuine NULLs count as '__null' (a
    feed that stopped labeling rows is its own drift signal, never folded
    into the tail), and every other value coarsens into '__other' — so
    the output is bounded at |keys|+2 rows no matter what the stream
    sends. Freezing the dictionary (compute it once on the baseline
    corpus, e.g. from drift_compare_categorical's kept keys) is the
    categorical analogue of frozen bin edges: it makes per-batch work a
    pure projection + map-side-combinable aggregate and keeps histograms
    from different days comparable. The '__null'/'__other' sentinel
    discipline is drift_compare_categorical's — a REAL value equal to a
    sentinel raises in-plan rather than silently merging populations.
    The dictionary membership test is a literal ``isin`` (codegen set
    probe): dictionaries are meant to be small (languages, event types,
    kept top-k keys), which is exactly what makes the state bounded."""
    key = _sentinel_key(
        F.col(key_col).cast("string"), ["__null", "__other"],
        "drift_stream categorical",
    )
    coarse = F.when(
        key.isin(*[str(k) for k in keys]) | (key == "__null"), key
    ).otherwise(F.lit("__other"))
    return (
        df.select(coarse.alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias(f"n_{side}"))
    )


def _validate_keys(keys: list[str]) -> list[str]:
    if not keys:
        raise ValueError("keys must be a non-empty frozen dictionary")
    keys = [str(k) for k in keys]
    if len(set(keys)) != len(keys):
        raise ValueError("keys must be distinct")
    bad = sorted(set(keys) & {"__null", "__other"})
    if bad:
        raise ValueError(
            f"keys {bad} collide with the reserved sentinels — rename the "
            "real categories upstream"
        )
    return keys


def drift_writer_categorical(
    root: str,
    key_col: str,
    keys: list[str],
    keep_versions: int = 2,
    query_token: str = "default",
):
    """foreachBatch function accumulating the stream's per-category counts
    — the categorical sibling of ``drift_writer``:
    ``stream.writeStream.foreachBatch(drift_writer_categorical(root, "lang", KEYS))``.

    State is |keys|+2 rows ('__null' + '__other' included) regardless of
    stream volume; each micro-batch reduces to ONE map-side-combinable
    aggregate (``categorical_counts``) and merges via a bounded
    full-outer join. Exactly-once via the in-version batch marker +
    query-token lineage guard shared with the numeric sink (ONE protocol,
    ``_accumulate_batch``). The frozen dictionary travels WITH the state
    (committed ``_keys`` table, like the numeric sink's ``_edges``): a
    writer re-supplying a different dictionary, or a root whose versions
    lack a committed dictionary, refuses instead of accumulating
    incomparable counts. Read back with ``read_upsert_table`` (columns
    key, n_cur); score with ``stream_drift_report_categorical``."""
    keys = _validate_keys(keys)
    _validate_sink_args(keep_versions, query_token)
    frozen = sorted(keys)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        _accumulate_batch(
            batch_df,
            batch_id,
            root,
            keep_versions,
            query_token,
            make_part=lambda b: categorical_counts(b, key_col, keys, "cur"),
            merge_fn=_counts_merge("key"),
            side_table="_keys",
            payload=frozen,
            payload_schema="i int, key string",
            payload_col="key",
            what="dictionary",
            mismatch_msg=lambda stored: (
                f"drift state at {root} was built with keys {stored}, "
                f"not {frozen} — counts coarsened under different "
                "dictionaries are not comparable; start a new root"
            ),
        )

    return write_batch


def _read_keys(spark: SparkSession, root: str) -> list[str] | None:
    """The frozen dictionary committed with the current state version
    (None before the first commit or for a foreign root). Bounded read:
    |keys| rows, returned sorted (the canonical stored order)."""
    return _read_side_list(spark, root, "_keys", "key")


def stream_drift_report_categorical(
    spark: SparkSession,
    root: str,
    ref: DataFrame,
    key_col: str,
    smoothing: float = 0.5,
) -> DataFrame:
    """Per-category drift table (drift_compare_categorical's schema: key,
    n_ref, n_cur, p_ref, p_cur, psi_term, kl_term) between a frozen
    REFERENCE corpus and everything a ``drift_writer_categorical`` sink
    has accumulated. The dictionary is read from the state itself, so the
    reference side coarsens with the IDENTICAL frozen dictionary and the
    comparison is key-for-key exact by construction — a root without a
    committed dictionary refuses. Bounded end-to-end: the window totals
    run over <= |keys|+2 rows."""
    if smoothing <= 0:
        raise ValueError("smoothing must be positive (log-ratio of empty bins)")
    cur = read_upsert_table(spark, root)
    if cur is None:
        raise ValueError(f"no committed drift state at {root} yet")
    stored = _read_keys(spark, root)
    if stored is None:
        raise ValueError(
            f"drift state at {root} has no committed _keys table — was "
            "this root written by drift_writer_categorical?"
        )
    rc = categorical_counts(ref, key_col, stored, "ref")
    both = rc.join(cur, "key", "full_outer").select(
        "key",
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )
    return _psi_terms(both, smoothing).select(
        "key", "n_ref", "n_cur", "p_ref", "p_cur", "psi_term", "kl_term"
    )
