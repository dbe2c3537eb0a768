"""Streaming drift monitoring: maintain a live corpus's binned histogram
exactly-once as micro-batches arrive, and compare it on demand against a
frozen reference distribution — the "is today's crawl shifting under us,
WHILE it lands" composition of datapipe.drift and the exactly-once sink
discipline of streaming.upsert_sink (beyond the reference, which has no
streaming surface at all).

100 TB design: the state table is |edges|+2 rows (one per bin plus the
null bin), regardless of stream volume. Each micro-batch reduces to ONE
map-side-combinable |bins|-row aggregate; the merge is a bounded
full-outer join of two |bins|-row frames. The report is pure arithmetic
over two bounded tables — the fact stream flows through and is never
stored. Replays are exactly-once via the same in-version batch marker +
query-token lineage guard as ``stats_writer`` (a replayed histogram
batch would otherwise double-count every bin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oni_ml_spark.datapipe.drift import _psi_terms, binned_counts
from oni_ml_spark.streaming.upsert_sink import (
    _check_schema,
    _commit_snapshot,
    _read_applied,
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
    silently comparing incomparable batch ids."""
    if not edges:
        raise ValueError("edges must be non-empty")
    if keep_versions < 1:
        raise ValueError(
            "keep_versions must be >= 1 — retention would delete the "
            "snapshot the pointer was just swapped to"
        )
    if not query_token or "\n" in query_token:
        raise ValueError("query_token must be non-empty and newline-free")
    edges = [float(e) for e in edges]

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= _read_applied(root, query_token):
            return  # replayed micro-batch: already folded into the state
        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        part = binned_counts(batch_df, value_col, edges, "cur")
        current = read_upsert_table(spark, root)
        _check_schema(current, part)
        if current is None:
            merged = part
        else:
            stored = _read_edges(spark, root)
            if stored is None:
                # a state version with no committed _edges table was NOT
                # written by this sink — its binning is unknown, and
                # merging into it is exactly the phantom-bin hazard the
                # guard exists to refuse (counts accumulated under one
                # binning silently folded with another's)
                raise ValueError(
                    f"drift state at {root} has no committed _edges table "
                    "— root of unknown binning (written by another sink?); "
                    "refusing to merge; start a new root"
                )
            if stored != edges:
                raise ValueError(
                    f"drift state at {root} was built with edges {stored}, "
                    f"not {edges} — accumulated bins are not comparable "
                    "across binnings; start a new root to rebin"
                )
            merged = (
                current.withColumnRenamed("n_cur", "__prev")
                .join(part.withColumnRenamed("n_cur", "__new"), "bin", "full_outer")
                .select(
                    "bin",
                    (
                        F.coalesce("__prev", F.lit(0)) + F.coalesce("__new", F.lit(0))
                    ).alias("n_cur"),
                )
            )
        # the binning travels WITH the state (committed before the pointer
        # swap), so readers never have to trust a re-supplied edges list
        edges_frame = spark.createDataFrame(
            [(i, e) for i, e in enumerate(edges)], "i int, edge double"
        )
        _commit_snapshot(
            root,
            merged,
            keep_versions,
            batch_marker=f"{query_token}\n{batch_id}",
            extra_frames={"_edges": edges_frame},
        )

    return write_batch


def _read_edges(spark: SparkSession, root: str) -> list[float] | None:
    """The binning committed with the current state version (None before
    the first commit). Bounded read: |edges| rows."""
    import os

    from oni_ml_spark.streaming.upsert_sink import _read_pointer

    v = _read_pointer(root)
    if v == 0:
        return None
    path = os.path.join(root, f"v{v:08d}", "_edges")
    if not os.path.isdir(path):  # root written by an older/other sink
        return None
    rows = spark.read.parquet(path).collect()
    return [r["edge"] for r in sorted(rows, key=lambda r: r["i"])]


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
