"""Zero-extra-scan pipeline auditing via Spark's Observation API.

The operational question on a 100 TB curation run is "how many rows did
each stage drop, and why" — and the naive answer (a ``count()`` after every
stage) re-executes the whole upstream plan once PER CHECKPOINT: ten audit
points on a 100 TB pipeline is ten extra full passes. ``Observation``
metrics instead ride the ONE execution the pipeline already performs: each
audit point is an ``observe`` node whose aggregates are accumulated by the
tasks streaming through it, so the full audit trail costs one action and
zero extra scans.

Contrast with ``plans.diagnostics.profile_table`` (a deliberate one-scan
JOB over a table at rest): this module instruments a plan IN FLIGHT.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


class PipelineAudit:
    """Named row-count (and custom-metric) checkpoints through a pipeline,
    all measured during the single execution of the terminal action.

    Usage::

        audit = PipelineAudit()
        df = audit.observe(raw, "ingested")
        df = audit.observe(df.filter(...), "after_quality",
                           null_cols=["doc_id"],
                           metrics={"chars": F.sum("n_chars")})
        df.write...                    # ONE action executes the pipeline
        audit.report()                 # {"ingested": {"n_rows": ...}, ...}
        audit.dropped("ingested", "after_quality")   # rows lost between

    Contract notes, all consequences of how Spark observation works:

    - ``report()`` BLOCKS until the observed plan's first action completes
      — call it after the action, not before (there is nothing to report
      until tasks have run).
    - Only the FIRST action's metrics are kept by Spark; re-running the
      frame does not update them. Build a fresh audit per run.
    - An audit point only reports if its node actually executes: if the
      optimizer prunes the observed branch away (e.g. the caller discards
      that side of a union), its metrics never arrive. Spark's public
      ``Observation.get`` would block FOREVER on such a point, so
      ``report()`` probes readiness first (through the observation's
      underlying JVM ``getRowOrEmpty`` Option — non-blocking; the one
      place this module touches a private handle, because no public
      non-blocking probe exists) and raises naming the unready points
      instead of hanging the driver.
    - Metrics must be aggregate expressions without distinct (a Spark
      observe() restriction); counts and sums — the audit staples — are
      exactly what accumulates cheaply map-side.
    """

    def __init__(self) -> None:
        self._points: dict[str, Observation] = {}

    def observe(
        self,
        df: DataFrame,
        point: str,
        null_cols: list[str] | None = None,
        metrics: dict[str, Column] | None = None,
    ) -> DataFrame:
        """Attach an audit point named ``point`` and return the (otherwise
        unchanged) frame. Always records ``n_rows``; ``null_cols`` adds a
        ``n_null_<col>`` counter per named column; ``metrics`` adds
        arbitrary named aggregate expressions."""
        if point in self._points:
            raise ValueError(f"audit point '{point}' already registered")
        for c in null_cols or []:
            if c not in df.columns:
                raise ValueError(f"null_cols column '{c}' not in input")
        obs = Observation(point)
        aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
        for c in null_cols or []:
            aggs.append(
                F.sum(F.col(c).isNull().cast("long")).alias(f"n_null_{c}")
            )
        for name, expr in (metrics or {}).items():
            aggs.append(expr.alias(name))
        self._points[point] = obs
        return df.observe(obs, *aggs)

    def collected_points(self) -> list[str]:
        """Registered audit-point names, in registration order."""
        return list(self._points)

    @staticmethod
    def _is_ready(obs: Observation) -> bool:
        jo = getattr(obs, "_jo", None)
        if jo is None:
            return False  # df.observe() never attached this point
        try:
            # Option[Row]: empty until the listener delivers the metrics.
            # (The sibling getOrEmpty NPEs on the not-ready path in Spark
            # 4.1 — rowToJava on a schemaless row — so probe the Option.)
            return not jo.getRowOrEmpty().isEmpty()
        except Exception:  # noqa: BLE001 — internals shifted: treat as NOT
            # ready (the safe direction; a false "ready" would fall through
            # to the blocking .get and hang the driver forever)
            return False

    def ready_points(self) -> list[str]:
        """Points whose metrics have arrived (their observed node executed
        in a completed action), in registration order."""
        return [p for p, o in self._points.items() if self._is_ready(o)]

    def report(
        self, points: list[str] | None = None, wait_secs: float = 10.0
    ) -> dict[str, dict]:
        """Metrics for the requested ``points`` (default: all registered).

        Raises — rather than blocking forever on Spark's ``get`` — if any
        requested point has not executed (action not run, or the observed
        branch was pruned from the executed plan). Metrics are delivered by
        a listener a beat AFTER the action returns, so unready points are
        polled for up to ``wait_secs`` first: an executed point resolves in
        milliseconds; only a genuinely pruned/never-run point pays the full
        wait before the error."""
        import time

        names = points if points is not None else list(self._points)
        missing = [p for p in names if p not in self._points]
        if missing:
            raise ValueError(f"unknown audit point(s): {missing}")
        deadline = time.monotonic() + wait_secs
        not_ready = [p for p in names if not self._is_ready(self._points[p])]
        while not_ready and time.monotonic() < deadline:
            time.sleep(0.05)
            not_ready = [p for p in not_ready if not self._is_ready(self._points[p])]
        if not_ready:
            raise RuntimeError(
                f"audit point(s) not ready: {not_ready} — run the terminal "
                "action first; a point that stays unready after the action "
                "was pruned from the executed plan (its branch never ran)"
            )
        return {p: dict(self._points[p].get) for p in names}

    def dropped(self, before: str, after: str) -> int:
        """Row count lost between two audit points — the per-stage
        rejection number a curation report leads with."""
        rep = self.report([before, after])
        return int(rep[before]["n_rows"]) - int(rep[after]["n_rows"])
