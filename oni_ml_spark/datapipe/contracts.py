"""Data-contract expectations: declarative checks a production pipeline
runs against every batch/day before trusting it — not-null, uniqueness,
ranges, allowed sets, null-rate ceilings, regex conformance, row and
distinct-count bounds, and the vector-column rules (array dimension,
NaN-freedom — scalar or elementwise) — evaluated in ONE aggregate over
ONE scan,
returning a per-rule report (or raising, for the gate composition).

Beyond the reference (which validates nothing — its closest surface is
the implicit null rejection in the pipelines, P3); the widely-deployed
shape is Great Expectations / dbt tests, rebuilt Spark-first: every
rule compiles to aggregate EXPRESSIONS folded into a single
``df.agg(...)`` (map-side combinable, whole-stage codegen), and the
report is a lazy ``inline`` over that 1-row frame — zero driver
round-trips, trivially SQL-oracle-able.

100 TB notes: the only rule class that costs more than the shared scan
is exact uniqueness / distinct-count (``count_distinct`` — Spark plans
an Expand when several distinct aggregates share one agg, multiplying
the mapper rows by the number of DISTINCT rules; fine for the usual one
or two key columns, and the price of an EXACT answer). Everything else
is plain sums over the one scan. NaN is not NULL here (SQL semantics,
like the rest of the engine's filters); distribution-level NaN drift is
datapipe.drift's job.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One compiled rule: ``observed`` is an aggregate expression,
    ``ok_of`` maps the observed aggregate column to the pass/fail
    boolean, ``expected`` is the human-readable contract."""

    rule: str
    column: str | None
    observed: Column
    ok_of: Callable[[Column], Column]
    expected: str


def expect_row_count(min_rows: int = 1, max_rows: int | None = None) -> Expectation:
    """Row count in [min_rows, max_rows] — the 'feed went dark / feed
    exploded' check."""
    hi = "inf" if max_rows is None else str(int(max_rows))
    lo = int(min_rows)

    def ok(o):
        c = o >= lo
        return c if max_rows is None else c & (o <= int(max_rows))

    return Expectation(
        "row_count", None, F.count(F.lit(1)), ok, f"count in [{lo}, {hi}]"
    )


def expect_not_null(column: str) -> Expectation:
    """Zero SQL NULLs in ``column``; observed = violation count (0 on an
    empty frame — vacuously true, like every violation-count rule; gate
    empty feeds with ``expect_row_count``)."""
    return Expectation(
        "not_null", column,
        F.coalesce(F.sum(F.col(column).isNull().cast("long")), F.lit(0)),
        lambda o: o == 0, "0 nulls",
    )


def expect_null_rate(column: str, max_rate: float) -> Expectation:
    """NULL share of ``column`` at most ``max_rate`` (0..1); observed is
    the rate (null on an empty frame — which fails the rule)."""
    if not (0.0 <= max_rate <= 1.0):
        raise ValueError("max_rate must be in [0, 1]")
    return Expectation(
        "null_rate", column,
        F.avg(F.col(column).isNull().cast("double")),
        lambda o: o.isNotNull() & (o <= float(max_rate)),
        f"null rate <= {max_rate}",
    )


def expect_unique(column: str) -> Expectation:
    """``column`` is a key: no duplicates among non-null values (nulls
    are not keys — pair with expect_not_null for a primary key).
    Observed = duplicate-row count, EXACT (count - count_distinct)."""
    return Expectation(
        "unique", column,
        F.count(column) - F.count_distinct(F.col(column)),
        lambda o: o == 0, "0 duplicate keys",
    )


def expect_distinct_count(
    column: str, lo: int = 1, hi: int | None = None, approx: bool = False
) -> Expectation:
    """Distinct-value count (nulls excluded) in [lo, hi] — the
    'dimension collapsed to one value / exploded' check. ``approx=True``
    swaps in ``approx_count_distinct`` (HLL++, ~2% rsd, ONE pass with no
    Expand) — the scale path when the bounds are order-of-magnitude
    sanity checks rather than exact contracts; leave exact for small
    dictionaries. ``expect_unique`` has no approx mode on purpose: a
    duplicate-count estimate would alternate a gate between pass and
    fail on sketch noise."""
    hi_s = "inf" if hi is None else str(int(hi))

    def ok(o):
        c = o >= int(lo)
        return c if hi is None else c & (o <= int(hi))

    agg = (
        # rsd pinned to the documented 2% (Spark's default is 5% — a
        # bound sized for 2% noise would flap at 5%)
        F.approx_count_distinct(F.col(column), rsd=0.02) if approx
        else F.count_distinct(F.col(column))
    )
    return Expectation(
        "distinct_count", column, agg, ok,
        f"distinct in [{int(lo)}, {hi_s}]" + (" (approx)" if approx else ""),
    )


def expect_range(
    column: str, lo: float | None = None, hi: float | None = None
) -> Expectation:
    """Every non-null value in [lo, hi] — works for any orderable type
    (numbers, strings, dates: pass literals of the column's type).
    Observed = out-of-range count. NaN compares GREATER than every
    double in Spark's ordering, so any finite ``hi`` flags NaN rows; a
    lo-only range does not see them (use datapipe.drift's missing bin
    for NaN monitoring)."""
    if lo is None and hi is None:
        raise ValueError("expect_range needs lo and/or hi")
    v = F.col(column)
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (v < F.lit(lo))
    if hi is not None:
        cond = cond | (v > F.lit(hi))
    return Expectation(
        "range", column,
        F.coalesce(
            F.sum(F.when(v.isNotNull() & cond, 1).otherwise(0).cast("long")),
            F.lit(0),
        ),
        lambda o: o == 0,
        f"values in [{lo if lo is not None else '-inf'}, "
        f"{hi if hi is not None else 'inf'}]",
    )


def expect_in_set(column: str, allowed: list) -> Expectation:
    """Every non-null value drawn from ``allowed`` (a literal codegen set
    probe — dictionaries are meant to be small); observed = violation
    count. ``None`` is NOT a legal member: under SQL three-valued logic
    ``x NOT IN (..., NULL)`` is never true, which would silently disable
    the rule — nulls are always allowed here (pair with
    ``expect_not_null`` to forbid them)."""
    if not allowed:
        raise ValueError("allowed set must be non-empty")
    if any(a is None for a in allowed):
        raise ValueError(
            "allowed must not contain None — NOT IN against a NULL member "
            "is never true (three-valued logic), which would disable the "
            "rule; nulls always pass in_set, use expect_not_null to forbid "
            "them"
        )
    v = F.col(column)
    return Expectation(
        "in_set", column,
        F.coalesce(
            F.sum(
                F.when(v.isNotNull() & ~v.isin(*allowed), 1).otherwise(0).cast("long")
            ),
            F.lit(0),
        ),
        lambda o: o == 0,
        f"values in {sorted(map(str, allowed))[:20]}",
    )


def expect_array_dim(column: str, dim: int) -> Expectation:
    """Every non-null array value has exactly ``dim`` elements — the
    embedding-column contract (a ragged vector batch would corrupt every
    dot product / index downstream; the similarity stack's in-plan
    asserts catch it at use, this catches it at INGEST where the producer
    can still be named).  Observed = wrong-dimension count; one sum over
    the shared scan like every other rule."""
    if dim < 1:
        raise ValueError("expect_array_dim: dim must be >= 1")
    v = F.col(column)
    return Expectation(
        "array_dim", column,
        F.coalesce(
            F.sum(
                F.when(v.isNotNull() & (F.size(v) != dim), 1)
                .otherwise(0).cast("long")
            ),
            F.lit(0),
        ),
        lambda o: o == 0,
        f"array length == {dim}",
    )


def expect_no_nan(column: str, elementwise: bool = False) -> Expectation:
    """No NaN values in a float/double column (``elementwise=True`` for an
    array<float/double> column — any NaN element flags the row).  NaN is
    NOT NULL in SQL semantics, so not_null/null_rate never see it; a NaN
    reaching a model or an index silently poisons every aggregate it
    touches.  Observed = NaN-carrying row count.  The scalar/array choice
    is a construction-time flag because both expression branches would
    otherwise have to analyze against one column type."""
    v = F.col(column)
    nan_row = (
        F.exists(v, lambda x: F.isnan(x)) if elementwise else F.isnan(v)
    )
    is_bad = F.when(v.isNotNull() & nan_row, 1).otherwise(0)
    return Expectation(
        "no_nan", column,
        F.coalesce(F.sum(is_bad.cast("long")), F.lit(0)),
        lambda o: o == 0,
        "no NaN values" + (" (elementwise)" if elementwise else ""),
    )


def expect_regex(column: str, pattern: str, min_rate: float = 1.0) -> Expectation:
    """At least ``min_rate`` of non-null values fully match ``pattern``
    (Java regex, anchored with rlike semantics as written — anchor it
    yourself); observed = match rate among non-nulls (null when there
    are none, which PASSES — no evidence of violation)."""
    if not (0.0 < min_rate <= 1.0):
        raise ValueError("min_rate must be in (0, 1]")
    v = F.col(column)
    return Expectation(
        "regex", column,
        F.avg(F.when(v.isNotNull(), v.rlike(pattern).cast("double"))),
        lambda o: o.isNull() | (o >= float(min_rate)),
        f"match rate >= {min_rate} for /{pattern}/",
    )


def run_expectations(df: DataFrame, rules: list[Expectation]) -> DataFrame:
    """Evaluate every rule in ONE aggregate over ONE scan:
    DataFrame[rule, column, ok, observed, expected] (row order = rule
    order; ``observed`` stringified for the mixed long/double report).
    Entirely lazy — compose into a plan, or collect the bounded
    |rules|-row result."""
    if not rules:
        raise ValueError("need at least one expectation")
    for r in rules:
        if r.column is not None and r.column not in df.columns:
            raise ValueError(f"expectation {r.rule!r}: column {r.column!r} missing")
    aggs = [r.observed.alias(f"__o{i}") for i, r in enumerate(rules)]
    one = df.agg(*aggs)
    return one.select(F.inline(F.array(*_report_structs(rules))))


def _report_structs(rules: list[Expectation]) -> list[Column]:
    """The ONE report-row shape both suites inline over their aggregate
    (failing closed: a null verdict — e.g. a rate rule over an empty
    group — reports ok=False unless the rule's ok_of says otherwise)."""
    return [
        F.struct(
            F.lit(r.rule).alias("rule"),
            F.lit(r.column).cast("string").alias("column"),
            F.coalesce(r.ok_of(F.col(f"__o{i}")), F.lit(False)).alias("ok"),
            F.col(f"__o{i}").cast("string").alias("observed"),
            F.lit(r.expected).alias("expected"),
        )
        for i, r in enumerate(rules)
    ]


def _format_failures(failed, grouped: bool = False) -> str:
    """Pure row formatter — truncation (and any '+N more' suffix) is the
    caller's responsibility."""
    return "; ".join(
        (f"group {r['group']!r} " if grouped else "")
        + f"{r['rule']}({r['column'] or '*'}): observed {r['observed']}, "
        f"expected {r['expected']}"
        for r in failed
    )


def validate_expectations(df: DataFrame, rules: list[Expectation]) -> DataFrame:
    """The gate composition: evaluate, RAISE listing every failing rule
    (rule/column/observed/expected), else return the passing report —
    one eager bounded job, the shape a daily refresh calls before
    merging a batch (see tests/test_refresh_e2e.py for the drift
    sibling)."""
    report = run_expectations(df, rules).collect()
    failed = [r for r in report if not r["ok"]]
    if failed:
        raise ValueError(
            f"{len(failed)} expectation(s) failed — {_format_failures(failed)}"
        )
    spark = df.sparkSession
    return spark.createDataFrame(
        report,
        "rule string, column string, ok boolean, observed string, expected string",
    )


def run_expectations_grouped(
    df: DataFrame, group_col: str, rules: list[Expectation]
) -> DataFrame:
    """Per-segment contracts — "does EVERY source/language/day satisfy the
    rules?", the grouped sibling of ``run_expectations`` (same rule
    objects, same single-scan shape): DataFrame[group, rule, column, ok,
    observed, expected], one row per (group, rule).

    ONE groupBy aggregate evaluates every rule for every group
    (map-side combinable; |groups|·|rules| bounded output); a null group
    is its own '__null' segment (a feed that stopped labeling rows must
    not vanish from the contract report), with the in-plan sentinel
    collision guard shared with datapipe.drift. Note ``expect_row_count``
    here bounds each GROUP's row count — a group with zero rows simply
    has no report row (SQL GROUP BY semantics); pair with an ungrouped
    ``expect_distinct_count(group_col, lo=...)`` to pin the expected
    segment population."""
    from oni_ml_spark.datapipe.drift import _sentinel_key

    if not rules:
        raise ValueError("need at least one expectation")
    if group_col not in df.columns:
        raise ValueError(f"group column {group_col!r} missing")
    if "group" in df.columns and group_col != "group":
        raise ValueError(
            "input carries reserved column 'group' — rename it (the report "
            "uses it for the segment key)"
        )
    for r in rules:
        if r.column is not None and r.column not in df.columns:
            raise ValueError(f"expectation {r.rule!r}: column {r.column!r} missing")
        if r.column == group_col:
            raise ValueError(
                f"expectation {r.rule!r} targets the group column itself — "
                "group it by something else or use the ungrouped suite"
            )
    gkey = _sentinel_key(
        F.col(group_col).cast("string"), ["__null"], "run_expectations_grouped"
    )
    aggs = [r.observed.alias(f"__o{i}") for i, r in enumerate(rules)]
    passthrough = [c for c in df.columns if c != "group"]
    per_group = (
        df.select(gkey.alias("group"), *passthrough).groupBy("group").agg(*aggs)
    )
    return per_group.select("group", F.inline(F.array(*_report_structs(rules))))


def validate_expectations_grouped(
    df: DataFrame, group_col: str, rules: list[Expectation], max_named: int = 20
) -> DataFrame:
    """The grouped raising gate: evaluate per segment, RAISE naming up to
    ``max_named`` failing (group, rule) pairs (plus the total), else
    return the (pinned, bounded) report for the caller to inspect.

    Driver-safe at high group cardinality: the report is never collected
    whole — one bounded aggregate checks the totals (zero groups / how
    many failures), and only up to ``max_named``+ failing rows come back
    to build the error. An EMPTY input raises too: zero groups means
    zero report rows, and a gate that answers 'pass' on the feed going
    dark is the failure mode gates exist to catch (the ungrouped
    ``expect_row_count`` would have flagged it).

    The report is localCheckpoint-pinned (bounded: |groups|·|rules| rows,
    post-aggregation) so the totals check, the failure fetch, and
    whatever the caller does with the returned frame all read ONE
    computation — one corpus scan total, and the verdict can never
    disagree with the rows it names (a re-derived report over a
    non-deterministic source could)."""
    report = run_expectations_grouped(df, group_col, rules).localCheckpoint(
        eager=True
    )
    totals = report.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((~F.col("ok")).cast("long")).alias("nf"),
    ).collect()[0]
    if totals["n"] == 0:
        raise ValueError(
            "grouped expectations over an EMPTY input: zero groups, zero "
            "evidence — the feed went dark; refusing to report a pass"
        )
    if totals["nf"]:
        failed = (
            report.where(~F.col("ok"))
            .orderBy("group", "rule", "column")
            .limit(max_named)
            .collect()
        )
        named = _format_failures(failed, grouped=True)
        more = "" if totals["nf"] <= max_named else f" (+{totals['nf'] - max_named} more)"
        raise ValueError(
            f"{totals['nf']} grouped expectation(s) failed — {named}{more}"
        )
    return report


def infer_expectations(
    df: DataFrame,
    columns: list[str] | None = None,
    range_slack: float = 0.05,
    null_rate_slack: float = 1.5,
    null_rate_floor: float = 0.001,
    set_max: int = 50,
) -> list[Expectation]:
    """LEARN a contract from a reference corpus (the profiler shape of
    pandera/Great Expectations, Spark-first): returns the rule list a
    later batch is validated against — ``validate_expectations(batch,
    infer_expectations(reference))`` is the two-line data gate.

    What is inferred, from ONE stats aggregate over ONE scan:

    - every column: ``expect_null_rate`` at observed·``null_rate_slack``
      (+ ``null_rate_floor`` absolute headroom, so an all-populated
      reference doesn't freeze a zero-tolerance rule that one legitimate
      null would trip);
    - numeric columns: ``expect_range`` widened by ``range_slack`` ×
      the observed span on each side (slack 0 pins the exact envelope);
      NaN is EXCLUDED from the envelope (NaN sorts above every double —
      a raw max would freeze hi=NaN and flag every finite row), so a
      reference that itself contains NaN will FAIL its own inferred
      range: the NaN surfaces at contract-authoring time instead of
      being baked silently into the envelope;
    - string/boolean columns whose distinct count is small:
      ``expect_in_set`` over the observed dictionary — qualified by an
      approx (HLL++) count in the shared stats pass (no N-way Expand
      from exact multi-DISTINCT), collected in a SECOND bounded pass
      touching only qualifying columns, and emitted only if the
      collected set's EXACT size is <= ``set_max`` (never
      ``collect_set`` over an unaudited key space — the sketch margin
      bounds the buffer, the exact check bounds the rule);
    - array columns with a CONSTANT reference dimension:
      ``expect_array_dim`` (a variable-dim reference infers nothing —
      raggedness is evidently legal there);
    - float columns and float-array columns with a NaN-free reference:
      ``expect_no_nan`` (a reference WITH NaN infers nothing rather
      than freezing a rule its own data violates);
    - plus ``expect_row_count(min_rows=1)``.

    The returned rules are ordinary ``Expectation`` objects — inspect,
    edit, or extend them before gating. Inference is descriptive, not
    statistical: it pins the reference's envelope; distribution-level
    drift within the envelope is datapipe.drift's job."""
    if range_slack < 0 or null_rate_slack < 1.0 or null_rate_floor < 0:
        raise ValueError(
            "range_slack >= 0, null_rate_slack >= 1, null_rate_floor >= 0"
        )
    if set_max < 1:
        raise ValueError("set_max must be >= 1")
    dtypes = dict(df.dtypes)
    cols = list(columns) if columns is not None else list(df.columns)
    missing = [c for c in cols if c not in dtypes]
    if missing:
        raise ValueError(f"columns {missing} missing from the frame")
    numeric = {
        c for c in cols
        if dtypes[c] in ("tinyint", "smallint", "int", "bigint", "float", "double")
        or dtypes[c].startswith("decimal")
    }
    settable = {c for c in cols if dtypes[c] in ("string", "boolean")}
    arrays = {c for c in cols if dtypes[c].startswith("array<")}
    # NaN-capable columns: scalar floats, and arrays OF floats (element
    # type read off the dtype string) — the no_nan inference candidates
    floats = {c for c in cols if dtypes[c] in ("float", "double")}
    float_arrays = {
        c for c in arrays if dtypes[c] in ("array<float>", "array<double>")
    }

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.avg(F.col(c).isNull().cast("double")).alias(f"{c}__nr"))
        if c in arrays:
            # null-safe dimension envelope (size(NULL) is -1, not NULL)
            sz = F.when(F.col(c).isNotNull(), F.size(F.col(c)))
            aggs += [F.min(sz).alias(f"{c}__dlo"), F.max(sz).alias(f"{c}__dhi")]
        if c in floats:
            aggs.append(
                F.sum(
                    F.when(
                        F.col(c).isNotNull() & F.isnan(F.col(c)), 1
                    ).otherwise(0).cast("long")
                ).alias(f"{c}__nan")
            )
        if c in float_arrays:
            aggs.append(
                F.sum(
                    F.when(
                        F.col(c).isNotNull()
                        & F.exists(F.col(c), lambda x: F.isnan(x)),
                        1,
                    ).otherwise(0).cast("long")
                ).alias(f"{c}__nan")
            )
        if c in numeric:
            # NaN-safe envelope: NaN sorts ABOVE every double in Spark,
            # so a raw max would freeze hi=NaN and the inferred range
            # would flag every finite row — exclude NaN from the
            # envelope (the inferred finite hi then correctly flags NaN
            # rows downstream, expect_range's documented semantics)
            clean = F.when(~F.isnan(F.col(c).cast("double")), F.col(c))
            aggs += [F.min(clean).alias(f"{c}__lo"), F.max(clean).alias(f"{c}__hi")]
        if c in settable:
            # approx (HLL++) qualification: ONE pass, no N-way Expand
            # from exact multi-DISTINCT; the 2x margin absorbs sketch
            # error, and the dictionary pass re-checks the EXACT size
            aggs.append(F.approx_count_distinct(F.col(c)).alias(f"{c}__d"))
    stats = df.agg(*aggs).collect()[0]
    if stats["__n"] == 0:
        raise ValueError(
            "reference frame has no rows — cannot infer a contract from "
            "an empty corpus"
        )

    rules: list[Expectation] = [expect_row_count(min_rows=1)]
    for c in cols:
        rate = float(stats[f"{c}__nr"])
        rules.append(
            expect_null_rate(
                c, min(1.0, rate * null_rate_slack + null_rate_floor)
            )
        )
        if c in numeric and stats[f"{c}__lo"] is not None:
            lo, hi = float(stats[f"{c}__lo"]), float(stats[f"{c}__hi"])
            pad = (hi - lo) * range_slack
            rules.append(expect_range(c, lo=lo - pad, hi=hi + pad))
        # vector rules (r10): a CONSTANT reference dimension pins
        # expect_array_dim (a variable-dim reference infers nothing —
        # raggedness is evidently legal there); a NaN-free reference pins
        # expect_no_nan (a reference WITH NaN infers nothing rather than
        # freezing a rule its own data violates — descriptive inference)
        if (
            c in arrays
            and stats[f"{c}__dlo"] is not None
            and stats[f"{c}__dlo"] == stats[f"{c}__dhi"]
            and stats[f"{c}__dlo"] >= 1
        ):
            rules.append(expect_array_dim(c, int(stats[f"{c}__dlo"])))
        if (c in floats or c in float_arrays) and stats[f"{c}__nan"] == 0:
            rules.append(expect_no_nan(c, elementwise=c in float_arrays))
    small = [
        c for c in cols
        if c in settable
        and stats[f"{c}__d"] is not None
        and 0 < stats[f"{c}__d"] <= 2 * set_max  # sketch margin; exact below
    ]
    if small:
        # second bounded pass: dictionaries ONLY for columns the approx
        # counts qualified (buffer bounded by ~2·set_max strings); the
        # EXACT size check happens here, on the collected set, so a
        # sketch undercount can widen the buffer but never emit an
        # oversized dictionary rule
        dicts = df.agg(
            *[F.collect_set(F.col(c).cast("string")).alias(c) for c in small]
        ).collect()[0]
        for c in small:
            if len(dicts[c]) <= set_max:
                rules.append(expect_in_set(c, sorted(dicts[c])))
    return rules
