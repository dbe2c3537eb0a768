"""Skew / partition diagnostics — the first thing to look at when a stage
straggles on a real cluster.

Both profiles are one aggregate each (bounded output: one row per partition
/ per surviving key), so they are safe to run against a 100 TB input —
unlike .glom().map(len) RDD folklore, which materializes whole partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partition_profile(df: DataFrame) -> DataFrame:
    """(partition_id, n_rows) for the frame AS CURRENTLY PARTITIONED — the
    direct view of imbalance feeding a slow stage. One map-side-combined
    aggregate; output is one row per partition.

    Interpreting it: a healthy post-shuffle frame has rows spread within
    ~2x of the mean; one partition holding 100x the mean is key skew (fix
    with salting / AQE skew join), many near-empty partitions after a
    filter means too many shuffle partitions for the surviving data (AQE
    coalescing, or lower spark.sql.shuffle.partitions).
    """
    return (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.desc("n_rows"))
    )


def key_skew_profile(df: DataFrame, key_col: str, top_k: int = 20) -> DataFrame:
    """(key, n_rows, share) for the ``top_k`` heaviest values of
    ``key_col`` — the keys that will dominate any shuffle keyed on it.

    share = key's fraction of ALL rows, computed against an in-plan 1-row
    total (no collect). A single key holding >1/shuffle.partitions of the
    data guarantees at least one straggler task on a plain hash shuffle —
    the threshold at which salting (plans.skew.salted_join) or AQE skew
    handling starts paying for itself.
    """
    if top_k <= 0:
        raise ValueError("top_k must be positive")
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    # total = sum of the per-key counts (a |keys|-row aggregate), NOT a
    # second count over df — that would scan the 100 TB input twice
    total = counts.agg(F.sum("n_rows").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "key",
            "n_rows",
            F.round(F.col("n_rows") / F.col("__total"), 6).alias("share"),
        )
        .orderBy(F.desc("n_rows"), F.col("key"))
        .limit(top_k)
    )


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """One-pass dataset card: (column, n_rows, n_nulls, n_distinct,
    min_value, max_value) for every requested column — the first report to
    pull on an unfamiliar 100 TB table.

    ALL metrics for ALL columns compute inside ONE aggregate (one scan,
    map-side combined); min/max are cast to string so heterogeneous column
    types share a schema. n_distinct is approx_count_distinct by default
    (HLL — mergeable, bounded memory at any cardinality; ``rsd`` sets the
    target error); ``exact_distinct=True`` switches to count_distinct for
    small tables or oracle tests, at the usual exact-distinct shuffle cost.
    """
    cols = columns or df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in input: {missing}")
    # (map-typed columns report n_rows/n_nulls only — see below)
    distinct_of = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact_distinct
        else (lambda c: F.approx_count_distinct(c, rsd))
    )

    # map-typed columns (incl. nested maps) are unorderable and unhashable
    # in Spark SQL — min/max/distinct on them would fail ANALYSIS for the
    # WHOLE profile. Emit nulls for those metrics instead of dying: a
    # profiler that crashes on the table it profiles is useless.
    from pyspark.sql.types import ArrayType, DataType, MapType, StructType

    def has_map(t: DataType) -> bool:
        if isinstance(t, MapType):
            return True
        if isinstance(t, ArrayType):
            return has_map(t.elementType)
        if isinstance(t, StructType):
            return any(has_map(f.dataType) for f in t.fields)
        return False

    types = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("__n")]
    null_l = F.lit(None).cast("long")
    null_s = F.lit(None).cast("string")
    for i, c in enumerate(cols):
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nul_{i}"))
        if has_map(types[c]):
            aggs.append(F.max(null_l).alias(f"__dis_{i}"))
            aggs.append(F.max(null_s).alias(f"__min_{i}"))
            aggs.append(F.max(null_s).alias(f"__max_{i}"))
        else:
            aggs.append(distinct_of(c).alias(f"__dis_{i}"))
            aggs.append(F.min(F.col(c)).cast("string").alias(f"__min_{i}"))
            aggs.append(F.max(F.col(c)).cast("string").alias(f"__max_{i}"))
    one = df.agg(*aggs)
    # one row -> |cols| rows via an inline table (stack), still one job
    # field names must match across array elements for array() to resolve
    parts = []
    for i, c in enumerate(cols):
        parts.append(
            f"struct('{c}' AS c, __n AS n, __nul_{i} AS nu, "
            f"__dis_{i} AS di, __min_{i} AS mi, __max_{i} AS ma)"
        )
    return one.selectExpr(
        f"inline(array({', '.join(parts)}))"
    ).toDF("column", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")


def plan_report(df: DataFrame) -> dict:
    """Physical-plan summary as plain counters: shuffles (exchanges),
    broadcast/sort-merge joins, scans, whole-stage-codegen spans, and
    whether any scan carries pushed filters — the numbers to eyeball
    before launching a plan against 100 TB (one exchange too many is a
    petabyte of network).

    Reads the plan through the PUBLIC SQL surface (EXPLAIN FORMATTED over
    a temp view) — no private _jdf access. The counters are substring
    tallies over Spark's formatted explain output; they are a diagnostic,
    not a parser.
    """
    import uuid

    spark = df.sparkSession
    # unique per call: a fixed name would let concurrent calls (or a user
    # view of the same name) clobber each other's view between create and
    # EXPLAIN
    name = f"__plan_report_{uuid.uuid4().hex}"
    df.createOrReplaceTempView(name)
    try:
        text = spark.sql(
            f"EXPLAIN FORMATTED SELECT * FROM {name}"
        ).collect()[0][0]
    finally:
        spark.catalog.dropTempView(name)
    import re

    # EXPLAIN FORMATTED prints every node twice (tree + numbered detail
    # section); count each node ONCE via its "(n) NodeName" detail header
    names = re.findall(r"^\(\d+\) ([A-Za-z]+)", text, flags=re.MULTILINE)
    nodes: dict[str, int] = {}
    for n in names:
        nodes[n] = nodes.get(n, 0) + 1
    def n_of(name: str) -> int:
        return nodes.get(name, 0)

    return {
        "exchanges": n_of("Exchange") + n_of("BroadcastExchange"),
        "shuffle_exchanges": n_of("Exchange"),
        "broadcast_exchanges": n_of("BroadcastExchange"),
        "broadcast_hash_joins": n_of("BroadcastHashJoin"),
        "sort_merge_joins": n_of("SortMergeJoin"),
        "scans": n_of("Scan"),
        # best-effort: AQE plans print no codegen ids before execution
        "codegen_spans": text.count("WholeStageCodegen ("),
        "has_pushed_filters": bool(
            re.search(r"PushedFilters: \[[^\]]", text)
        ),
        # the parsed per-node tally — consumers (assert_plan's forbid list)
        # use THIS instead of re-parsing the text with their own regex
        "nodes": nodes,
        "plan": text,
    }


def assert_plan(
    df: DataFrame,
    max_exchanges: int | None = None,
    require_pushed_filters: bool = False,
    require_broadcast_join: bool = False,
    forbid: list[str] | None = None,
) -> dict:
    """Plan-shape regression guard: raise if the frame's physical plan
    violates the stated contract, else return the ``plan_report`` dict.

    The perf properties this engine relies on — a broadcast that must not
    degrade to sort-merge, a filter that must reach the parquet scan, a
    pipeline that must not grow a fourth shuffle — are invisible to
    row-level tests: the results stay correct while the plan silently
    becomes a 100 TB disaster. Wiring this into a test (or a pre-launch
    check) turns each property into an assertion with the full formatted
    plan in the failure message.

    ``max_exchanges`` bounds SHUFFLE exchanges only — broadcast exchanges
    are excluded, so a broadcast-join contract composes with a zero-shuffle
    budget (``max_exchanges=0, require_broadcast_join=True`` is
    satisfiable; an intended broadcast never trips the shuffle bound).
    ``forbid`` matches node NAMES from EXPLAIN FORMATTED's detail headers
    (e.g. ``['CartesianProduct', 'SortMergeJoin']``), not free text.
    """
    rep = plan_report(df)
    problems: list[str] = []
    if max_exchanges is not None and rep["shuffle_exchanges"] > max_exchanges:
        problems.append(
            f"{rep['shuffle_exchanges']} shuffle exchanges (max {max_exchanges})"
        )
    if require_pushed_filters and not rep["has_pushed_filters"]:
        problems.append("no filters pushed to any scan")
    if require_broadcast_join and rep["broadcast_hash_joins"] == 0:
        problems.append("no BroadcastHashJoin in the plan")
    if forbid:
        hit = [n for n in forbid if rep["nodes"].get(n)]
        if hit:
            problems.append(f"forbidden node(s) present: {hit}")
    if problems:
        raise AssertionError(
            "plan contract violated: " + "; ".join(problems) + "\n" + rep["plan"]
        )
    return rep


def column_histogram(
    df: DataFrame,
    value_col: str,
    bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """(bin, lo, hi, n) equi-width histogram of a numeric column — the
    distribution view profile_table's min/max can't give.

    Bounds default to the column's exact min/max (one bounded 1-row
    aggregate when not supplied — pass them to skip that job at 100 TB, or
    reuse profile_table's output). Binning is one codegen projection +
    one map-side-combined count aggregate; output is ``bins`` rows with
    structural zeros for empty bins (a plotting consumer can rely on the
    full grid). Values exactly at ``hi`` land in the LAST bin (closed top
    bin, the standard histogram convention); nulls and NaNs are excluded.
    """
    if bins <= 0:
        raise ValueError("bins must be positive")
    if value_col not in df.columns:
        raise ValueError(f"column '{value_col}' not in input")
    v = F.col(value_col).cast("double")
    if lo is None or hi is None:
        # exclude NaN here too: Spark orders NaN above every double, so an
        # unguarded max() returns NaN whenever one row is NaN and the
        # whole histogram would die on the hi > lo check
        vv = F.when(~F.isnan(v), v)
        row = df.agg(F.min(vv).alias("lo"), F.max(vv).alias("hi")).collect()[0]
        lo = row["lo"] if lo is None else lo
        hi = row["hi"] if hi is None else hi
    if lo is None or hi is None:
        raise ValueError("column has no non-null values and no bounds given")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    width = (float(hi) - float(lo)) / bins
    idx = F.least(
        F.lit(bins - 1),
        F.greatest(F.lit(0), F.floor((v - F.lit(float(lo))) / F.lit(width)).cast("int")),
    )
    counts = (
        df.filter(v.isNotNull() & ~F.isnan(v) & (v >= lo) & (v <= hi))
        .groupBy(idx.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spark = df.sparkSession
    grid = spark.range(bins).select(F.col("id").cast("int").alias("bin"))
    return (
        grid.join(counts, "bin", "left")
        .select(
            "bin",
            F.round(F.lit(float(lo)) + F.col("bin") * F.lit(width), 9).alias("lo"),
            F.round(F.lit(float(lo)) + (F.col("bin") + 1) * F.lit(width), 9).alias("hi"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        )
        .orderBy("bin")
    )


def join_cardinality_estimate(
    a: DataFrame,
    b: DataFrame,
    key_col: str,
    top_k: int = 64,
    rsd: float = 0.05,
) -> dict:
    """Pre-flight output-size estimate for ``a JOIN b ON key_col`` — the
    number to look at BEFORE launching a join that could explode: an equi
    join's output is Σ_k n_a(k)·n_b(k), and one hot key on both sides
    turns two modest tables into a petabyte of shuffle output.

    Estimator (System-R uniform tail + exact heavy hitters): the ``top_k``
    heaviest keys of EACH side get their cross-side counts measured
    exactly — a second bounded aggregate filtered to ≤2·top_k keys, which
    parquet scans prune hard — so the skew part of the sum, the part the
    uniform assumption gets catastrophically wrong, is exact. The tail is
    (rows_a − heavy_a)·(rows_b − heavy_b)/max(d_a, d_b) with HLL distinct
    counts (``rsd``), the classic containment-assumption estimate.

    Cost: two aggregates per side (count+distinct; heavy keys) plus one
    pruned re-aggregation per side — all bounded outputs, no join runs.
    Returns a breakdown dict: estimated_rows, heavy_exact_rows,
    tail_estimate_rows, per-side stats, and the measured heavy keys with
    both sides' counts (the salting candidates for ``plans.skew``).

    Null keys are EXCLUDED throughout — an equi join never matches null =
    null, so null-keyed rows contribute zero output (counting them, when
    null is the hottest "key" on both sides as it often is in real data,
    would inflate the estimate by a phantom n_null_a·n_null_b).
    """
    if top_k <= 0:
        raise ValueError("top_k must be positive")
    for side, df in (("a", a), ("b", b)):
        if key_col not in df.columns:
            raise ValueError(f"side {side} lacks key column '{key_col}'")

    def side_stats(df: DataFrame) -> tuple[int, int, dict]:
        dfk = df.filter(F.col(key_col).isNotNull())
        row = dfk.agg(
            F.count(F.lit(1)).alias("n"),
            F.approx_count_distinct(key_col, rsd).alias("d"),
        ).collect()[0]
        heavy = {
            r["key"]: r["n_rows"]
            for r in key_skew_profile(dfk, key_col, top_k).collect()
        }
        return int(row["n"]), int(row["d"]), heavy

    n_a, d_a, heavy_a = side_stats(a)
    n_b, d_b, heavy_b = side_stats(b)
    keys = sorted(set(heavy_a) | set(heavy_b), key=str)

    def counts_for(df: DataFrame, known: dict) -> dict:
        missing = [k for k in keys if k not in known]
        if not missing:
            return known
        extra = {
            r["k"]: r["c"]
            for r in df.filter(F.col(key_col).isin(missing))
            .groupBy(F.col(key_col).alias("k"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        return {**known, **{k: extra.get(k, 0) for k in missing}}

    ca = counts_for(a, heavy_a)
    cb = counts_for(b, heavy_b)
    heavy_exact = sum(ca[k] * cb[k] for k in keys)
    rest_a = n_a - sum(ca[k] for k in keys)
    rest_b = n_b - sum(cb[k] for k in keys)
    # tail distinct counts: heavy keys are out of the tail by construction
    tail_d = max(max(d_a - len(keys), 1), max(d_b - len(keys), 1))
    tail = (rest_a * rest_b) / tail_d if rest_a > 0 and rest_b > 0 else 0.0
    return {
        "estimated_rows": int(heavy_exact + tail),
        "heavy_exact_rows": int(heavy_exact),
        "tail_estimate_rows": int(tail),
        "a": {"n_rows": n_a, "approx_distinct": d_a},
        "b": {"n_rows": n_b, "approx_distinct": d_b},
        "heavy_keys": [
            {"key": k, "n_a": ca[k], "n_b": cb[k], "out": ca[k] * cb[k]}
            for k in sorted(keys, key=lambda k: -(ca[k] * cb[k]))
        ],
    }


def numeric_correlations(df: DataFrame, columns: list[str]) -> DataFrame:
    """(col_a, col_b, corr) Pearson correlation for every pair of the
    given numeric columns — computed in ONE aggregate over ONE scan
    (F.corr is map-side combinable), not one job per pair. n columns →
    n·(n-1)/2 rows (upper triangle, a < b by position)."""
    if len(columns) < 2:
        raise ValueError("need at least two columns")
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in input: {missing}")
    pairs = [
        (a, b) for i, a in enumerate(columns) for b in columns[i + 1:]
    ]
    aggs = [
        F.corr(F.col(a).cast("double"), F.col(b).cast("double")).alias(f"__c_{i}")
        for i, (a, b) in enumerate(pairs)
    ]
    one = df.agg(*aggs)
    parts = [
        f"struct('{a}' AS a, '{b}' AS b, __c_{i} AS c)"
        for i, (a, b) in enumerate(pairs)
    ]
    return one.selectExpr(f"inline(array({', '.join(parts)}))").toDF(
        "col_a", "col_b", "corr"
    )
