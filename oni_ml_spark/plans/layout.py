"""Z-order (Morton-curve) data layout for multi-column scan pruning.

Parquet readers skip row groups whose min/max stats exclude the predicate.
Sorting by ONE column gives perfect pruning on that column and none on any
other; interleaving the bits of several columns' normalized values (the
Z-order curve) keeps every participating column's values CLUSTERED within
each file, so min/max pruning works for filters on any of them — the
standard layout trick for a 100 TB fact table queried by several
dimensions (Delta/Iceberg `OPTIMIZE ZORDER BY` is this same curve; here it
is plain DataFrame ops writing plain parquet).

All expressions are native bitwise arithmetic (whole-stage codegen); the
only extra cost over a naive write is the range-partition boundary sample
plus the one-pass bounds aggregate (skippable by passing known ``bounds``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _normalize(c: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map a numeric column into [0, 2^bits) by linear min/max scaling —
    null-safe (nulls sort first at grid cell 0), constant-safe (hi == lo
    collapses to 0)."""
    span = hi.cast("double") - lo.cast("double")
    scaled = F.when(
        c.isNull() | (span <= 0), F.lit(0)
    ).otherwise(
        # clamp BOTH sides: with caller-supplied bounds tighter than the
        # data, out-of-range rows must land on the edge cells, not produce
        # negative (sign-extended) grid values that scramble the curve
        F.greatest(
            F.least(
                F.floor((c.cast("double") - lo.cast("double")) / span * (1 << bits)),
                F.lit((1 << bits) - 1),
            ),
            F.lit(0),
        )
    )
    return scaled.cast("long")


def zorder_key(norm_cols: list[Column], bits: int) -> Column:
    """Interleave ``bits`` bits from each normalized column into one long:
    output bit (i * n_cols + j) = bit i of column j. Pure shift/and/or
    expression tree — stays inside codegen, no UDF."""
    n = len(norm_cols)
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits exceeds a long ({n * bits} > 62)")
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(norm_cols):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 12,
    num_files: int = 8,
    bounds: dict[str, tuple[float, float]] | None = None,
) -> None:
    """Write ``df`` as parquet laid out along the Z-curve of ``cols``.

    repartitionByRange on the z-key (sampled boundaries → equal-size
    files) + sortWithinPartitions keeps each file a compact z-range, so
    each file's min/max footer stats are tight for EVERY z-ordered column
    and a filtered scan prunes whole files/row groups.

    ``bounds``: optional {col: (min, max)} to skip the bounds aggregate —
    on a production table you pass known domain bounds (or yesterday's)
    rather than re-scanning; values outside clamp to the edge cells, which
    only loosens pruning for those rows.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    if bounds is None:
        aggs = []
        for c in cols:
            aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
        b = df.agg(*aggs)
        with_b = df.crossJoin(F.broadcast(b))
        lo = {c: F.col(f"__lo_{c}") for c in cols}
        hi = {c: F.col(f"__hi_{c}") for c in cols}
    else:
        missing = [c for c in cols if c not in bounds]
        if missing:
            raise ValueError(f"bounds missing for {missing}")
        with_b = df
        lo = {c: F.lit(float(bounds[c][0])) for c in cols}
        hi = {c: F.lit(float(bounds[c][1])) for c in cols}

    norm = [_normalize(F.col(c), lo[c], hi[c], bits) for c in cols]
    keyed = with_b.withColumn("__z", zorder_key(norm, bits))
    (
        keyed.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *[f"__lo_{c}" for c in (cols if bounds is None else [])],
              *[f"__hi_{c}" for c in (cols if bounds is None else [])])
        .write.mode("overwrite")
        .parquet(path)
    )
