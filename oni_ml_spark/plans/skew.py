"""Skew-aware join via key salting.

For a fact⋈dim join where a handful of fact keys carry most of the rows
(one IP scanning the network, one hot document shingle), a plain shuffle
join puts a whole hot key in one task. Salting splits each hot key into
``salt`` sub-keys on the fact side and replicates the dim side ``salt``
times, so the hot key's rows spread over ``salt`` tasks.

AQE's skew-join handles this at runtime for sort-merge joins; explicit
salting remains useful when the skew is known ahead (planned partitioning)
or the join is a broadcast-unfriendly aggregation key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """fact ⋈ dim on ``key`` with ``salt``-way key splitting.

    The fact side gets a uniform random-ish salt derived from a row hash
    (deterministic: hash of all fact columns), the dim side is exploded
    ``salt`` times — dim grows by the salt factor, so use for small-to-medium
    dims with skewed fact keys.

    Only inner and left joins are supported: under right/full semantics an
    unmatched dim row survives once per salt replica, multiplying output rows
    versus the unsalted join.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: "
            "outer dim rows would be duplicated salt times"
        )
    fact_s = fact.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in fact.columns]), F.lit(salt))
    )
    dim_s = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = fact_s.join(dim_s, [key, "__salt"], how)
    return out.drop("__salt")
