"""Property-based tests (hypothesis): the distributed exact-quantile path
agrees with a direct pure-Python implementation of the reference semantics
(utilities/Quantiles.scala) on arbitrary inputs."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

from oni_ml_spark.transforms import DECILES, QUINTILES, bin_expr, quantile_cuts


def py_cuts(values: list[float], probs: list[float]) -> list[float]:
    """Direct transcription of the semantics: least x with P(X<=x) >= t."""
    if not values:
        return [math.inf] * len(probs)
    xs = sorted(values)
    n = len(xs)
    out = []
    for t in probs:
        cut = math.inf
        for i, x in enumerate(xs):
            if (i + 1) / n >= t:
                cut = x
                break
        out.append(cut)
    return out


def py_bin(value: float, cuts: list[float]) -> int:
    for i, c in enumerate(cuts):
        if value <= c:
            return i
    return -1


finite_doubles = st.floats(
    min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
)


@settings(max_examples=12, deadline=None)
@given(st.lists(st.integers(min_value=-1000, max_value=1000), min_size=0, max_size=60))
def test_quantile_cuts_match_python_oracle(spark, xs):
    values = [float(x) for x in xs]
    df = spark.createDataFrame([(v,) for v in values], "v double") if values else (
        spark.createDataFrame([], "v double")
    )
    for probs in (DECILES, QUINTILES):
        got = quantile_cuts(df, "v", probs)
        want = py_cuts(values, probs)
        assert got == want, (values, probs)


@settings(max_examples=12, deadline=None)
@given(
    st.lists(finite_doubles, min_size=1, max_size=20),
    st.lists(finite_doubles, min_size=1, max_size=8),
)
def test_bin_expr_matches_python_oracle(spark, values, raw_cuts):
    cuts = sorted(raw_cuts)
    df = spark.createDataFrame([(float(v),) for v in values], "v double")
    got = [r[0] for r in df.select(bin_expr("v", cuts)).collect()]
    want = [py_bin(v, cuts) for v in values]
    assert got == want, (values, cuts)
