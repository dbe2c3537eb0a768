"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() twin on DuckDB at sf0.01, compare row count,
column names, and order-insensitive values.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

_ORACLES = entry_mod.oracle_sql()
_QUERIES = entry_mod.queries()

# r13 (verify budget): entries with eager construction work (model fits,
# localCheckpoint pins) pay that work at DataFrame-CONSTRUCTION time, and
# both the dtype-alignment test and the value test used to construct every
# frame independently (~80 s of duplicated fits at sf0.01). One lazy
# module-level cache shares the constructed frame; entries are seeded and
# deterministic, so a frame built once yields the identical rows to every
# consumer.
_FRAME_CACHE: dict[str, object] = {}


def _frame(spark, name: str):
    if name not in _FRAME_CACHE:
        _FRAME_CACHE[name] = _QUERIES[name](spark, SF_DIR)
    return _FRAME_CACHE[name]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm_cell(v):
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.10g}"
    if isinstance(v, int):
        return str(v)
    return str(v)


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        out.append(tuple(_norm_cell(row[i]) for i in order))
    out.sort()
    return out


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_has_no_hugeint_columns(duck, name):
    """The driver hashes raw typed values, so a DuckDB HUGEINT column (the
    default result of windowed sum(CASE...) etc.) hash-mismatches Spark's
    BIGINT even when every value is identical — this bit pivot_counts (r2)
    and sessionize (r3). The fix is always `::BIGINT` in the oracle's outer
    projection; this test makes the trap impossible to reintroduce."""
    rel = duck.sql(_ORACLES[name])
    bad = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if "HUGEINT" in str(t).upper()
    ]
    assert not bad, f"{name}: HUGEINT oracle columns (cast ::BIGINT): {bad}"


# Spark dtype → DuckDB types the driver's raw-typed compare is known to
# accept (empirically: int-width and timestamp-flavor differences hashed
# equal across r1-r3; HUGEINT did not — see the test above).
_TYPE_OK = {
    "bigint": {"BIGINT", "INTEGER"},
    "int": {"INTEGER", "BIGINT"},
    "double": {"DOUBLE"},
    "float": {"FLOAT"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "date": {"DATE"},
    "timestamp": {"TIMESTAMP", "TIMESTAMP_NS"},
    "timestamp_ntz": {"TIMESTAMP", "TIMESTAMP_NS"},
}


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_column_types_align(spark, duck, name):
    """Every oracle column's DuckDB type must be hash-compatible with the
    Spark column's type — the raw-typed driver compare fails on pairs the
    local stringified compare can't see (the HUGEINT class of bug,
    generalized)."""
    sdt = dict(_frame(spark, name).dtypes)
    rel = duck.sql(_ORACLES[name])
    ddt = dict(zip(rel.columns, (str(t) for t in rel.types)))
    bad = []
    for c, st in sdt.items():
        allowed = _TYPE_OK.get(st, {st.upper()})
        if ddt.get(c, "").upper() not in allowed:
            bad.append((c, st, ddt.get(c)))
    assert not bad, f"{name}: spark-vs-oracle type mismatches {bad}"


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(spark, duck, name):
    sdf = _frame(spark, name)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(_ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    a = _normalize(spark_rows, spark_cols)
    b = _normalize(duck_rows, duck_cols)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_queries_run(spark, name):
    sdf = _frame(spark, name)
    assert len(sdf.columns) > 0
    assert sdf.count() >= 0
