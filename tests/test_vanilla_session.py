"""Driver-session fidelity check: the round driver calls queries() on a
VANILLA SparkSession — none of session.py's configs (UTC timezone, legacy
parquet confs, AQE tuning) exist there. A config-sensitive regression
(round 2: events.ts loading as TIMESTAMP_NTZ broke sessionize only on the
driver) is invisible to every other test in this suite because conftest
builds the tuned session.

This test spawns a FRESH python process (Spark is one-JVM-per-process, so
an in-process "new session" would inherit the tuned SparkContext conf) and
runs the config-sensitive battery queries on a plain
SparkSession.builder.master("local[4]") against their DuckDB oracles.
"""

from __future__ import annotations

import json
import subprocess
import sys

# queries whose semantics touch session config: timestamp handling (tz,
# parquet timestamp flavor), date literals, and integer-sum hashing
SENSITIVE = [
    "sessionize", "time_features", "pivot_counts", "tpch_q1_q3", "as_of_join",
    "temporal_reshape",
    # partition-count-sensitive mechanism (boundary-independent result):
    # offsets are computed against the session's range partitioning
    "contiguous_ids",
    # seeded-MLlib invariant flags: k-means|| init and MinHashLSH sampling
    # see the session's partitioning, which differs on a vanilla session
    # (shuffle.partitions 200 vs our 32) — the flags must hold regardless
    "ann_ivf_kmeans", "minhash_ml_builtin",
    # partitioning-sensitive composition: pack_sequences' bin assignment
    # depends on the session's shuffle partitioning — the invariant flags
    # (capacity, bin lower bound) must hold under ANY partitioning
    "curation_pipeline",
]

_SCRIPT = r"""
import json, sys
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[4]").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
import duckdb
import __spark_entry__ as m
SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
out = {}
for name in json.loads(sys.argv[1]):
    sdf = m.queries()[name](spark, SF)
    order_s = sorted(range(len(sdf.columns)), key=lambda i: sdf.columns[i])
    res = con.execute(m.oracle_sql()[name])
    cols = [d[0] for d in res.description]
    order_d = sorted(range(len(cols)), key=lambda i: cols[i])
    srows = sorted(tuple(str(r[i]) for i in order_s) for r in sdf.collect())
    drows = sorted(tuple(str(r[i]) for i in order_d) for r in res.fetchall())
    out[name] = {
        "match": srows == drows,
        "spark_rows": len(srows),
        "oracle_rows": len(drows),
    }
print("RESULT:" + json.dumps(out))
"""


import os

import pytest


@pytest.mark.parametrize(
    "tz",
    [
        # r13 budget: the UTC leg duplicates tests/test_oracle_parity.py's
        # coverage (same queries, UTC-pinned session there) — the
        # DST-observing zone is the leg that actually exercises tz
        # portability, so it stays in the default profile and UTC moves
        # to the full (-m "") profile.
        pytest.param("UTC", marks=pytest.mark.slow),
        "America/New_York",
    ],
)
def test_sensitive_queries_match_oracle_on_vanilla_session(tz):
    """Runs twice: once in UTC (the container default) and once in a
    DST-observing zone, proving the NTZ epoch arithmetic is independent of
    the driver JVM's timezone (round-3 review finding: the former
    session-tz pin inside load_table was a hidden global mutation; now no
    pin exists and no query may depend on the zone)."""
    env = dict(os.environ, TZ=tz)
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT, json.dumps(SENSITIVE)],
        capture_output=True,
        text=True,
        timeout=420,
        cwd="/root/repo",
        env=env,
    )
    assert proc.returncode == 0, f"vanilla-session run failed:\n{proc.stderr[-3000:]}"
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT:")]
    assert line, f"no RESULT line in output:\n{proc.stdout[-2000:]}"
    results = json.loads(line[0][len("RESULT:"):])
    bad = {k: v for k, v in results.items() if not v["match"]}
    assert not bad, f"vanilla-session oracle mismatches: {bad}"
    assert set(results) == set(SENSITIVE)


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_FULL_GATE") != "1",
    reason="full 50-entry vanilla-session gate simulation (~4 min); "
    "set SPARK_GRAFT_FULL_GATE=1 to run — the SENSITIVE subset above runs always",
)
def test_full_battery_matches_oracle_on_vanilla_session():
    """Direct simulation of the round driver's CORRECTNESS gate: every
    registered entry, fresh vanilla SparkSession, non-UTC timezone."""
    import __spark_entry__ as m

    names = list(m.queries())
    env = dict(os.environ, TZ="America/New_York")
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT, json.dumps(names)],
        capture_output=True,
        text=True,
        timeout=900,
        cwd="/root/repo",
        env=env,
    )
    assert proc.returncode == 0, f"vanilla-session run failed:\n{proc.stderr[-3000:]}"
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT:")]
    assert line, f"no RESULT line in output:\n{proc.stdout[-2000:]}"
    results = json.loads(line[0][len("RESULT:"):])
    bad = {k: v for k, v in results.items() if not v["match"]}
    assert not bad, f"vanilla-session oracle mismatches: {bad}"
    assert set(results) == set(names)
