"""Round-9 widening: data-contract expectations (one-aggregate validation
suite) — per-rule report vs a DuckDB restatement, plan contract (one scan,
one aggregate), and the raising gate composition."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


def _frame(spark):
    rows = [
        (1, 10.0, "a", "x@y.io"),
        (2, 20.0, "b", "p@q.com"),
        (3, None, "a", "bad"),
        (4, 150.0, "c", None),
        (4, 30.0, "zz", "r@s.net"),
        (None, 5.0, "a", "t@u.org"),
    ]
    return rows, spark.createDataFrame(rows, "k bigint, v double, cat string, email string")


class TestExpectations:
    def test_report_matches_duckdb(self, spark):
        from oni_ml_spark.datapipe.contracts import (
            expect_distinct_count,
            expect_in_set,
            expect_not_null,
            expect_null_rate,
            expect_range,
            expect_regex,
            expect_row_count,
            expect_unique,
            run_expectations,
        )

        rows, df = _frame(spark)
        report = run_expectations(df, [
            expect_row_count(min_rows=1, max_rows=100),
            expect_not_null("k"),
            expect_unique("k"),
            expect_range("v", lo=0.0, hi=100.0),
            expect_in_set("cat", ["a", "b", "c"]),
            expect_null_rate("v", max_rate=0.2),
            expect_regex("email", r"^[^@]+@[^@]+\.[a-z]+$", min_rate=0.8),
            expect_distinct_count("cat", lo=2, hi=3),
        ]).collect()
        got = {(r["rule"], r["column"]): (r["ok"], r["observed"]) for r in report}

        import pandas as pd
        pdf = pd.DataFrame(rows, columns=["k", "v", "cat", "email"])  # noqa: F841
        want = duckdb.sql("""
            SELECT count(*) AS n, sum((k IS NULL)::BIGINT) AS k_nulls,
                   count(k) - count(DISTINCT k) AS k_dupes,
                   sum((v IS NOT NULL AND (v < 0 OR v > 100))::BIGINT) AS v_oor,
                   sum((cat IS NOT NULL AND cat NOT IN ('a','b','c'))::BIGINT) AS cat_bad,
                   avg((v IS NULL)::INT::DOUBLE) AS v_nullrate,
                   avg(CASE WHEN email IS NOT NULL
                       THEN regexp_matches(email, '^[^@]+@[^@]+\\.[a-z]+$')::INT::DOUBLE END)
                       AS email_rate,
                   count(DISTINCT cat) AS cat_distinct
            FROM pdf
        """).fetchone()
        n, k_nulls, k_dupes, v_oor, cat_bad, v_nullrate, email_rate, cat_distinct = want
        assert got[("row_count", None)] == (True, str(n))
        assert got[("not_null", "k")] == (k_nulls == 0, str(k_nulls))
        assert got[("unique", "k")] == (k_dupes == 0, str(k_dupes))
        assert got[("range", "v")] == (v_oor == 0, str(v_oor))
        assert got[("in_set", "cat")] == (cat_bad == 0, str(cat_bad))
        assert got[("null_rate", "v")][0] == (v_nullrate <= 0.2)
        assert float(got[("null_rate", "v")][1]) == pytest.approx(v_nullrate)
        assert got[("regex", "email")][0] == (email_rate >= 0.8)
        assert float(got[("regex", "email")][1]) == pytest.approx(email_rate)
        assert got[("distinct_count", "cat")] == (2 <= cat_distinct <= 3, str(cat_distinct))
        # the planted frame fails exactly these
        fails = {(r["rule"], r["column"]) for r in report if not r["ok"]}
        # regex PASSES: 4 of 5 non-null emails match = 0.8 >= min_rate 0.8
        assert fails == {("not_null", "k"), ("unique", "k"), ("range", "v"),
                         ("in_set", "cat"), ("distinct_count", "cat")}

    def test_one_scan_one_aggregate(self, spark):
        """Every rule folds into ONE aggregate over ONE scan (exact
        uniqueness adds an Expand, never a second scan)."""
        from oni_ml_spark.datapipe.contracts import (
            expect_not_null,
            expect_range,
            expect_row_count,
            expect_unique,
            run_expectations,
        )
        from oni_ml_spark.plans.diagnostics import plan_report

        e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        rep = plan_report(run_expectations(e, [
            expect_row_count(1), expect_not_null("event_id"),
            expect_unique("event_id"), expect_range("value", lo=0.0),
        ]))
        assert rep["scans"] == 1, rep["plan"]

    def test_validate_raises_with_named_rules(self, spark):
        from oni_ml_spark.datapipe.contracts import (
            expect_not_null,
            expect_range,
            validate_expectations,
        )

        _, df = _frame(spark)
        with pytest.raises(ValueError, match=r"not_null\(k\).*observed 1"):
            validate_expectations(df, [expect_not_null("k"), expect_range("v", hi=200.0)])
        ok = validate_expectations(df.where(F.col("k").isNotNull()),
                                   [expect_not_null("k")])
        assert [r["ok"] for r in ok.collect()] == [True]

    def test_edge_semantics(self, spark):
        """Empty frame: row_count and null_rate fail (no evidence IS the
        incident); regex and every violation-count rule pass (0
        violations, vacuously); NaN violates a finite hi bound; nulls
        are not keys for uniqueness."""
        from oni_ml_spark.datapipe.contracts import (
            expect_in_set,
            expect_not_null,
            expect_null_rate,
            expect_range,
            expect_regex,
            expect_row_count,
            expect_unique,
            run_expectations,
        )

        empty = spark.createDataFrame([], "k bigint, v double, s string")
        rep = {r["rule"]: r["ok"] for r in run_expectations(empty, [
            expect_row_count(1), expect_null_rate("v", 0.5),
            expect_regex("s", "^a"), expect_not_null("k"),
            expect_range("v", lo=0.0), expect_in_set("s", ["a"]),
        ]).collect()}
        # violation-count rules are vacuously TRUE on an empty frame
        # (0 violations, consistent with unique/regex); only row_count
        # and null_rate treat absence of evidence as the incident
        assert rep == {"row_count": False, "null_rate": False, "regex": True,
                       "not_null": True, "range": True, "in_set": True}

        nan_df = spark.createDataFrame(
            [(1, float("nan")), (2, 1.0), (None, 2.0), (None, 3.0)],
            "k bigint, v double",
        )
        rep2 = {r["rule"]: r for r in run_expectations(nan_df, [
            expect_range("v", lo=0.0, hi=10.0), expect_unique("k"),
        ]).collect()}
        assert rep2["range"]["ok"] is False and rep2["range"]["observed"] == "1"
        assert rep2["unique"]["ok"] is True  # nulls are not keys

    def test_validation_errors(self, spark):
        from oni_ml_spark.datapipe.contracts import (
            expect_in_set,
            expect_not_null,
            expect_null_rate,
            expect_range,
            expect_regex,
            run_expectations,
        )

        _, df = _frame(spark)
        with pytest.raises(ValueError, match="at least one"):
            run_expectations(df, [])
        with pytest.raises(ValueError, match="missing"):
            run_expectations(df, [expect_not_null("nope")])
        with pytest.raises(ValueError, match="lo and/or hi"):
            expect_range("v")
        with pytest.raises(ValueError, match="non-empty"):
            expect_in_set("cat", [])
        with pytest.raises(ValueError, match="must not contain None"):
            expect_in_set("cat", ["a", None])
        with pytest.raises(ValueError, match="max_rate"):
            expect_null_rate("v", 1.5)
        with pytest.raises(ValueError, match="min_rate"):
            expect_regex("s", "x", min_rate=0.0)


class TestGroupedExpectations:
    def test_grouped_matches_duckdb(self, spark):
        """Per-segment rules equal DuckDB restating the same grouped
        aggregates; the null group reports as '__null'."""
        from oni_ml_spark.datapipe.contracts import (
            expect_not_null,
            expect_null_rate,
            expect_range,
            expect_row_count,
            expect_unique,
            run_expectations_grouped,
        )

        rows = (
            [("s0", i, float(i % 40)) for i in range(60)]
            + [("s1", 100 + i, float(i % 120)) for i in range(140)]
            + [("s1", 100, 5.0)]           # duplicate key in s1
            + [(None, 900, None)]          # null group, null value
        )
        df = spark.createDataFrame(rows, "src string, k bigint, v double")
        rep = {
            (r["group"], r["rule"]): (r["ok"], r["observed"])
            for r in run_expectations_grouped(df, "src", [
                expect_row_count(min_rows=5),
                expect_not_null("k"),
                expect_unique("k"),
                expect_range("v", lo=0.0, hi=100.0),
                expect_null_rate("v", max_rate=0.1),
            ]).collect()
        }
        import duckdb
        import pandas as pd

        pdf = pd.DataFrame(rows, columns=["src", "k", "v"])  # noqa: F841
        want = duckdb.sql("""
            SELECT coalesce(src, '__null') AS g, count(*) AS n,
                   count(k) - count(DISTINCT k) AS dupes,
                   sum((v IS NOT NULL AND (v < 0 OR v > 100))::BIGINT) AS oor,
                   avg((v IS NULL)::INT::DOUBLE) AS nullrate
            FROM pdf GROUP BY 1
        """).fetchall()
        for g, n, dupes, oor, nullrate in want:
            assert rep[(g, "row_count")] == (n >= 5, str(n))
            assert rep[(g, "unique")] == (dupes == 0, str(dupes))
            assert rep[(g, "range")] == ((oor or 0) == 0, str(oor or 0))
            assert rep[(g, "null_rate")][0] == (nullrate <= 0.1)
        # segment verdicts: s1 fails unique + range; '__null' fails
        # row_count + null_rate; s0 passes everything
        assert rep[("s1", "unique")][0] is False
        assert rep[("s1", "range")][0] is False
        assert rep[("__null", "row_count")][0] is False
        assert rep[("__null", "null_rate")][0] is False
        assert all(rep[("s0", r)][0] for r in
                   ("row_count", "not_null", "unique", "range", "null_rate"))

    def test_grouped_plan_and_gate(self, spark):
        from oni_ml_spark.datapipe.contracts import (
            expect_not_null,
            expect_range,
            run_expectations_grouped,
            validate_expectations_grouped,
        )
        from oni_ml_spark.plans.diagnostics import plan_report

        e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        g = run_expectations_grouped(e, "event_type", [
            expect_not_null("event_id"), expect_range("value", lo=0.0),
        ])
        rep = plan_report(g)
        assert rep["scans"] == 1, rep["plan"]
        # gate: passes on the clean table, raises naming (group, rule)
        validate_expectations_grouped(e, "event_type", [expect_not_null("event_id")])
        bad = e.withColumn(
            "value",
            F.when(F.col("event_type") == "error", -1.0).otherwise(F.col("value")),
        )
        with pytest.raises(ValueError, match=r"group 'error' range\(value\)"):
            validate_expectations_grouped(bad, "event_type", [expect_range("value", lo=0.0)])

    def test_grouped_validation(self, spark):
        from oni_ml_spark.datapipe.contracts import (
            expect_not_null,
            run_expectations_grouped,
        )

        df = spark.createDataFrame([("a", 1)], "src string, k bigint")
        with pytest.raises(ValueError, match="group column"):
            run_expectations_grouped(df, "nope", [expect_not_null("k")])
        with pytest.raises(ValueError, match="targets the group column"):
            run_expectations_grouped(df, "src", [expect_not_null("src")])
        with pytest.raises(ValueError, match="reserved column 'group'"):
            run_expectations_grouped(
                df.withColumn("group", F.lit("x")), "src", [expect_not_null("k")]
            )
        # sentinel collision: a REAL '__null' group raises in-plan
        dirty = spark.createDataFrame([("__null", 1)], "src string, k bigint")
        with pytest.raises(Exception, match="reserved sentinel"):
            run_expectations_grouped(dirty, "src", [expect_not_null("k")]).collect()

    def test_distinct_count_approx_path(self, spark):
        """approx=True (HLL++, no Expand) satisfies order-of-magnitude
        bounds and is labeled approx in the report."""
        from oni_ml_spark.datapipe.contracts import (
            expect_distinct_count,
            run_expectations,
        )
        from oni_ml_spark.plans.diagnostics import plan_report

        d = spark.range(10_000).select((F.col("id") % 500).cast("string").alias("k"))
        rows = run_expectations(
            d, [expect_distinct_count("k", lo=400, hi=600, approx=True)]
        ).collect()
        assert rows[0]["ok"] and "(approx)" in rows[0]["expected"]
        # an approx rule next to an exact-distinct rule removes one
        # distinct group from the Expand (Expand only appears when
        # several DISTINCT aggregates share the agg); both stay one scan
        from oni_ml_spark.datapipe.contracts import expect_unique

        two_exact = run_expectations(
            d.withColumn("k2", F.col("k")),
            [expect_unique("k"), expect_distinct_count("k2", lo=1)],
        )
        mixed = run_expectations(
            d.withColumn("k2", F.col("k")),
            [expect_unique("k"), expect_distinct_count("k2", lo=1, approx=True)],
        )
        r_exact, r_mixed = plan_report(two_exact), plan_report(mixed)
        # (the one-scan contract over a FILE source is pinned by
        # test_one_scan_one_aggregate; spark.range has no Scan node)
        assert r_mixed["nodes"].get("Expand", 0) <= r_exact["nodes"].get("Expand", 0)


class TestInferExpectations:
    def test_infer_then_validate_roundtrip(self, spark):
        """The two-line gate: a contract inferred from a reference corpus
        passes a same-distribution batch and fails a corrupted one, with
        the violated rules named."""
        from oni_ml_spark.datapipe.contracts import (
            infer_expectations,
            validate_expectations,
        )

        e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        ref = e.filter(F.col("event_id") % 2 == 0).select(
            "event_id", "user_id", "event_type", "value"
        )
        rules = infer_expectations(ref)
        kinds = {(r.rule, r.column) for r in rules}
        # per-column null-rate everywhere, ranges for numerics, a
        # dictionary for the 5-value event_type, plus the row floor
        assert ("row_count", None) in kinds
        assert ("null_rate", "value") in kinds and ("range", "value") in kinds
        assert ("in_set", "event_type") in kinds
        assert ("range", "event_type") not in kinds  # strings get no range

        # the other half of the same generator passes the whole contract
        cur = e.filter(F.col("event_id") % 2 == 1).select(
            "event_id", "user_id", "event_type", "value"
        )
        assert all(r["ok"] for r in validate_expectations(cur, rules).collect())

        # a corrupted batch fails with the rules named
        bad = cur.withColumn(
            "value", F.col("value") * 1000
        ).withColumn(
            "event_type",
            F.when(F.col("event_id") % 3 == 0, "mystery").otherwise(F.col("event_type")),
        )
        with pytest.raises(ValueError) as ei:
            validate_expectations(bad, rules)
        msg = str(ei.value)
        assert "range(value)" in msg and "in_set(event_type)" in msg

    def test_infer_bounds_and_guards(self, spark):
        from oni_ml_spark.datapipe.contracts import infer_expectations

        df = spark.createDataFrame(
            [(1, 10.0, "a"), (2, 20.0, "b"), (3, None, None)],
            "k bigint, v double, s string",
        )
        rules = {(r.rule, r.column): r for r in infer_expectations(
            df, range_slack=0.0, null_rate_slack=1.5, null_rate_floor=0.0
        )}
        # exact envelope at slack 0
        assert "values in [10.0, 20.0]" == rules[("range", "v")].expected
        # observed null rate 1/3 * 1.5 = 0.5
        assert "null rate <= 0.5" == rules[("null_rate", "v")].expected
        # observed dictionary (nulls excluded)
        assert "['a', 'b']" in rules[("in_set", "s")].expected

        # a high-cardinality string column gets NO dictionary rule
        wide = spark.range(1000).select(
            F.col("id").alias("k"), F.col("id").cast("string").alias("s")
        )
        kinds = {(r.rule, r.column) for r in infer_expectations(wide, set_max=50)}
        assert ("in_set", "s") not in kinds

        empty = spark.createDataFrame([], "k bigint")
        with pytest.raises(ValueError, match="no rows"):
            infer_expectations(empty)
        with pytest.raises(ValueError, match="missing"):
            infer_expectations(df, columns=["nope"])
        with pytest.raises(ValueError, match="set_max"):
            infer_expectations(df, set_max=0)
        with pytest.raises(ValueError, match="range_slack"):
            infer_expectations(df, null_rate_slack=0.5)

    def test_infer_nan_and_empty_grouped_gate(self, spark):
        """Review r9: a NaN in the reference must not freeze a [NaN, NaN]
        envelope (every finite row would violate it); the grouped gate
        must RAISE on an empty input, never report a pass on zero
        evidence."""
        from oni_ml_spark.datapipe.contracts import (
            expect_not_null,
            infer_expectations,
            run_expectations,
            validate_expectations_grouped,
        )

        ref = spark.createDataFrame(
            [(1.0,), (5.0,), (float("nan"),)], "v double"
        )
        rules = {r.rule: r for r in infer_expectations(ref, range_slack=0.0)}
        assert rules["range"].expected == "values in [1.0, 5.0]"
        # the NaN row violates the finite envelope — surfaced at
        # authoring time, by design
        rep = {r["rule"]: r for r in run_expectations(ref, [rules["range"]]).collect()}
        assert rep["range"]["ok"] is False and rep["range"]["observed"] == "1"
        # a NaN-free reference passes its own inferred contract
        clean = spark.createDataFrame([(1.0,), (5.0,)], "v double")
        crules = infer_expectations(clean, range_slack=0.0)
        assert all(r["ok"] for r in run_expectations(clean, crules).collect())

        empty = spark.createDataFrame([], "src string, k bigint")
        with pytest.raises(ValueError, match="feed went dark"):
            validate_expectations_grouped(empty, "src", [expect_not_null("k")])


class TestContractsProperty:
    """Property-based: rule arithmetic agrees with a direct pure-Python
    evaluation on arbitrary small frames (nulls, NaN, duplicates,
    negative values, empty allowed-set misses)."""

    def test_rules_match_python_oracle(self, spark):
        import math

        from hypothesis import given, settings, strategies as st

        from oni_ml_spark.datapipe.contracts import (
            expect_in_set,
            expect_not_null,
            expect_null_rate,
            expect_range,
            expect_row_count,
            expect_unique,
            run_expectations,
        )

        vals = st.lists(
            st.one_of(
                st.none(),
                st.integers(min_value=-5, max_value=5),
                st.just(float("nan")),
            ),
            min_size=0,
            max_size=12,
        )

        @settings(max_examples=20, deadline=None, derandomize=True)
        @given(vals=vals, lo=st.integers(-3, 0), hi=st.integers(1, 4))
        def check(vals, lo, hi):
            rows = [(float(v) if v is not None else None,) for v in vals]
            df = spark.createDataFrame(rows, "v double")
            rep = {r["rule"]: r for r in run_expectations(df, [
                expect_row_count(min_rows=1),
                expect_not_null("v"),
                expect_unique("v"),
                expect_range("v", lo=float(lo), hi=float(hi)),
                expect_null_rate("v", max_rate=0.3),
                expect_in_set("v", [str(float(x)) for x in range(-2, 3)]),
            ]).collect()}
            n = len(vals)
            nn = [v for v in vals if v is not None]
            nulls = n - len(nn)
            assert rep["row_count"]["ok"] == (n >= 1)
            assert rep["not_null"]["observed"] == str(nulls)
            # unique: NaN equals NaN in Spark's grouping semantics
            keys = [float(v) for v in nn]
            canon = ["nan" if math.isnan(k) else k for k in keys]
            dupes = len(canon) - len(set(canon))
            assert rep["unique"]["observed"] == str(dupes), (vals, rep["unique"])
            # range: NaN > finite hi in Spark's ordering -> violation
            oor = sum(
                1 for v in (float(x) for x in nn)
                if math.isnan(v) or v < lo or v > hi
            )
            assert rep["range"]["observed"] == str(oor)
            if n:
                assert float(rep["null_rate"]["observed"]) == pytest.approx(nulls / n)
                assert rep["null_rate"]["ok"] == (nulls / n <= 0.3)
            else:
                assert rep["null_rate"]["ok"] is False
            # in_set over a CAST to string: NaN casts to 'NaN' (not in
            # the allowed list), integers to '1.0' etc.
            allowed = {str(float(x)) for x in range(-2, 3)}
            bad = sum(
                1 for v in (float(x) for x in nn)
                if ("NaN" if math.isnan(v) else str(v)) not in allowed
            )
            # Spark casts double->string with its own formatting; both
            # engines here are Spark (cast in rule input), so compare
            # against Spark's cast via the observed count only when no
            # NaN formatting ambiguity exists
            assert rep["in_set"]["observed"] == str(bad), (vals, rep["in_set"])

        check()


class TestVectorContracts:
    """(r10) expect_array_dim / expect_no_nan — the embedding-column
    contract at ingest."""

    def test_array_dim_and_no_nan_elementwise(self, spark):
        from oni_ml_spark.datapipe.contracts import (
            expect_array_dim,
            expect_no_nan,
            run_expectations,
        )

        nan = float("nan")
        df = spark.createDataFrame(
            [
                (1, [1.0, 2.0], 1.0),
                (2, [3.0], 2.0),          # wrong dim
                (3, None, nan),           # null array passes dim; scalar NaN
                (4, [nan, 5.0], 4.0),     # elementwise NaN
            ],
            "id bigint, emb array<double>, s double",
        )
        rep = {
            (r["rule"], r["column"]): (r["ok"], r["observed"])
            for r in run_expectations(df, [
                expect_array_dim("emb", 2),
                expect_no_nan("emb", elementwise=True),
                expect_no_nan("s"),
            ]).collect()
        }
        assert rep[("array_dim", "emb")] == (False, "1")   # row 2 only
        assert rep[("no_nan", "emb")] == (False, "1")      # row 4 only
        assert rep[("no_nan", "s")] == (False, "1")        # row 3 only

        clean = spark.createDataFrame(
            [(1, [1.0, 2.0], 0.5)], "id bigint, emb array<double>, s double"
        )
        rep2 = {
            (r["rule"], r["column"]): r["ok"]
            for r in run_expectations(clean, [
                expect_array_dim("emb", 2),
                expect_no_nan("emb", elementwise=True),
                expect_no_nan("s"),
            ]).collect()
        }
        assert rep2 == {
            ("array_dim", "emb"): True,
            ("no_nan", "emb"): True,
            ("no_nan", "s"): True,
        }

    def test_array_dim_guard(self, spark):
        from oni_ml_spark.datapipe.contracts import expect_array_dim

        with pytest.raises(ValueError, match="dim must be"):
            expect_array_dim("emb", 0)

    def test_infer_learns_vector_rules(self, spark):
        """(r10) inference: a constant-dim NaN-free embedding reference
        pins array_dim + elementwise no_nan; a later ragged/NaN batch
        fails exactly those rules. Variable-dim or NaN-carrying
        references infer nothing for that column."""
        from oni_ml_spark.datapipe.contracts import (
            infer_expectations,
            run_expectations,
        )

        nan = float("nan")
        ref = spark.createDataFrame(
            [(1, [1.0, 2.0], 0.5), (2, [3.0, 4.0], 1.5)],
            "id bigint, emb array<double>, s double",
        )
        rules = infer_expectations(ref)
        kinds = {(r.rule, r.column) for r in rules}
        assert ("array_dim", "emb") in kinds
        assert ("no_nan", "emb") in kinds and ("no_nan", "s") in kinds

        bad = spark.createDataFrame(
            [(1, [1.0], 0.5), (2, [3.0, nan], nan)],
            "id bigint, emb array<double>, s double",
        )
        rep = {
            (r["rule"], r["column"]): r["ok"]
            for r in run_expectations(bad, rules).collect()
        }
        assert rep[("array_dim", "emb")] is False
        assert rep[("no_nan", "emb")] is False
        assert rep[("no_nan", "s")] is False

        # ragged / NaN-carrying reference: no vector rules inferred
        loose = spark.createDataFrame(
            [(1, [1.0], nan), (2, [3.0, 4.0], 1.0)],
            "id bigint, emb array<double>, s double",
        )
        kinds2 = {(r.rule, r.column) for r in infer_expectations(loose)}
        assert ("array_dim", "emb") not in kinds2
        assert ("no_nan", "s") not in kinds2
        assert ("no_nan", "emb") in kinds2  # emb itself is NaN-free
