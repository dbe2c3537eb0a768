"""Round-8 widening: distribution-drift monitoring (PSI/KL vs a DuckDB
restatement + hand-computed goldens) and the full PII scrub/audit pair
(Java-regex vs RE2 parity on the shared pattern inventory)."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F


class TestDriftCompare:
    def test_identical_corpora_score_zero(self, spark):
        from oni_ml_spark.datapipe.drift import drift_compare

        d = spark.range(1000).select((F.col("id") % 97).cast("double").alias("v"))
        out = drift_compare(d, d, "v", n_bins=8)
        agg = out.agg(F.sum("psi_term").alias("psi"), F.sum("kl_term").alias("kl")).first()
        assert abs(agg["psi"]) < 1e-12 and abs(agg["kl"]) < 1e-12

    def test_shifted_corpus_flags_action(self, spark):
        from oni_ml_spark.datapipe.drift import drift_compare, drift_summary

        ref = spark.range(5000).select((F.col("id") % 100).cast("double").alias("v"))
        cur = spark.range(5000).select(
            ((F.col("id") % 100) + 60).cast("double").alias("v")
        )
        psi = (
            drift_compare(ref, cur, "v", n_bins=10)
            .agg(F.sum("psi_term").alias("p"))
            .first()["p"]
        )
        assert psi > 0.25  # a 60-point location shift is unmissable
        s = drift_summary(ref, cur, ["v"]).first()
        assert s["verdict"] == "action"
        assert s["mean_cur"] - s["mean_ref"] == pytest.approx(60.0)

    def test_matches_duckdb_restatement(self, spark):
        """Fixed explicit edges: the per-bin counts, smoothed proportions,
        and PSI/KL terms must equal DuckDB computing the same formulas."""
        from oni_ml_spark.datapipe.drift import drift_compare

        ref_rows = [(float(i % 13),) for i in range(400)]
        cur_rows = (
            [(float((i * 7) % 17),) for i in range(300)]
            + [(None,)] * 20
            + [(float("nan"),)] * 6  # NaN tracked with nulls in bin -1
        )
        ref = spark.createDataFrame(ref_rows, "v double")
        cur = spark.createDataFrame(cur_rows, "v double")
        edges = [3.0, 6.0, 9.0, 12.0]
        got = {
            int(r["bin"]): (r["n_ref"], r["n_cur"], round(r["psi_term"], 9))
            for r in drift_compare(ref, cur, "v", edges=edges).collect()
        }
        import pandas as pd

        ref_pd, cur_pd = pd.DataFrame(ref_rows, columns=["v"]), pd.DataFrame(
            cur_rows, columns=["v"]
        )
        want = duckdb.sql(
            """
            WITH rb AS (SELECT CASE WHEN v IS NULL OR isnan(v) THEN -1
                 WHEN v <= 3 THEN 0 WHEN v <= 6 THEN 1 WHEN v <= 9 THEN 2
                 WHEN v <= 12 THEN 3 ELSE 4 END AS bin FROM ref_pd),
            cb AS (SELECT CASE WHEN v IS NULL OR isnan(v) THEN -1
                 WHEN v <= 3 THEN 0 WHEN v <= 6 THEN 1 WHEN v <= 9 THEN 2
                 WHEN v <= 12 THEN 3 ELSE 4 END AS bin FROM cur_pd),
            r AS (SELECT bin, count(*) AS nr FROM rb GROUP BY bin),
            c AS (SELECT bin, count(*) AS nc FROM cb GROUP BY bin),
            j AS (SELECT coalesce(r.bin, c.bin) AS bin,
                  coalesce(nr, 0) AS nr, coalesce(nc, 0) AS nc
                  FROM r FULL OUTER JOIN c ON r.bin = c.bin),
            t AS (SELECT sum(nr) AS tr, sum(nc) AS tc, count(*) AS nb FROM j)
            SELECT bin, nr, nc,
              round(((nc + 0.5) / (tc + 0.5 * nb) - (nr + 0.5) / (tr + 0.5 * nb))
                * ln(((nc + 0.5) / (tc + 0.5 * nb)) / ((nr + 0.5) / (tr + 0.5 * nb))), 9)
              AS psi_term
            FROM j, t
            """
        ).fetchall()
        assert got == {int(b): (nr, nc, ps) for b, nr, nc, ps in want}

    def test_grouped_matches_duckdb_and_ungrouped_per_segment(self, spark):
        """drift_compare_grouped == DuckDB restating per-group smoothed
        terms, AND each group's rows equal drift_compare run on that
        group's slice alone (the self-contained-per-segment contract)."""
        from oni_ml_spark.datapipe.drift import drift_compare, drift_compare_grouped

        edges = [3.0, 7.0]
        ref_rows = [(f"s{i % 3}", float(i % 11)) for i in range(300)]
        cur_rows = [(f"s{i % 3}", float((i * 5) % 13)) for i in range(240)] + [
            (None, 2.0)
        ] * 9 + [("s1", None)] * 6
        ref = spark.createDataFrame(ref_rows, "g string, v double")
        cur = spark.createDataFrame(cur_rows, "g string, v double")
        got = {
            (r["group"], r["bin"]): (r["n_ref"], r["n_cur"], round(r["psi_term"], 9))
            for r in drift_compare_grouped(ref, cur, "g", "v", edges).collect()
        }
        import pandas as pd

        ref_pd = pd.DataFrame(ref_rows, columns=["g", "v"])
        cur_pd = pd.DataFrame(cur_rows, columns=["g", "v"])
        want = duckdb.sql(
            """
            WITH rb AS (SELECT coalesce(g, '__null') AS grp,
                 CASE WHEN v IS NULL OR isnan(v) THEN -1 WHEN v <= 3 THEN 0
                      WHEN v <= 7 THEN 1 ELSE 2 END AS bin FROM ref_pd),
            cb AS (SELECT coalesce(g, '__null') AS grp,
                 CASE WHEN v IS NULL OR isnan(v) THEN -1 WHEN v <= 3 THEN 0
                      WHEN v <= 7 THEN 1 ELSE 2 END AS bin FROM cur_pd),
            r AS (SELECT grp, bin, count(*)::BIGINT AS nr FROM rb GROUP BY 1, 2),
            c AS (SELECT grp, bin, count(*)::BIGINT AS nc FROM cb GROUP BY 1, 2),
            j AS (SELECT coalesce(r.grp, c.grp) AS grp, coalesce(r.bin, c.bin) AS bin,
                  coalesce(nr, 0) AS nr, coalesce(nc, 0) AS nc
                  FROM r FULL OUTER JOIN c ON r.grp = c.grp AND r.bin = c.bin),
            t AS (SELECT grp, sum(nr)::DOUBLE AS tr, sum(nc)::DOUBLE AS tc,
                  count(*)::DOUBLE AS nb FROM j GROUP BY grp)
            SELECT j.grp, bin, nr, nc,
              round(((nc::DOUBLE + 0.5) / (tc + 0.5 * nb) - (nr::DOUBLE + 0.5) / (tr + 0.5 * nb))
                * ln(((nc::DOUBLE + 0.5) / (tc + 0.5 * nb)) / ((nr::DOUBLE + 0.5) / (tr + 0.5 * nb))), 9)
            FROM j JOIN t USING (grp)
            """
        ).fetchall()
        assert got == {(g, b): (nr, nc, ps) for g, b, nr, nc, ps in want}

        # per-segment self-containment: group s0 rows == ungrouped
        # drift_compare on the s0 slices
        s0 = {
            r["bin"]: (r["n_ref"], r["n_cur"], round(r["psi_term"], 9))
            for r in drift_compare(
                ref.filter(F.col("g") == "s0").select("v"),
                cur.filter(F.col("g") == "s0").select("v"),
                "v",
                edges=edges,
            ).collect()
        }
        grouped_s0 = {
            b: v for (g, b), v in got.items() if g == "s0"
        }
        assert grouped_s0 == s0

    def test_grouped_validation(self, spark):
        from oni_ml_spark.datapipe.drift import drift_compare_grouped

        d = spark.createDataFrame([("a", 1.0)], "g string, v double")
        with pytest.raises(ValueError, match="ascending"):
            drift_compare_grouped(d, d, "g", "v", [5.0, 2.0])
        with pytest.raises(ValueError, match="non-empty"):
            drift_compare_grouped(d, d, "g", "v", [])
        bad = spark.createDataFrame([("__null", 1.0)], "g string, v double")
        with pytest.raises(Exception, match="reserved sentinel"):
            drift_compare_grouped(d, bad, "g", "v", [2.0]).collect()

    def test_categorical_matches_duckdb(self, spark):
        """No top_k: per-category counts and psi/kl terms equal DuckDB
        running the same smoothed formulas, nulls as their own key and an
        abandoned category surviving the full-outer join."""
        from oni_ml_spark.datapipe.drift import drift_compare_categorical

        ref_rows = [("a",)] * 50 + [("b",)] * 30 + [("gone",)] * 20 + [(None,)] * 5
        cur_rows = [("a",)] * 40 + [("b",)] * 45 + [("new",)] * 10 + [(None,)] * 12
        ref = spark.createDataFrame(ref_rows, "k string")
        cur = spark.createDataFrame(cur_rows, "k string")
        got = {
            r["key"]: (r["n_ref"], r["n_cur"], round(r["psi_term"], 9))
            for r in drift_compare_categorical(ref, cur, "k").collect()
        }
        assert set(got) == {"a", "b", "gone", "new", "__null"}
        assert got["gone"][1] == 0 and got["new"][0] == 0
        import pandas as pd

        ref_pd = pd.DataFrame(ref_rows, columns=["k"])
        cur_pd = pd.DataFrame(cur_rows, columns=["k"])
        want = duckdb.sql(
            """
            WITH r AS (SELECT coalesce(k, '__null') AS key, count(*)::BIGINT AS nr
                       FROM ref_pd GROUP BY 1),
            c AS (SELECT coalesce(k, '__null') AS key, count(*)::BIGINT AS nc
                  FROM cur_pd GROUP BY 1),
            j AS (SELECT coalesce(r.key, c.key) AS key, coalesce(nr, 0) AS nr,
                  coalesce(nc, 0) AS nc FROM r FULL OUTER JOIN c ON r.key = c.key),
            t AS (SELECT sum(nr)::DOUBLE AS tr, sum(nc)::DOUBLE AS tc,
                  count(*)::DOUBLE AS nb FROM j)
            SELECT key, nr, nc,
              round(((nc::DOUBLE + 0.5) / (tc + 0.5 * nb) - (nr::DOUBLE + 0.5) / (tr + 0.5 * nb))
                * ln(((nc::DOUBLE + 0.5) / (tc + 0.5 * nb)) / ((nr::DOUBLE + 0.5) / (tr + 0.5 * nb))), 9)
            FROM j, t
            """
        ).fetchall()
        assert got == {k: (nr, nc, ps) for k, nr, nc, ps in want}

    def test_categorical_topk_preserves_mass(self, spark):
        """top_k coarsening: the kept keys are the union of both sides'
        heaviest, everything else lands in '__other', and total counts
        (probability mass) are exactly preserved."""
        from oni_ml_spark.datapipe.drift import drift_compare_categorical

        ref = spark.range(1000).select(
            F.concat(F.lit("k"), (F.col("id") % 37).cast("string")).alias("k")
        )
        cur = spark.range(800).select(
            F.concat(F.lit("k"), ((F.col("id") % 23) + 10).cast("string")).alias("k")
        )
        out = drift_compare_categorical(ref, cur, "k", top_k=5).collect()
        keys = {r["key"] for r in out}
        assert "__other" in keys and len(keys) <= 11  # <=2*top_k kept + other
        assert sum(r["n_ref"] for r in out) == 1000
        assert sum(r["n_cur"] for r in out) == 800
        full = drift_compare_categorical(ref, cur, "k").collect()
        # coarsened table is a partition refinement: kept keys carry the
        # same counts as the full table
        full_map = {r["key"]: (r["n_ref"], r["n_cur"]) for r in full}
        for r in out:
            if r["key"] != "__other":
                assert (r["n_ref"], r["n_cur"]) == full_map[r["key"]]

    def test_plan_contract_one_scan_per_side(self, spark):
        """The 100 TB shape: each corpus is scanned ONCE (the totals come
        from a k-bounded window over the count table, not a second
        aggregate joined back — that restatement used to duplicate the
        whole upstream subtree, 4 scans instead of 2), no cartesian
        product, and the only shuffles carry bin/category subtotals."""
        from oni_ml_spark.datapipe.drift import (
            drift_compare,
            drift_compare_categorical,
            drift_compare_grouped,
        )
        from oni_ml_spark.plans.diagnostics import assert_plan

        e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        ref = e.filter((F.col("user_id") % 2) == 0)
        cur = e.filter((F.col("user_id") % 2) == 1)
        for df in (
            drift_compare(ref, cur, "value", edges=[5.0, 35.0]),
            drift_compare_grouped(ref, cur, "event_type", "value", [5.0, 35.0]),
        ):
            rep = assert_plan(df, max_exchanges=3, forbid=["CartesianProduct"])
            assert rep["scans"] == 2, rep["plan"]
        # the categorical paths reuse their count-table subtrees (top-k
        # keep sets / broadcast totals), so the static plan prints extra
        # scans; AQE ReusedExchange restores one scan per side at runtime
        df = drift_compare_categorical(ref, cur, "event_type")
        df.collect()
        executed = df._jdf.queryExecution().executedPlan().toString()
        assert executed.count("ReusedExchange") >= 2, executed

    def test_validation(self, spark):
        from oni_ml_spark.datapipe.drift import (
            binned_counts,
            drift_compare,
            drift_summary,
        )

        d = spark.range(10).select(F.col("id").cast("double").alias("v"))
        with pytest.raises(ValueError, match="ascending"):
            binned_counts(d, "v", [3.0, 1.0], "ref")
        with pytest.raises(ValueError, match="smoothing"):
            drift_compare(d, d, "v", smoothing=0.0)
        empty = spark.createDataFrame([(None,)], "v double")
        with pytest.raises(ValueError, match="no non-null"):
            drift_compare(empty, d, "v")
        with pytest.raises(ValueError, match="n_bins must be >= 2"):
            drift_compare(d, d, "v", n_bins=1)
        # an empty current snapshot is named, not a float(None) TypeError
        no_rows = spark.createDataFrame([], "v double")
        with pytest.raises(ValueError, match="cur side has no rows"):
            drift_summary(d, no_rows, ["v"])

    def test_categorical_sentinel_collision_raises(self, spark):
        from oni_ml_spark.datapipe.drift import drift_compare_categorical

        clean = spark.createDataFrame([("a",), ("b",)], "k string")
        dirty = spark.createDataFrame([("a",), ("__null",)], "k string")
        with pytest.raises(Exception, match="reserved sentinel"):
            drift_compare_categorical(clean, dirty, "k").collect()
        # '__other' is only reserved when top_k coarsening is on
        other = spark.createDataFrame([("__other",), ("b",)], "k string")
        assert drift_compare_categorical(clean, other, "k").count() == 3
        with pytest.raises(Exception, match="reserved sentinel"):
            drift_compare_categorical(clean, other, "k", top_k=5).collect()


_PII_DOCS = [
    (0, "mail me at jane.doe+x@example.co.uk or call 555-867-5309 today"),
    (1, "server 10.1.2.3 responded; card 4111-1111-1111-1111 declined"),
    (2, "ssn 123-45-6789 on file, backup ssn 987-65-4321"),
    (3, "nothing sensitive here, just 42 and a date 2024-01-01"),
    (4, "intl +1 (415) 555-0199 and bare 16-digit 4242424242424242"),
    (5, None),
]


class TestPiiScrub:
    def test_goldens(self, spark):
        from oni_ml_spark.datapipe.textstats import scrub_pii

        df = spark.createDataFrame(_PII_DOCS, "id bigint, text string")
        got = {r["id"]: r["text"] for r in scrub_pii(df, "text").collect()}
        assert got[0] == "mail me at <EMAIL> or call <PHONE> today"
        assert got[1] == "server <IP> responded; card <CC> declined"
        assert got[2] == "ssn <SSN> on file, backup ssn <SSN>"
        assert got[3] == _PII_DOCS[3][1]  # untouched
        assert got[4] == "intl <PHONE> and bare 16-digit <CC>"
        assert got[5] is None

    def test_counts_match_duckdb_re2(self, spark):
        """Java regex (Spark) and RE2 (DuckDB) must agree on every pattern
        over every fixture doc — the engine-portability contract the
        inventory documents."""
        from oni_ml_spark.datapipe.textstats import PII_PATTERNS, pii_counts

        df = spark.createDataFrame(_PII_DOCS, "id bigint, text string")
        got = sorted(
            tuple(r) for r in pii_counts(df, "id", "text").collect()
        )
        import pandas as pd

        docs_pd = pd.DataFrame(_PII_DOCS, columns=["id", "text"])
        exprs = ", ".join(
            f"coalesce(length(regexp_extract_all(text, '{pat}')), 0) AS {kind}_n"
            for kind, (pat, _) in PII_PATTERNS.items()
        )
        total = " + ".join(f"{kind}_n" for kind in PII_PATTERNS)
        want = sorted(
            tuple(r)
            for r in duckdb.sql(
                f"SELECT id, {exprs}, {total} AS pii_total FROM "
                f"(SELECT id, {exprs}, text FROM docs_pd)"
            ).fetchall()
        )
        assert got == want

    def test_kind_subset_and_validation(self, spark):
        from oni_ml_spark.datapipe.textstats import pii_counts, scrub_pii

        df = spark.createDataFrame(_PII_DOCS, "id bigint, text string")
        only_email = {
            r["id"]: r["clean"]
            for r in scrub_pii(df, "text", kinds=["email"], out_col="clean").collect()
        }
        assert "<EMAIL>" in only_email[0] and "555-867-5309" in only_email[0]
        with pytest.raises(ValueError, match="unknown PII kind"):
            scrub_pii(df, "text", kinds=["passport"])
        with pytest.raises(ValueError, match="unknown PII kind"):
            pii_counts(df, "id", "text", kinds=["dna"])

    def test_scrub_is_pure_codegen(self, spark):
        """No UDF, no shuffle: the scrub plans as a single projection over
        the scan."""
        from oni_ml_spark.datapipe.textstats import scrub_pii

        df = spark.createDataFrame(_PII_DOCS, "id bigint, text string")
        plan = scrub_pii(df, "text")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "PythonUDF" not in plan.replace(
            "BatchEvalPython", "PythonUDF"
        )

class TestEmbeddingDrift:
    def _vecs(self, n, f):
        return [(i, [f(i, j) for j in range(4)]) for i in range(n)]

    def test_norm_drift_matches_duckdb(self, spark):
        """Per-row L2 norms are an in-order fold — bit-identical across
        engines — so the binned drift table must match DuckDB exactly."""
        from oni_ml_spark.datapipe.drift import embedding_norm_drift

        ref_rows = self._vecs(120, lambda i, j: ((i * 7 + j) % 10) / 10.0)
        cur_rows = self._vecs(90, lambda i, j: 1.3 * ((i * 5 + j) % 10) / 10.0)
        ref = spark.createDataFrame(ref_rows, "id long, v array<double>")
        cur = spark.createDataFrame(cur_rows, "id long, v array<double>")
        edges = [0.8, 1.4, 2.0]
        got = {
            r["bin"]: (r["n_ref"], r["n_cur"], round(r["psi_term"], 9))
            for r in embedding_norm_drift(ref, cur, "v", edges).collect()
        }
        import pandas as pd

        ref_pd = pd.DataFrame(
            [(i, vs) for i, vs in ref_rows], columns=["id", "v"]
        )
        cur_pd = pd.DataFrame(
            [(i, vs) for i, vs in cur_rows], columns=["id", "v"]
        )
        want = duckdb.sql(
            """
            WITH rn AS (SELECT sqrt(list_sum(list_transform(v, x -> x * x))) AS nv FROM ref_pd),
            cn AS (SELECT sqrt(list_sum(list_transform(v, x -> x * x))) AS nv FROM cur_pd),
            rb AS (SELECT CASE WHEN nv IS NULL OR isnan(nv) THEN -1 WHEN nv <= 0.8 THEN 0
                   WHEN nv <= 1.4 THEN 1 WHEN nv <= 2.0 THEN 2 ELSE 3 END AS bin FROM rn),
            cb AS (SELECT CASE WHEN nv IS NULL OR isnan(nv) THEN -1 WHEN nv <= 0.8 THEN 0
                   WHEN nv <= 1.4 THEN 1 WHEN nv <= 2.0 THEN 2 ELSE 3 END AS bin FROM cn),
            r AS (SELECT bin, count(*)::BIGINT AS nr FROM rb GROUP BY bin),
            c AS (SELECT bin, count(*)::BIGINT AS nc FROM cb GROUP BY bin),
            j AS (SELECT coalesce(r.bin, c.bin) AS bin, coalesce(nr, 0) AS nr,
                  coalesce(nc, 0) AS nc FROM r FULL OUTER JOIN c ON r.bin = c.bin),
            t AS (SELECT sum(nr)::DOUBLE AS tr, sum(nc)::DOUBLE AS tc,
                  count(*)::DOUBLE AS nb FROM j)
            SELECT bin, nr, nc,
              round(((nc::DOUBLE + 0.5) / (tc + 0.5 * nb) - (nr::DOUBLE + 0.5) / (tr + 0.5 * nb))
                * ln(((nc::DOUBLE + 0.5) / (tc + 0.5 * nb)) / ((nr::DOUBLE + 0.5) / (tr + 0.5 * nb))), 9)
            FROM j, t
            """
        ).fetchall()
        assert got == {b: (nr, nc, ps) for b, nr, nc, ps in want}

    def test_centroid_shift_quantized_sums_match_duckdb(self, spark):
        """The per-dimension quantized sums are exact BIGINTs on both
        engines; the cosine agrees to 1e-12 and detects a rotation that
        norm drift alone cannot see."""
        from oni_ml_spark.datapipe.drift import centroid_shift

        ref_rows = self._vecs(200, lambda i, j: ((i + j) % 7) / 7.0 + 0.1)
        # sign-flip two of four dims: norms identical, direction rotated
        cur_rows = [
            (i, [x if j < 2 else -x for j, x in enumerate(v)])
            for i, v in self._vecs(200, lambda i, j: ((i + j) % 7) / 7.0 + 0.1)
        ]
        ref = spark.createDataFrame(ref_rows, "id long, v array<double>")
        cur = spark.createDataFrame(cur_rows, "id long, v array<double>")
        row = centroid_shift(ref, cur, "v", dim=4).first()
        assert row["dim"] == 4 and row["n_ref"] == 200 and row["n_cur"] == 200
        assert row["cosine"] < 0.1  # two of four dims flipped -> ~0
        import math

        import pandas as pd

        ref_pd = pd.DataFrame(ref_rows, columns=["id", "v"])
        cur_pd = pd.DataFrame(cur_rows, columns=["id", "v"])
        q = """
        SELECT generate_subscripts(v, 1) AS pos,
               unnest(list_transform(v, x -> floor(x * 1000000)::BIGINT)) AS qx
        FROM {t}
        """
        want = duckdb.sql(
            f"WITH r AS ({q.format(t='ref_pd')}), c AS ({q.format(t='cur_pd')}), "
            "ra AS (SELECT pos, sum(qx)::BIGINT AS s, count(*)::BIGINT AS n FROM r GROUP BY pos), "
            "ca AS (SELECT pos, sum(qx)::BIGINT AS s, count(*)::BIGINT AS n FROM c GROUP BY pos) "
            "SELECT ra.pos, ra.s, ca.s FROM ra JOIN ca USING (pos) ORDER BY pos"
        ).fetchall()
        mr = [s / 200.0 for _, s, _ in want]
        mc = [s2 / 200.0 for _, _, s2 in want]
        dot = sum(a * b for a, b in zip(mr, mc))
        cos = dot / (math.sqrt(sum(a * a for a in mr)) * math.sqrt(sum(b * b for b in mc)))
        assert row["cosine"] == pytest.approx(cos, abs=1e-12)

    def test_centroid_shift_validation(self, spark):
        from oni_ml_spark.datapipe.drift import centroid_shift

        d = spark.createDataFrame(
            [(0, [1.0, 2.0])], "id long, v array<double>"
        )
        with pytest.raises(ValueError, match="dim must be"):
            centroid_shift(d, d, "v", dim=0)
        with pytest.raises(Exception, match="mis-declared"):
            centroid_shift(d, d, "v", dim=3).collect()

    def test_centroid_shift_refuses_garbage_and_ragged(self, spark):
        """Silent-wrong-answer classes raise: NaN/null components, null
        vectors, a corpus uniformly SHORTER than dim (the encoder-change
        incident — previously passed the union-of-positions check and
        returned a cosine computed as if the missing dims were 0), and a
        partially truncated (ragged) corpus."""
        from oni_ml_spark.datapipe.drift import centroid_shift

        ok = spark.createDataFrame(
            [(i, [1.0, 2.0, 3.0]) for i in range(4)], "id long, v array<double>"
        )
        nan_side = spark.createDataFrame(
            [(0, [1.0, float("nan"), 3.0])], "id long, v array<double>"
        )
        with pytest.raises(Exception, match="null/NaN component"):
            centroid_shift(ok, nan_side, "v", dim=3).collect()
        null_vec = spark.createDataFrame(
            [(0, [1.0, 2.0, 3.0]), (1, None)], "id long, v array<double>"
        )
        with pytest.raises(Exception, match="null/NaN component"):
            centroid_shift(ok, null_vec, "v", dim=3).collect()
        short = spark.createDataFrame(
            [(i, [1.0, 2.0]) for i in range(4)], "id long, v array<double>"
        )
        with pytest.raises(Exception, match="mis-declared"):
            centroid_shift(ok, short, "v", dim=3).collect()
        ragged = spark.createDataFrame(
            [(0, [1.0, 2.0, 3.0]), (1, [1.0, 2.0])], "id long, v array<double>"
        )
        with pytest.raises(Exception, match="mis-declared"):
            centroid_shift(ok, ragged, "v", dim=3).collect()
        empty = spark.createDataFrame([], "id long, v array<double>")
        with pytest.raises(Exception, match="mis-declared"):
            centroid_shift(ok, empty, "v", dim=3).collect()

    def test_categorical_no_topk_stays_distributed(self, spark):
        """Without top_k the count table is one row per distinct key, so
        totals must NOT go through a partition-less window (single-task
        funnel at 10^8 keys) — the plan keeps per-key arithmetic
        distributed via broadcast totals."""
        from oni_ml_spark.datapipe.drift import drift_compare_categorical
        from oni_ml_spark.plans.diagnostics import plan_report

        d = spark.range(1000).select((F.col("id") % 50).cast("string").alias("k"))
        rep = plan_report(drift_compare_categorical(d, d, "k"))
        assert rep["nodes"].get("Window", 0) == 0, rep["plan"]
        assert rep["broadcast_exchanges"] >= 1, rep["plan"]


class TestDriftSummaryCategorical:
    def test_mixed_summary(self, spark):
        from oni_ml_spark.datapipe.drift import drift_summary

        ref = spark.range(2000).select(
            (F.col("id") % 50).cast("double").alias("v"),
            (F.col("id") % 3).cast("string").alias("k"),
        )
        cur = spark.range(2000).select(
            ((F.col("id") % 50) + 40).cast("double").alias("v"),
            F.when(F.col("id") % 2 == 0, "99").otherwise(
                (F.col("id") % 3).cast("string")
            ).alias("k"),
        )
        out = {r["column"]: r for r in drift_summary(
            ref, cur, ["v"], categorical_cols=["k"]
        ).collect()}
        assert out["v"]["verdict"] == "action" and out["v"]["mean_ref"] is not None
        assert out["k"]["verdict"] == "action"  # half the rows moved to a new key
        assert out["k"]["mean_ref"] is None  # moments are numeric-only
        with pytest.raises(ValueError, match="at least one"):
            drift_summary(ref, cur, [], categorical_cols=[])


class TestDriftSummarySinglePass:
    """r9: drift_summary rebuilt as ONE unpivoted aggregate per side —
    values must equal the per-column composition it replaced, and the
    count-table plan must scan each corpus exactly once."""

    def _mixed(self, spark):
        ref = spark.range(3000).select(
            (F.col("id") % 50).cast("double").alias("a"),
            F.when(F.col("id") % 17 == 0, None)
            .otherwise((F.col("id") % 7).cast("double")).alias("b"),
            (F.col("id") % 5).cast("string").alias("k"),
        )
        cur = spark.range(2500).select(
            ((F.col("id") % 50) + 12).cast("double").alias("a"),
            F.when(F.col("id") % 5 == 0, None)
            .otherwise(((F.col("id") % 7) * 1.4)).alias("b"),
            F.when(F.col("id") % 3 == 0, "zz")
            .otherwise((F.col("id") % 5).cast("string")).alias("k"),
        )
        return ref, cur

    def test_matches_per_column_composition(self, spark):
        """psi/kl/means/stds/null-rate from the single-pass summary equal
        the old shape: drift_compare / drift_compare_categorical per
        column plus direct per-side moment aggregates."""
        from oni_ml_spark.datapipe.drift import (
            drift_compare,
            drift_compare_categorical,
            drift_summary,
        )

        ref, cur = self._mixed(spark)
        got = {r["column"]: r for r in drift_summary(
            ref, cur, ["a", "b"], n_bins=8, categorical_cols=["k"], top_k=3
        ).collect()}
        for c in ("a", "b"):
            d = drift_compare(ref, cur, c, n_bins=8)
            want = d.agg(F.sum("psi_term").alias("p"), F.sum("kl_term").alias("l")).first()
            assert got[c]["psi"] == pytest.approx(want["p"], rel=1e-9)
            assert got[c]["kl"] == pytest.approx(want["l"], rel=1e-9)
            m = ref.agg(
                F.avg(c).alias("m"), F.stddev_samp(c).alias("s"),
                F.avg(F.col(c).isNull().cast("double")).alias("nr"),
            ).first()
            mc = cur.agg(
                F.avg(c).alias("m"), F.stddev_samp(c).alias("s"),
                F.avg(F.col(c).isNull().cast("double")).alias("nr"),
            ).first()
            assert got[c]["mean_ref"] == pytest.approx(m["m"], rel=1e-9)
            assert got[c]["mean_cur"] == pytest.approx(mc["m"], rel=1e-9)
            assert got[c]["std_ref"] == pytest.approx(m["s"], rel=1e-9)
            assert got[c]["std_cur"] == pytest.approx(mc["s"], rel=1e-9)
            assert got[c]["null_rate_delta"] == pytest.approx(
                mc["nr"] - m["nr"], abs=1e-12
            )
        kw = drift_compare_categorical(ref, cur, "k", top_k=3).agg(
            F.sum("psi_term").alias("p"), F.sum("kl_term").alias("l")
        ).first()
        assert got["k"]["psi"] == pytest.approx(kw["p"], rel=1e-9)
        assert got["k"]["kl"] == pytest.approx(kw["l"], rel=1e-9)
        assert got["k"]["mean_ref"] is None and got["k"]["null_rate_delta"] is None

    def test_plan_two_scans_for_mixed_summary(self, spark):
        """The r8 verdict's done-criterion: a 3-numeric + 1-categorical
        summary's count table reads each corpus ONCE (the old composition
        planned 10 scans)."""
        from oni_ml_spark.datapipe.drift import _summary_table
        from oni_ml_spark.plans.diagnostics import plan_report

        e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        ref = e.filter((F.col("user_id") % 2) == 0)
        cur = e.filter((F.col("user_id") % 2) == 1)
        edges = {
            "value": [5.0, 35.0],
            "event_id": [1000.0, 5000.0],
            "user_id": [50.0, 200.0],
        }
        t = _summary_table(
            ref, cur, ["value", "event_id", "user_id"], ["event_type"],
            edges, ["__null", "__other"],
        )
        rep = plan_report(t)
        assert rep["scans"] == 2, rep["plan"]

    def test_nan_is_missing_consistently(self, spark):
        """ADVICE r8: a feed drifting to NaN must move null_rate_delta
        (not only the PSI missing bin), and NaN must not poison the
        means — both now follow the bin -1 convention."""
        from oni_ml_spark.datapipe.drift import drift_summary

        ref = spark.createDataFrame([(float(i % 10),) for i in range(100)], "v double")
        cur = spark.createDataFrame(
            [(float(i % 10),) for i in range(75)] + [(float("nan"),)] * 25,
            "v double",
        )
        row = drift_summary(ref, cur, ["v"], edges={"v": [3.0, 6.0]}).first()
        assert row["null_rate_delta"] == pytest.approx(0.25)
        # NaN excluded, not NaN: mean of i%10 over range(75) = 325/75
        assert row["mean_cur"] == pytest.approx(325.0 / 75.0)
        assert row["std_cur"] is not None and not math.isnan(row["std_cur"])

    def test_frozen_edges_and_validation(self, spark):
        from oni_ml_spark.datapipe.drift import drift_compare, drift_summary

        ref, cur = self._mixed(spark)
        frozen = {"a": [10.0, 25.0, 40.0], "b": [2.0, 4.0]}
        got = {r["column"]: r for r in drift_summary(
            ref, cur, ["a", "b"], edges=frozen
        ).collect()}
        for c in ("a", "b"):
            want = drift_compare(ref, cur, c, edges=frozen[c]).agg(
                F.sum("psi_term").alias("p")
            ).first()["p"]
            assert got[c]["psi"] == pytest.approx(want, rel=1e-9)
        with pytest.raises(ValueError, match="edges missing"):
            drift_summary(ref, cur, ["a", "b"], edges={"a": [1.0]})
        with pytest.raises(ValueError, match="both numeric and categorical"):
            drift_summary(ref, cur, ["a"], categorical_cols=["a"])
        with pytest.raises(ValueError, match="ascending"):
            drift_summary(ref, cur, ["a"], edges={"a": [5.0, 1.0]})
        # sentinel collision still enforced through the summary path
        dirty = cur.withColumn("k", F.lit("__null"))
        with pytest.raises(Exception, match="reserved sentinel"):
            drift_summary(ref, dirty, ["a"], categorical_cols=["k"])

    def test_all_null_column_and_empty_sides(self, spark):
        from oni_ml_spark.datapipe.drift import drift_summary

        ref = spark.createDataFrame([(1.0,), (2.0,)], "v double")
        no_rows = spark.createDataFrame([], "v double")
        with pytest.raises(ValueError, match="cur side has no rows"):
            drift_summary(ref, no_rows, ["v"])
        # default edges: the quantile pre-pass names the failure first
        with pytest.raises(ValueError, match="no non-null values to bin"):
            drift_summary(no_rows, ref, ["v"])
        # frozen edges skip the pre-pass; the count-table guard fires
        with pytest.raises(ValueError, match="ref side has no rows"):
            drift_summary(no_rows, ref, ["v"], edges={"v": [1.5]})
        # all-null cur column: moments null, missing-bin PSI still fires
        all_null = spark.createDataFrame([(None,)] * 10, "v double")
        row = drift_summary(ref, all_null, ["v"], edges={"v": [1.5]}).first()
        assert row["mean_cur"] is None and row["std_cur"] is None
        assert row["null_rate_delta"] == pytest.approx(1.0)
        assert row["psi"] > 0.25 and row["verdict"] == "action"

    def test_uncoarsened_categorical_summary_matches(self, spark):
        """top_k=None (provably small dictionary): no checkpoint is
        pinned (nothing bounds the key table in general) and the psi/kl
        must still equal drift_compare_categorical's uncoarsened path."""
        from oni_ml_spark.datapipe.drift import (
            drift_compare_categorical,
            drift_summary,
        )

        ref, cur = self._mixed(spark)
        got = {r["column"]: r for r in drift_summary(
            ref, cur, ["a"], categorical_cols=["k"], top_k=None
        ).collect()}
        want = drift_compare_categorical(ref, cur, "k").agg(
            F.sum("psi_term").alias("p"), F.sum("kl_term").alias("l")
        ).first()
        assert got["k"]["psi"] == pytest.approx(want["p"], rel=1e-9)
        assert got["k"]["kl"] == pytest.approx(want["l"], rel=1e-9)
