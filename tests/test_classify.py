"""Hashed-feature linear quality classifier (datapipe.classify): portable
exact inference (DuckDB restatement), planted-signal training roundtrip,
guards, plan shape."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from oni_ml_spark.datapipe.classify import (
    MICRO,
    feature_terms,
    hashed_linear_score,
    quality_flags,
    train_hashed_linear,
)
from tests.conftest import SF_DIR

N_BUCKETS = 4096


def _gen_weights(spark):
    # even buckets weighted, odd absent — the missing-bucket → 0 path;
    # the DuckDB restatement of this table is inline in
    # test_score_matches_duckdb
    from oni_ml_spark.datapipe.classify import demo_weights

    return demo_weights(spark, N_BUCKETS, step=2)


class TestExactInference:
    def test_score_matches_duckdb(self, spark):
        """score_micro is an exact BIGINT — identical in DuckDB restating
        tokenize → md5-bucket → even-bucket weight → sum, doc for doc."""
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        w = _gen_weights(spark)
        got = {
            r["id"]: (r["n_features"], r["score_micro"])
            for r in hashed_linear_score(
                docs, "doc_id", "text", w, N_BUCKETS, bias_micro=250_000
            ).collect()
        }
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
        )
        want = con.execute(
            "WITH tf AS (SELECT doc_id AS id, unnest(list_filter(string_split("
            "  trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '), "
            "  t -> t != '')) AS term FROM documents), "
            "tb AS (SELECT id, ('0x' || substr(md5('0:' || term), 1, 8))::BIGINT "
            "  % 4096 AS b FROM tf), "
            "ts AS (SELECT id, count(*) AS nf, sum(CASE WHEN b % 2 = 0 THEN "
            "  (('0x' || substr(md5('w:' || b::VARCHAR), 1, 8))::BIGINT % 2001)"
            "  - 1000 ELSE 0 END)::BIGINT AS sm FROM tb GROUP BY id) "
            "SELECT d.doc_id AS id, coalesce(ts.nf, 0) AS nf, "
            "  250000 + coalesce(ts.sm, 0) AS sm "
            "FROM documents d LEFT JOIN ts ON d.doc_id = ts.id"
        ).fetchall()
        con.close()
        assert len(want) == len(got)
        for doc_id, nf, sm in want:
            assert got[doc_id] == (nf, sm), f"doc {doc_id}"

    def test_empty_doc_scores_bias(self, spark):
        docs = spark.createDataFrame(
            [(1, ""), (2, "   "), (3, "one word")], "doc_id bigint, text string"
        )
        w = _gen_weights(spark)
        rows = {
            r["id"]: r
            for r in hashed_linear_score(
                docs, "doc_id", "text", w, N_BUCKETS, bias_micro=42
            ).collect()
        }
        assert rows[1]["n_features"] == 0 and rows[1]["score_micro"] == 42
        assert rows[2]["n_features"] == 0 and rows[2]["score_micro"] == 42
        assert rows[3]["n_features"] == 2

    def test_mean_mode_divides_by_features(self, spark):
        docs = spark.createDataFrame(
            [(1, "alpha beta"), (2, "")], "doc_id bigint, text string"
        )
        w = _gen_weights(spark)
        s = {
            r["id"]: r
            for r in hashed_linear_score(
                docs, "doc_id", "text", w, N_BUCKETS, bias_micro=100, mode="mean"
            ).collect()
        }
        assert s[1]["score"] == pytest.approx(s[1]["score_micro"] / MICRO / 2)
        # zero-feature docs keep the (un-divided) bias
        assert s[2]["score"] == pytest.approx(100 / MICRO)

    def test_multiplicity_counts(self, spark):
        """Repeated tokens contribute once per occurrence (bag semantics)."""
        docs = spark.createDataFrame(
            [(1, "spam"), (2, "spam spam spam")], "doc_id bigint, text string"
        )
        w = _gen_weights(spark)
        s = {
            r["id"]: r["score_micro"]
            for r in hashed_linear_score(docs, "doc_id", "text", w, N_BUCKETS).collect()
        }
        assert s[2] == 3 * s[1]

    def test_bigram_features(self, spark):
        docs = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
        terms = docs.select(
            feature_terms("text", bigrams=True).alias("t")
        ).first()["t"]
        assert terms == ["a", "b", "c", "a b", "b c"]


class TestGuards:
    def test_duplicate_bucket_rejected(self, spark):
        docs = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
        w = spark.createDataFrame(
            [(3, 10), (3, 20)], "bucket bigint, w_micro bigint"
        )
        with pytest.raises(ValueError, match="duplicate bucket"):
            hashed_linear_score(docs, "doc_id", "text", w, N_BUCKETS)

    def test_out_of_range_bucket_rejected(self, spark):
        docs = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
        w = spark.createDataFrame([(4096, 10)], "bucket bigint, w_micro bigint")
        with pytest.raises(ValueError, match="outside"):
            hashed_linear_score(docs, "doc_id", "text", w, N_BUCKETS)

    def test_empty_weights_rejected(self, spark):
        docs = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
        w = spark.createDataFrame([], "bucket bigint, w_micro bigint")
        with pytest.raises(ValueError, match="empty"):
            hashed_linear_score(docs, "doc_id", "text", w, N_BUCKETS)

    def test_bad_mode_rejected(self, spark):
        docs = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
        w = spark.createDataFrame([(0, 1)], "bucket bigint, w_micro bigint")
        with pytest.raises(ValueError, match="mode"):
            hashed_linear_score(docs, "doc_id", "text", w, N_BUCKETS, mode="max")


class TestTraining:
    def test_planted_signal_roundtrip(self, spark):
        """Train on a corpus where 'zzspam' marks the positive class; the
        frozen model's own inference separates it perfectly."""
        rows = []
        fillers = ["quiet", "river", "stone", "lamp", "novel", "garden"]
        for i in range(80):
            base = " ".join(fillers[(i + j) % len(fillers)] for j in range(6))
            if i % 2 == 0:
                rows.append((i, base + " zzspam offer", 1))
            else:
                rows.append((i, base, 0))
        df = spark.createDataFrame(rows, "doc_id bigint, text string, label int")
        w, bias = train_hashed_linear(df, "doc_id", "text", "label", 512)
        scored = quality_flags(
            hashed_linear_score(df, "doc_id", "text", w, 512, bias_micro=bias),
            0.0,
        )
        got = {r["id"]: r["passes"] for r in scored.collect()}
        for i in range(80):
            assert got[i] == (i % 2 == 0), f"doc {i}"

    def test_zero_model_scores_bias(self, spark):
        """Hard L1 drives every coefficient to zero; the trainer returns
        one explicit zero-weight row (not an empty frame) and the scorer
        gives every doc the bias."""
        df = spark.createDataFrame(
            [(1, "aa bb", 1), (2, "cc dd", 0)] * 4,
            "doc_id bigint, text string, label int",
        )
        w, bias = train_hashed_linear(
            df, "doc_id", "text", "label", 64, reg_param=10.0, elastic_net=1.0
        )
        assert w.count() == 1
        scores = {
            r["id"]: r["score_micro"]
            for r in hashed_linear_score(
                df, "doc_id", "text", w, 64, bias_micro=bias
            ).collect()
        }
        assert set(scores.values()) == {bias}

    def test_trained_weights_schema(self, spark):
        df = spark.createDataFrame(
            [(1, "aa bb", 1), (2, "cc dd", 0)] * 4,
            "doc_id bigint, text string, label int",
        )
        w, bias = train_hashed_linear(df, "doc_id", "text", "label", 64, max_iter=10)
        assert w.columns == ["bucket", "w_micro"]
        assert isinstance(bias, int)
        b = w.agg(F.min("bucket"), F.max("bucket")).first()
        assert b[0] >= 0 and b[1] < 64


class TestBinaryAUC:
    def _auc(self, spark, rows, **kw):
        from oni_ml_spark.datapipe.classify import binary_auc

        df = spark.createDataFrame(rows, "label int, score double")
        return binary_auc(df, "label", "score", **kw).first()

    def test_hand_computed_with_ties(self, spark):
        # pos {3, 2}, neg {1, 2}: pairs 3>1, 3>2, 2>1 win; 2=2 half
        r = self._auc(spark, [(1, 3.0), (1, 2.0), (0, 1.0), (0, 2.0)])
        assert r["auc"] == pytest.approx(3.5 / 4)
        assert (r["n_pos"], r["n_neg"], r["n_scores"]) == (2, 2, 3)

    def test_perfect_and_inverted(self, spark):
        perfect = [(1, float(10 + i)) for i in range(5)] + [
            (0, float(i)) for i in range(5)
        ]
        assert self._auc(spark, perfect)["auc"] == 1.0
        inverted = [(1, float(i)) for i in range(5)] + [
            (0, float(10 + i)) for i in range(5)
        ]
        assert self._auc(spark, inverted)["auc"] == 0.0

    def test_matches_brute_force_pairs(self, spark):
        import random

        rng = random.Random(13)
        rows = [
            (rng.randint(0, 1), float(rng.randint(0, 40)) / 4) for _ in range(300)
        ]
        pos = [s for l, s in rows if l == 1]
        neg = [s for l, s in rows if l == 0]
        want = sum(
            1.0 if p > n else (0.5 if p == n else 0.0) for p in pos for n in neg
        ) / (len(pos) * len(neg))
        got = self._auc(spark, rows)
        assert got["auc"] == pytest.approx(want, abs=1e-12)

    def test_bucketed_equals_single_bucket(self, spark):
        import random

        rng = random.Random(7)
        rows = [(rng.randint(0, 1), rng.gauss(0, 1)) for _ in range(500)]
        a = self._auc(spark, rows)["auc"]
        b = self._auc(spark, rows, num_buckets=1)["auc"]
        assert a == b  # exact arithmetic — not just approx

    def test_degenerate_single_class_is_null(self, spark):
        assert self._auc(spark, [(1, 1.0), (1, 2.0)])["auc"] is None

    def test_null_scores_excluded(self, spark):
        r = self._auc(spark, [(1, 3.0), (1, None), (0, 1.0)])
        assert r["n_pos"] == 1 and r["auc"] == 1.0

    def test_bad_label_raises_in_plan(self, spark):
        with pytest.raises(Exception, match="must be 0/1"):
            self._auc(spark, [(2, 1.0), (0, 2.0)])

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=1),
                st.integers(min_value=-8, max_value=8),  # coarse → many ties
            ),
            min_size=2,
            max_size=40,
        )
    )
    def test_property_matches_brute_force(self, spark, pairs):
        """Any label/score multiset (heavy ties by construction): the
        distributed AUC equals the O(n²) pairwise definition, or is NULL
        exactly when a class is absent."""
        from oni_ml_spark.datapipe.classify import binary_auc

        rows = [(l, float(s)) for l, s in pairs]
        got = binary_auc(
            spark.createDataFrame(rows, "label int, score double"),
            "label", "score", num_buckets=3,
        ).first()["auc"]
        pos = [s for l, s in rows if l == 1]
        neg = [s for l, s in rows if l == 0]
        if not pos or not neg:
            assert got is None
        else:
            want = sum(
                1.0 if p > n else (0.5 if p == n else 0.0)
                for p in pos for n in neg
            ) / (len(pos) * len(neg))
            assert got == pytest.approx(want, abs=1e-12)

    def test_matches_duckdb_on_model_scores(self, spark):
        """Full-pipeline exactness: demo-model scores over the parquet
        corpus, label = doc_id parity, AUC identical to DuckDB restating
        count-table + strictly-below + half-ties."""
        from oni_ml_spark.datapipe.classify import binary_auc

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        scored = hashed_linear_score(
            docs, "doc_id", "text", _gen_weights(spark), N_BUCKETS
        ).withColumn("label", (F.col("id") % 2).cast("int"))
        got = binary_auc(scored, "label", "score_micro").first()

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
        )
        want = con.execute(
            "WITH tf AS (SELECT doc_id AS id, unnest(list_filter(string_split("
            "  trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '), "
            "  t -> t != '')) AS term FROM documents), "
            "tb AS (SELECT id, ('0x' || substr(md5('0:' || term), 1, 8))::BIGINT "
            "  % 4096 AS b FROM tf), "
            "ts AS (SELECT id, sum(CASE WHEN b % 2 = 0 THEN "
            "  (('0x' || substr(md5('w:' || b::VARCHAR), 1, 8))::BIGINT % 2001)"
            "  - 1000 ELSE 0 END)::BIGINT AS sm FROM tb GROUP BY id), "
            "lms AS (SELECT d.doc_id % 2 AS y, coalesce(t.sm, 0)::DOUBLE AS s "
            "  FROM documents d LEFT JOIN ts t ON d.doc_id = t.id), "
            "c AS (SELECT s, sum(y)::BIGINT AS np, sum(1 - y)::BIGINT AS nn "
            "  FROM lms GROUP BY s), "
            "r AS (SELECT np, nn, sum(nn) OVER (ORDER BY s) - nn AS below FROM c) "
            "SELECT sum(np * (below + nn / 2.0)) / "
            "  ((SELECT sum(np) FROM c) * (SELECT sum(nn) FROM c)) FROM r"
        ).fetchone()[0]
        con.close()
        assert got["auc"] == want


class TestMulticlassArgmax:
    def _hand_model(self, spark):
        from oni_ml_spark.datapipe.classify import feature_bucket

        b = spark.createDataFrame(
            [("the",), ("el",)], "t string"
        ).select("t", feature_bucket(F.col("t"), 4096).alias("b")).collect()
        buckets = {r["t"]: r["b"] for r in b}
        w = spark.createDataFrame(
            [(buckets["the"], "en", 500_000), (buckets["el"], "es", 500_000)],
            "bucket bigint, cls string, w_micro bigint",
        )
        return w

    def test_hand_model_routes_and_ties(self, spark):
        from oni_ml_spark.datapipe.classify import hashed_linear_argmax

        docs = spark.createDataFrame(
            [(1, "the cat sat"), (2, "el gato corre"), (3, "")],
            "doc_id bigint, text string",
        )
        w = self._hand_model(spark)
        got = {
            r["id"]: (r["label"], r["score_micro"])
            for r in hashed_linear_argmax(
                docs, "doc_id", "text", w, 4096, ["en", "es"]
            ).collect()
        }
        assert got[1] == ("en", 500_000)
        assert got[2] == ("es", 500_000)
        assert got[3] == ("en", 0)  # featureless: tie breaks to smallest class

    def test_bias_decides_featureless_docs(self, spark):
        from oni_ml_spark.datapipe.classify import hashed_linear_argmax

        docs = spark.createDataFrame([(3, "")], "doc_id bigint, text string")
        got = hashed_linear_argmax(
            docs, "doc_id", "text", self._hand_model(spark), 4096,
            ["en", "es"], biases={"es": 7},
        ).first()
        assert got["label"] == "es" and got["score_micro"] == 7

    def test_guards(self, spark):
        from oni_ml_spark.datapipe.classify import hashed_linear_argmax

        docs = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
        w = self._hand_model(spark)
        with pytest.raises(ValueError, match="non-empty"):
            hashed_linear_argmax(docs, "doc_id", "text", w, 4096, [])
        with pytest.raises(ValueError, match="duplicate"):
            hashed_linear_argmax(docs, "doc_id", "text", w, 4096, ["en", "en"])
        with pytest.raises(ValueError, match="unknown classes"):
            hashed_linear_argmax(
                docs, "doc_id", "text", w, 4096, ["en"], biases={"zz": 1}
            )

    def test_duplicate_weight_pair_rejected(self, spark):
        """Same (bucket, cls) twice would double-count — refused like the
        binary scorer's duplicate-bucket guard; the same bucket under two
        DIFFERENT classes is a legal model."""
        from oni_ml_spark.datapipe.classify import hashed_linear_argmax

        docs = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
        dup = spark.createDataFrame(
            [(3, "en", 10), (3, "en", 20)], "bucket bigint, cls string, w_micro bigint"
        )
        with pytest.raises(ValueError, match="duplicate bucket/cls"):
            hashed_linear_argmax(docs, "doc_id", "text", dup, 4096, ["en", "es"])
        ok = spark.createDataFrame(
            [(3, "en", 10), (3, "es", 20)], "bucket bigint, cls string, w_micro bigint"
        )
        hashed_linear_argmax(docs, "doc_id", "text", ok, 4096, ["en", "es"]).collect()

    def test_null_label_sample_rejected(self, spark):
        from oni_ml_spark.datapipe.classify import train_hashed_linear_multiclass

        df = spark.createDataFrame(
            [(1, "x", "en"), (2, "y", "es"), (3, "z", None)],
            "doc_id bigint, text string, lang string",
        )
        with pytest.raises(ValueError, match="NULL labels"):
            train_hashed_linear_multiclass(df, "doc_id", "text", "lang", 64)

    def test_matches_duckdb_argmax(self, spark):
        """Corpus-scale cross-engine check: md5-derived (bucket, class)
        weights, argmax restated in DuckDB with the same tie-break."""
        from oni_ml_spark.datapipe.classify import hashed_linear_argmax

        classes = ["de", "en", "es"]
        w = (
            spark.range(0, 4096, 2)
            .crossJoin(spark.createDataFrame([(c,) for c in classes], "cls string"))
            .select(
                F.col("id").alias("bucket"),
                "cls",
                (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.col("cls"), F.lit(":"),
                                    F.col("id").cast("string"),
                                )
                            ),
                            1, 8,
                        ),
                        16, 10,
                    ).cast("long")
                    % 2001
                    - 1000
                ).alias("w_micro"),
            )
        )
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        got = {
            r["id"]: (r["label"], r["score_micro"])
            for r in hashed_linear_argmax(
                docs, "doc_id", "text", w, 4096, classes
            ).collect()
        }
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
        )
        want = con.execute(
            "WITH tf AS (SELECT doc_id AS id, unnest(list_filter(string_split("
            "  trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '), "
            "  t -> t != '')) AS term FROM documents), "
            "tb AS (SELECT id, ('0x' || substr(md5('0:' || term), 1, 8))::BIGINT "
            "  % 4096 AS b FROM tf), "
            "cl AS (SELECT unnest(['de', 'en', 'es']) AS cls), "
            "s AS (SELECT id, cls, sum(CASE WHEN b % 2 = 0 THEN "
            "  (('0x' || substr(md5(cls || ':' || b::VARCHAR), 1, 8))::BIGINT "
            "   % 2001) - 1000 ELSE 0 END)::BIGINT AS sc "
            "  FROM tb, cl GROUP BY id, cls), "
            "full_s AS (SELECT d.doc_id AS id, cl.cls, coalesce(s.sc, 0) AS sc "
            "  FROM documents d CROSS JOIN cl "
            "  LEFT JOIN s ON s.id = d.doc_id AND s.cls = cl.cls), "
            "r AS (SELECT id, cls, sc, row_number() OVER "
            "  (PARTITION BY id ORDER BY sc DESC, cls) AS rn FROM full_s) "
            "SELECT id, cls, sc FROM r WHERE rn = 1"
        ).fetchall()
        con.close()
        assert len(want) == len(got)
        for doc_id, cls, sc in want:
            assert got[doc_id] == (cls, sc), f"doc {doc_id}"


class TestMulticlassTraining:
    def test_planted_language_routing(self, spark):
        """Three planted 'languages' with disjoint marker vocab: the
        trained multinomial model, frozen and run through
        hashed_linear_argmax, routes every training doc correctly."""
        from oni_ml_spark.datapipe.classify import (
            hashed_linear_argmax,
            train_hashed_linear_multiclass,
        )

        vocab = {
            "aa": ["aqua", "arbor", "amber", "atlas"],
            "bb": ["birch", "basil", "brook", "bloom"],
            "cc": ["cedar", "coral", "cliff", "cloud"],
        }
        rows = []
        for i in range(120):
            lang = ["aa", "bb", "cc"][i % 3]
            words = [vocab[lang][(i + j) % 4] for j in range(6)]
            rows.append((i, " ".join(words), lang))
        df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
        w, biases, classes = train_hashed_linear_multiclass(
            df, "doc_id", "text", "lang", 512, max_iter=40
        )
        assert classes == ["aa", "bb", "cc"]
        assert set(biases) == {"aa", "bb", "cc"}
        got = {
            r["id"]: r["label"]
            for r in hashed_linear_argmax(
                df, "doc_id", "text", w, 512, classes, biases=biases
            ).collect()
        }
        for i in range(120):
            assert got[i] == ["aa", "bb", "cc"][i % 3], f"doc {i}"

    def test_single_class_rejected(self, spark):
        from oni_ml_spark.datapipe.classify import train_hashed_linear_multiclass

        df = spark.createDataFrame(
            [(1, "x", "only"), (2, "y", "only")],
            "doc_id bigint, text string, lang string",
        )
        with pytest.raises(ValueError, match=">= 2 classes"):
            train_hashed_linear_multiclass(df, "doc_id", "text", "lang", 64)


class TestGroupedAUC:
    def test_matches_per_group_brute_force(self, spark):
        import random

        from oni_ml_spark.datapipe.classify import binary_auc_grouped

        rng = random.Random(29)
        rows = [
            (["a", "b", None][rng.randint(0, 2)], rng.randint(0, 1),
             float(rng.randint(0, 20)) / 2)
            for _ in range(400)
        ]
        df = spark.createDataFrame(rows, "g string, label int, score double")
        got = {
            r["group"]: r["auc"]
            for r in binary_auc_grouped(df, "g", "label", "score").collect()
        }
        for g in ("a", "b", None):
            pos = [s for gg, l, s in rows if gg == g and l == 1]
            neg = [s for gg, l, s in rows if gg == g and l == 0]
            want = sum(
                1.0 if p > n else (0.5 if p == n else 0.0)
                for p in pos for n in neg
            ) / (len(pos) * len(neg))
            assert got[g] == pytest.approx(want, abs=1e-12), f"group {g}"

    def test_single_class_group_null(self, spark):
        from oni_ml_spark.datapipe.classify import binary_auc_grouped

        df = spark.createDataFrame(
            [("a", 1, 1.0), ("a", 0, 0.0), ("b", 1, 1.0), ("b", 1, 2.0)],
            "g string, label int, score double",
        )
        got = {r["group"]: r["auc"] for r in binary_auc_grouped(df, "g", "label", "score").collect()}
        assert got["a"] == 1.0 and got["b"] is None


class TestThresholdReport:
    def test_hand_counts(self, spark):
        from oni_ml_spark.datapipe.classify import threshold_report

        df = spark.createDataFrame(
            [(1, 0.9), (1, 0.4), (0, 0.6), (0, 0.1), (1, None)],
            "label int, score double",
        )
        rep = {
            r["threshold"]: r.asDict()
            for r in threshold_report(df, "label", "score", [0.5, 0.95]).collect()
        }
        r5 = rep[0.5]
        # score>=0.5: pos {0.9}, neg {0.6}; below: pos {0.4, None}, neg {0.1}
        assert (r5["tp"], r5["fp"], r5["fn"], r5["tn"]) == (1, 1, 2, 1)
        assert r5["precision"] == 0.5 and r5["recall"] == pytest.approx(1 / 3)
        r95 = rep[0.95]
        assert (r95["tp"], r95["fp"]) == (0, 0) and r95["precision"] is None

    def test_bad_label_raises_not_dropped(self, spark):
        """Labels outside 0/1 (incl. NULL) raise in-plan — the
        binary_auc contract — instead of silently falling out of all four
        confusion counts."""
        from oni_ml_spark.datapipe.classify import threshold_report

        df = spark.createDataFrame(
            [(1, 0.9), (2, 0.4)], "label int, score double"
        )
        with pytest.raises(Exception, match="must be 0/1"):
            threshold_report(df, "label", "score", [0.5]).collect()
        dfn = spark.createDataFrame(
            [(1, 0.9), (None, 0.4)], "label int, score double"
        )
        with pytest.raises(Exception, match="must be 0/1"):
            threshold_report(dfn, "label", "score", [0.5]).collect()

    def test_empty_thresholds_rejected(self, spark):
        from oni_ml_spark.datapipe.classify import threshold_report

        df = spark.createDataFrame([(1, 1.0)], "label int, score double")
        with pytest.raises(ValueError, match="non-empty"):
            threshold_report(df, "label", "score", [])

    def test_one_scan_one_aggregate(self, spark):
        from oni_ml_spark.datapipe.classify import threshold_report

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            (F.col("doc_id") % 2).cast("int").alias("label"),
            F.col("n_chars").cast("double").alias("score"),
        )
        plan = (
            threshold_report(docs, "label", "score", [100.0, 200.0, 300.0])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("documents.parquet") == 1


class TestPlanShape:
    def test_single_scan_broadcast_join(self, spark):
        """Inference is one corpus scan, a broadcast join, and one
        aggregate — no sort-merge join, no second scan of documents."""
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        w = _gen_weights(spark)
        plan = (
            hashed_linear_score(docs, "doc_id", "text", w, N_BUCKETS)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        assert plan.count("documents.parquet") == 1


class TestRound10Hardening:
    def test_nonfinite_thresholds_rejected(self, spark):
        """(r10) inf/nan thresholds would interpolate into stack() as
        'infD'/'nanD' and die with an opaque parse error — refused up
        front with the offender named."""
        from oni_ml_spark.datapipe.classify import threshold_report

        df = spark.createDataFrame([(1, 1.0)], "label int, score double")
        for bad in (float("inf"), float("-inf"), float("nan")):
            with pytest.raises(ValueError, match="finite"):
                threshold_report(df, "label", "score", [0.5, bad])

    def test_multiclass_label_cardinality_guard(self, spark):
        """(r10) a raw high-cardinality column passed as the routing label
        must be refused, and the distinct-labels collect is bounded by
        limit(max_classes + 1) so the refusal itself never transfers an
        unbounded row set to the driver."""
        from oni_ml_spark.datapipe.classify import train_hashed_linear_multiclass

        df = spark.range(5000).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("text "), F.col("id")).alias("text"),
            F.col("id").cast("string").alias("lang"),  # 5000 "classes"
        )
        with pytest.raises(ValueError, match="max_classes"):
            train_hashed_linear_multiclass(df, "doc_id", "text", "lang", 64)
        small = spark.createDataFrame(
            [(i, f"doc {i}", f"c{i % 3}") for i in range(30)],
            "doc_id bigint, text string, lang string",
        )
        with pytest.raises(ValueError, match="max_classes"):
            train_hashed_linear_multiclass(
                small, "doc_id", "text", "lang", 64, max_classes=2
            )
        with pytest.raises(ValueError, match="max_classes must be"):
            train_hashed_linear_multiclass(
                small, "doc_id", "text", "lang", 64, max_classes=1
            )

    def test_auc_decimal_exact_accumulation(self, spark):
        """(r10) the AUC contribution sum is DECIMAL(38,0) — exact and
        order-independent past the 2^53 double boundary (ADVICE r9).
        Checked structurally (the aggregate's sum input is decimal) and
        behaviorally (tie-heavy parity is covered by the property test)."""
        from oni_ml_spark.datapipe.classify import binary_auc, binary_auc_grouped

        df = spark.createDataFrame(
            [(i % 2, float(i % 7)) for i in range(200)], "label int, score double"
        )
        out = binary_auc(df, "label", "score")
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "decimal(38,0)" in plan
        row = out.first()
        assert row["n_pos"] == 100 and row["n_neg"] == 100
        assert row["auc"] is not None and 0.0 <= row["auc"] <= 1.0

        g = binary_auc_grouped(
            df.withColumn("g", F.lit("a")), "g", "label", "score"
        )
        gplan = g._jdf.queryExecution().optimizedPlan().toString()
        assert "decimal(38,0)" in gplan
        assert abs(g.first()["auc"] - row["auc"]) < 1e-15


class TestThresholdReportProperty:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=1),
                st.one_of(
                    st.integers(min_value=-5, max_value=5).map(float),
                    st.none(),  # NULL scores: predicted-negative contract
                ),
            ),
            min_size=1,
            max_size=30,
        ),
        st.lists(
            st.integers(min_value=-6, max_value=6).map(float),
            min_size=1, max_size=4, unique=True,
        ),
    )
    def test_property_confusion_counts(self, spark, rows, thresholds):
        """(r10) any label/score multiset incl. NULL scores, any threshold
        set: tp+fn == positives and fp+tn == negatives at EVERY threshold
        (nothing vanishes from the counts), tp is monotone non-increasing
        in the threshold, and each cell equals the brute-force count."""
        from oni_ml_spark.datapipe.classify import threshold_report

        df = spark.createDataFrame(rows, "label int, score double")
        rep = {
            r["threshold"]: (r["tp"], r["fp"], r["fn"], r["tn"])
            for r in threshold_report(df, "label", "score", thresholds).collect()
        }
        P = sum(1 for l, _ in rows if l == 1)
        N = len(rows) - P
        for t in thresholds:
            tp, fp, fn, tn = rep[t]
            assert tp + fn == P and fp + tn == N
            want_tp = sum(1 for l, s in rows if l == 1 and s is not None and s >= t)
            want_fp = sum(1 for l, s in rows if l == 0 and s is not None and s >= t)
            assert (tp, fp) == (want_tp, want_fp)
        by_t = sorted(rep)
        tps = [rep[t][0] for t in by_t]
        assert tps == sorted(tps, reverse=True)  # monotone in threshold
