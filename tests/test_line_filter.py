"""C4-style line filtering (textstats.line_filter): rule semantics, order
preservation, all-dropped documents, configurability, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oni_ml_spark.datapipe.textstats import line_filter


def _run(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    return line_filter(df, "doc_id", "text", **kw).first()


class TestLineFilter:
    def test_c4_rules(self, spark):
        text = "\n".join(
            [
                "This line is long enough and ends well.",   # kept
                "Too short.",                                 # < 3 words
                "this one mentions javascript somewhere.",    # blacklisted
                "no terminal punctuation on this line",       # no . ! ? "
                'A quoted ending counts as terminal too."',   # kept
                "Our lorem ipsum filler paragraph ends here.",  # blacklisted
            ]
        )
        r = _run(spark, text)
        assert r["n_lines"] == 6 and r["n_kept"] == 2
        assert r["text"].split("\n") == [
            "This line is long enough and ends well.",
            'A quoted ending counts as terminal too."',
        ]

    def test_order_preserved(self, spark):
        text = "Line one is fine and ends here.\nLine two is fine and ends here too."
        r = _run(spark, text)
        assert r["text"].startswith("Line one") and r["n_kept"] == 2

    def test_all_dropped_yields_empty_text(self, spark):
        r = _run(spark, "nope\nstill nope")
        assert r["n_kept"] == 0 and r["text"] == ""

    def test_config_knobs(self, spark):
        text = "two words.\nthis has no punctuation but enough words"
        strict = _run(spark, text)
        assert strict["n_kept"] == 0
        loose = _run(
            spark, text, min_words=2, require_terminal_punct=False, blacklist=()
        )
        assert loose["n_kept"] == 2

    def test_max_line_chars(self, spark):
        long_line = "word " * 500 + "end."
        r = _run(spark, long_line, max_line_chars=100)
        assert r["n_kept"] == 0

    def test_dedup_lines_keeps_first_occurrence(self, spark):
        text = "\n".join(
            [
                "A navigation menu repeated on every page.",
                "Unique body content goes right here.",
                "A navigation menu repeated on every page.",
            ]
        )
        r = _run(spark, text, dedup_lines=True)
        assert r["n_kept"] == 2
        assert r["text"].split("\n") == [
            "A navigation menu repeated on every page.",
            "Unique body content goes right here.",
        ]
        # without the flag, repeats survive
        assert _run(spark, text)["n_kept"] == 3

    def test_no_explode_no_shuffle(self, spark):
        df = spark.createDataFrame(
            [(i, "A line that ends well.") for i in range(10)],
            "doc_id bigint, text string",
        )
        plan = (
            line_filter(df, "doc_id", "text")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan and "Generate" not in plan


class TestUnicodeNormalize:
    """(r10) unicode_normalize_col — the pre-dedup normalization pass (the
    text stack's Arrow-path pandas_udf primitive)."""

    def test_forms_nulls_and_dedup_motivation(self, spark):
        import unicodedata

        from oni_ml_spark.datapipe.textstats import unicode_normalize_col

        composed = "Caf\u00e9"                  # precomposed é
        decomposed = "Cafe\u0301"               # e + combining acute
        fullwidth = "\uff21\uff22\uff23 \uff15"      # ＡＢＣ 5
        df = spark.createDataFrame(
            [(1, composed), (2, decomposed), (3, fullwidth), (4, None)],
            "id bigint, t string",
        )
        out = {
            r["id"]: (r["nfc"], r["nfkc"])
            for r in df.select(
                "id",
                unicode_normalize_col("t", "NFC").alias("nfc"),
                unicode_normalize_col("t", "NFKC").alias("nfkc"),
            ).collect()
        }
        # the dedup motivation: byte-different equal texts converge
        assert out[1][0] == out[2][0] == composed
        # NFC keeps fullwidth; NFKC folds it to ASCII
        assert out[3][0] == fullwidth
        assert out[3][1] == "ABC 5"
        assert out[4] == (None, None)
        # pinned against CPython's unicodedata (the implementation itself)
        assert out[2][1] == unicodedata.normalize("NFKC", decomposed)

    def test_matches_duckdb_nfc(self, spark):
        import duckdb

        from oni_ml_spark.datapipe.textstats import unicode_normalize_col

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        planted = docs.select(
            "doc_id",
            F.concat(F.col("text"), F.lit(" Café Ａ")).alias("t"),
        )
        got = {
            r["doc_id"]: r["n"]
            for r in planted.select(
                "doc_id", unicode_normalize_col("t", "NFC").alias("n")
            ).collect()
        }
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.001/documents.parquet')"
        )
        want = dict(con.execute(
            "SELECT doc_id, nfc_normalize(text || ' Café Ａ') FROM documents"
        ).fetchall())
        assert got == want

    def test_bad_form_rejected(self, spark):
        from oni_ml_spark.datapipe.textstats import unicode_normalize_col

        with pytest.raises(ValueError, match="unknown form"):
            unicode_normalize_col("t", "NFX")


class TestRepetitionUnitCols:
    """(r11) repetition_unit_cols — Gopher's within-document duplicate
    line / paragraph rules as zero-shuffle HOF columns."""

    def test_goldens_lines_and_paragraphs(self, spark):
        from oni_ml_spark.datapipe.textstats import repetition_unit_cols

        # lines: aaaa x2, bb x1, c x3  -> 6 units, 3 distinct
        # dup_line_frac = 3/6; chars: total 4*2+2+1*3 = 13, distinct 4+2+1=7
        # dup_line_char_frac = 6/13
        lined = "aaaa\naaaa\nbb\nc\nc\nc"
        # paragraphs: "P one." x2, "Q." x1 -> dup_para_frac = 1/3
        # chars: total 6+6+2 = 14, distinct 8 -> dup_para_char_frac = 6/14
        parad = "P one.\n\nP one.\n\n\nQ."
        df = spark.createDataFrame([(1, lined, parad)], "id long, lt string, pt string")
        row = df.select(
            *[v.alias(k) for k, v in repetition_unit_cols("lt", "line").items()],
            *[v.alias(k) for k, v in repetition_unit_cols("pt", "paragraph").items()],
        ).first()
        assert row["dup_line_frac"] == 0.5
        assert row["dup_line_char_frac"] == round(6 / 13, 6)
        assert row["dup_para_frac"] == round(1 / 3, 6)
        assert row["dup_para_char_frac"] == round(6 / 14, 6)

    def test_edges_empty_and_unique(self, spark):
        from oni_ml_spark.datapipe.textstats import repetition_unit_cols

        df = spark.createDataFrame(
            [(1, ""), (2, "\n\n\n"), (3, "all\nunique\nlines")],
            "id long, t string",
        )
        rows = {
            r["id"]: r
            for r in df.select(
                "id",
                *[v.alias(k) for k, v in repetition_unit_cols("t", "line").items()],
            ).collect()
        }
        # empty doc and all-newline doc: no units -> all fractions 0.0
        for i in (1, 2):
            assert rows[i]["dup_line_frac"] == 0.0
            assert rows[i]["dup_line_char_frac"] == 0.0
        assert rows[3]["dup_line_frac"] == 0.0
        assert rows[3]["dup_line_char_frac"] == 0.0

    def test_zero_shuffle_plan(self, spark):
        """The whole point: the gate never leaves the row — no Exchange,
        no Generate (explode) in the plan."""
        from oni_ml_spark.datapipe.textstats import repetition_unit_cols

        df = spark.createDataFrame([(1, "a\na")], "id long, t string")
        out = df.select(
            *[v.alias(k) for k, v in repetition_unit_cols("t", "line").items()],
            *[v.alias(k) for k, v in repetition_unit_cols("t", "paragraph").items()],
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Generate" not in plan

    def test_unknown_unit_refused(self):
        import pytest as _pytest

        from oni_ml_spark.datapipe.textstats import repetition_unit_cols

        with _pytest.raises(ValueError, match="unit must be"):
            repetition_unit_cols("t", "sentence")
