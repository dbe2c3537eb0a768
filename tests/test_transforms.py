"""Golden-value tests ported from the reference test suite (SURVEY.md §5):
QuantilesTest, FlowWordCreationTest (all 14 port cases), DNSWordCreationTest,
DomainProcessorTest.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from oni_ml_spark.transforms import (
    DECILES,
    QUINTILES,
    bin_expr,
    dns_word,
    ecdf,
    extract_domain,
    extract_subdomain_cols,
    flow_word_cols,
    fractional_hour,
    oversample,
    quantile_cuts,
    seconds_of_day,
    string_entropy,
    top_domain_expr,
)


def _doubles_df(spark, values):
    return spark.createDataFrame([(float(v),) for v in values], "v double")


# ---------------------------------------------------------------- quantiles

class TestQuantiles:
    def test_ecdf_one_to_ten(self, spark):
        # QuantilesTest: ecdf of 1..10 → value k has cdf k/10
        got = dict(ecdf(_doubles_df(spark, range(1, 11)), "v").collect())
        assert got == {float(k): k / 10 for k in range(1, 11)}

    def test_ecdf_with_duplicates(self, spark):
        got = dict(ecdf(_doubles_df(spark, [1, 1, 1, 2, 2, 4]), "v").collect())
        assert got == {1.0: 0.5, 2.0: 5 / 6, 4.0: 1.0}

    def test_deciles_one_to_ten(self, spark):
        # QuantilesTest:117-144 — deciles of 1..10 are 1..10
        cuts = quantile_cuts(_doubles_df(spark, range(1, 11)), "v", DECILES)
        assert cuts == [float(k) for k in range(1, 11)]

    def test_quintiles_one_to_ten(self, spark):
        cuts = quantile_cuts(_doubles_df(spark, range(1, 11)), "v", QUINTILES)
        assert cuts == [2.0, 4.0, 6.0, 8.0, 10.0]

    def test_quantiles_empty_input_is_infinite(self, spark):
        # Quantiles.scala:70-75: empty data → +inf cutoffs
        cuts = quantile_cuts(_doubles_df(spark, []), "v", QUINTILES)
        assert all(math.isinf(c) for c in cuts)

    def test_constant_data(self, spark):
        cuts = quantile_cuts(_doubles_df(spark, [2, 2, 2, 2]), "v", DECILES)
        assert cuts == [2.0] * 10

    def test_bin_semantics(self, spark):
        # Quantiles.scala:97-99: index of first cutoff >= value; -1 above all
        cuts = [1.0, 2.0, 3.0]
        df = _doubles_df(spark, [0.5, 1.0, 1.5, 2.0, 3.0, 3.5])
        got = [r[0] for r in df.select(bin_expr("v", cuts)).collect()]
        assert got == [0, 0, 1, 1, 2, -1]

    def test_bin_duplicate_cuts(self, spark):
        cuts = [1.0, 1.0, 2.0]
        df = _doubles_df(spark, [1.0, 1.5])
        got = [r[0] for r in df.select(bin_expr("v", cuts)).collect()]
        assert got == [0, 2]


# ---------------------------------------------------------------- entropy

class TestEntropy:
    def test_golden_abcdefg(self, spark):
        # DNSWordCreationTest.scala:86-92
        df = spark.createDataFrame([("abcdefg",)], "s string")
        got = df.select(string_entropy("s").alias("e")).collect()[0]["e"]
        assert got == pytest.approx(2.807354922057603, abs=1e-12)

    def test_uniform_repeats_and_empty(self, spark):
        df = spark.createDataFrame([("aaaa",), ("abab",), ("",), (None,)], "s string")
        got = [r[0] for r in df.select(string_entropy("s")).collect()]
        assert got[0] == pytest.approx(0.0)
        assert got[1] == pytest.approx(1.0)
        assert got[2] == 0.0
        assert got[3] == 0.0

    def test_astral_plane_goldens(self, spark):
        # r13 (VERDICT r12 item 2): pin code-POINT semantics for non-BMP
        # input. Spark strings are UTF8String — length()/replace()/split("")
        # all operate on Unicode code points, NOT UTF-16 code units, so the
        # r12 `n - length(replace(s, c))` count form counts occurrences
        # exactly (a surrogate-pair emoji is ONE code point of length 1) and
        # is bit-identical to the old filter(chars, x == c) form and to a
        # Python code-point reference. Each golden below is
        # -(sum p*log2 p) over code-point frequencies.
        import math
        from collections import Counter

        cases = ["\U0001F600\U0001F600b", "a\U0001F600b\U0001F600\U0001F600",
                 "\U0001D54Fy\U0001D54F", "a\U0001F600\U0001F601",
                 "héllo", "日本語日"]

        def ref(s: str) -> float:
            n = len(s)  # Python strings are code-point sequences
            return -sum(
                (v / n) * math.log2(v / n) for v in Counter(s).values()
            )

        df = spark.createDataFrame([(c,) for c in cases], "s string")
        got = [r[0] for r in df.select(string_entropy("s")).collect()]
        for s, g in zip(cases, got):
            assert g == pytest.approx(ref(s), abs=1e-12), repr(s)


# ---------------------------------------------------------------- domains

class TestSubdomainExtraction:
    CASES = [
        # DNSWordCreationTest.scala:13-84
        ("123.103.104.10.in-addr.arpa", "None", "None", 0.0, 6.0),
        ("services.amazon.com.mx", "amazon", "services", 8.0, 4.0),
        ("services.amazon.com", "amazon", "services", 8.0, 3.0),
        ("amazon.com.mx", "amazon", "None", 0.0, 3.0),
        ("amazon.com", "None", "None", 0.0, 2.0),
    ]

    def test_golden_cases(self, spark):
        df = spark.createDataFrame([(c[0],) for c in self.CASES], "url string")
        cols = extract_subdomain_cols("url")
        got = df.select(
            "url", cols["domain"].alias("d"), cols["subdomain"].alias("s"),
            cols["subdomain_length"].alias("l"), cols["num_periods"].alias("n"),
        ).collect()
        for row, (url, d, s, l, n) in zip(got, self.CASES):
            assert (row["d"], row["s"], row["l"], row["n"]) == (d, s, l, n), url


class TestDomainExtraction:
    CASES = [
        # DomainProcessorTest.scala:12-67 goldens
        ("fatosdesconhecidos.com.br", "fatosdesconhecidos"),
        ("panasonic.jp", "panasonic"),
        ("get.your.best.electronic.at.panasonic.jp", "panasonic"),
        ("forrealz.net", "forrealz"),
        ("wow.its.really.long.forrealz.net", "forrealz"),
        ("123.103.104.10.in-addr.arpa", "None"),
        ("panasonic.c", "None"),
    ]

    def test_golden_cases(self, spark):
        df = spark.createDataFrame(self.CASES, "host string, want string")
        got = df.select("host", "want", extract_domain("host").alias("got")).collect()
        for r in got:
            assert r["got"] == r["want"], r["host"]


class TestTopDomain:
    def test_flags(self, spark):
        df = spark.createDataFrame([("intel",), ("google",), ("nope",)], "d string")
        got = [r[0] for r in df.select(top_domain_expr("d", ["google", "amazon"])).collect()]
        assert got == [2, 1, 0]


# ---------------------------------------------------------------- time

class TestTime:
    def test_fractional_hour(self, spark):
        df = spark.createDataFrame([(12, 59, 32)], "h int, m int, s int")
        got = df.select(fractional_hour("h", "m", "s").alias("t")).collect()[0]["t"]
        assert got == pytest.approx(12 + 59 / 60 + 32 / 3600)

    def test_seconds_of_day(self, spark):
        df = spark.createDataFrame([("01:02:03",), ("00:00:00",)], "t string")
        got = [r[0] for r in df.select(seconds_of_day("t")).collect()]
        assert got == [3723.0, 0.0]


# ---------------------------------------------------------------- flow words

def _flow_case(spark, sip, dip, sport, dport, tb=7, bb=7, pb=4):
    df = spark.createDataFrame(
        [(sip, dip, sport, dport, tb, bb, pb)],
        "sip string, dip string, sport int, dport int, tb int, bb int, pb int",
    )
    cols = flow_word_cols("sip", "dip", "sport", "dport", "tb", "bb", "pb")
    row = df.select(
        cols["word_port"].alias("p"), cols["ip_pair"].alias("pair"),
        cols["source_word"].alias("sw"), cols["destination_word"].alias("dw"),
    ).collect()[0]
    return row["p"], row["pair"], row["sw"], row["dw"]


class TestFlowWords:
    """The 14-case table from FlowWordCreationTest.scala:19-229."""

    SIP, DIP = "10.0.2.115", "172.16.0.107"  # sip < dip
    PAIR = "10.0.2.115 172.16.0.107"

    # (sport, dport, want_port, src_prefix, dst_prefix) — cases 1-7 sip<dip
    CASES = [
        (2132, 23, "23.0", "", "-1_"),       # 1: dport privileged
        (23, 2132, "23.0", "-1_", ""),       # 2: sport privileged
        (8392, 9874, "333333.0", "", ""),    # 3: both unprivileged
        (80, 0, "80.0", "-1_", ""),          # 4: dport 0
        (0, 43, "43.0", "", "-1_"),          # 5: sport 0
        (1024, 80, "111111.0", "", ""),      # 6: both privileged
        (0, 0, "0.0", "", ""),               # 7: both 0
    ]

    @pytest.mark.parametrize("sport,dport,port,spre,dpre", CASES)
    def test_src_ip_less(self, spark, sport, dport, port, spre, dpre):
        base = f"{port}_7.0_7.0_4.0"
        p, pair, sw, dw = _flow_case(spark, self.SIP, self.DIP, sport, dport)
        assert (p, pair) == (port, self.PAIR)
        assert sw == spre + base
        assert dw == dpre + base

    @pytest.mark.parametrize("sport,dport,port,spre,dpre", CASES)
    def test_dst_ip_less(self, spark, sport, dport, port, spre, dpre):
        # cases 8-14: swap endpoints — pair canonicalizes the same way
        base = f"{port}_7.0_7.0_4.0"
        p, pair, sw, dw = _flow_case(spark, self.DIP, self.SIP, sport, dport)
        assert (p, pair) == (port, self.PAIR)
        assert sw == spre + base
        assert dw == dpre + base


# ---------------------------------------------------------------- dns word

class TestDnsWord:
    def test_assembly(self, spark):
        df = spark.createDataFrame(
            [("1", 2, 3, 4, 0, 1, 28, 0)],
            "td string, flb int, tb int, slb int, eb int, pb int, qt int, rc int",
        )
        got = df.select(
            dns_word("td", "flb", "tb", "slb", "eb", "pb", "qt", "rc").alias("w")
        ).collect()[0]["w"]
        assert got == "1_2_3_4_0_1_28_0"


# ---------------------------------------------------------------- oversample

class TestOversample:
    def test_factor(self, spark):
        df = spark.createDataFrame([(1,), (2,)], "x int")
        assert oversample(df, 5).count() == 10
        assert oversample(df, 1).count() == 2
        got = sorted(r["x"] for r in oversample(df, 3).collect())
        assert got == [1, 1, 1, 2, 2, 2]


class TestSemistructured:
    def test_infer_parse_matches_duckdb_json_extract(self, spark):
        import duckdb

        from oni_ml_spark.io import load_table
        from oni_ml_spark.transforms.semistructured import (
            infer_json_schema,
            json_get,
            parse_json,
        )

        e = load_table(spark, "/root/testdata/sf0.001", "events")
        schema = infer_json_schema(spark, e, "props")
        assert "k" in schema.fieldNames()
        parsed = parse_json(e, "props", schema, out_col="p")
        got = sorted(
            (r["event_id"], r["k"])
            for r in parsed.select("event_id", F.col("p.k").alias("k")).collect()
        )
        con = duckdb.connect()
        want = sorted(
            (a, b)
            for a, b in con.execute(
                "SELECT event_id, (props->>'k')::BIGINT FROM "
                "'/root/testdata/sf0.001/events.parquet'"
            ).fetchall()
        )
        assert got == want
        # single-field path agrees too (string-typed)
        one = parsed.select(json_get("props", "k").alias("ks")).first()
        assert one["ks"] is not None and one["ks"].isdigit()

    def test_corrupt_documents_null_or_dropped(self, spark):
        from pyspark.sql.types import LongType, StructField, StructType

        from oni_ml_spark.transforms.semistructured import parse_json

        df = spark.createDataFrame(
            [(0, '{"k": 1}'), (1, "not json"), (2, None)],
            "id long, props string",
        )
        schema = StructType([StructField("k", LongType())])
        parsed = parse_json(df, "props", schema, out_col="p")
        rows = {r["id"]: r["p"] for r in parsed.collect()}
        # PERMISSIVE from_json yields an all-null-fields struct for corrupt
        # docs (not a NULL struct) and a NULL struct only for NULL input
        assert rows[0]["k"] == 1 and rows[1]["k"] is None and rows[2] is None
        kept = parse_json(df, "props", schema, out_col="p", drop_corrupt=True)
        assert sorted(r["id"] for r in kept.collect()) == [0, 2]

    def test_infer_raises_on_all_null(self, spark):
        import pytest as _pytest

        from oni_ml_spark.transforms.semistructured import infer_json_schema

        df = spark.createDataFrame([(1, None)], "id long, props string")
        with _pytest.raises(ValueError):
            infer_json_schema(spark, df, "props")

    def test_infer_strips_corrupt_record_and_composes_with_drop(self, spark):
        """Dirty sample -> inference must not leak _corrupt_record into the
        schema (it used to, making parse_json(drop_corrupt=True) throw
        AMBIGUOUS_REFERENCE_TO_FIELDS on exactly the corpora drop_corrupt
        exists for)."""
        from oni_ml_spark.transforms.semistructured import (
            infer_json_schema,
            parse_json,
        )

        df = spark.createDataFrame(
            [(0, '{"k": 1}'), (1, "not json"), (2, None)],
            "id long, props string",
        )
        schema = infer_json_schema(spark, df, "props")
        assert "_corrupt_record" not in schema.fieldNames()
        kept = parse_json(df, "props", schema, out_col="p", drop_corrupt=True)
        assert sorted(r["id"] for r in kept.collect()) == [0, 2]
        # explicitly passing a reserved-field schema is rejected loudly
        import pytest as _pytest
        from pyspark.sql.types import StringType, StructField, StructType

        bad = StructType([StructField("_corrupt_record", StringType())])
        with _pytest.raises(ValueError):
            parse_json(df, "props", bad, drop_corrupt=True)


class TestUnicodeNormalize:
    def test_forms_casefold_and_dedup_convergence(self, spark):
        from oni_ml_spark.datapipe.dedup import exact_dedup_groups
        from oni_ml_spark.datapipe.textstats import unicode_normalize

        composed = "café １２３"          # é composed + fullwidth 123
        decomposed = "café 123"                      # e + combining accent
        rows = [(0, composed), (1, decomposed), (2, "STRASSE ß")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r["doc_id"]: r["text"]
            for r in unicode_normalize(df, "text", form="NFKC").collect()
        }
        assert out[0] == out[1] == "café 123"
        folded = {
            r["doc_id"]: r["text"]
            for r in unicode_normalize(df, "text", form="NFKC", casefold=True).collect()
        }
        assert folded[2] == "strasse ss"                   # ß casefolds to ss
        # the motivating property: normalization makes digest dedup converge
        groups_raw = exact_dedup_groups(df, "doc_id", "text").count()
        groups_norm = exact_dedup_groups(
            unicode_normalize(df, "text", form="NFKC"), "doc_id", "text"
        ).count()
        assert groups_raw == 3 and groups_norm == 2

    def test_null_passthrough_and_bad_form(self, spark):
        import pytest as _pytest

        from oni_ml_spark.datapipe.textstats import unicode_normalize

        df = spark.createDataFrame([(0, None)], "doc_id long, text string")
        assert unicode_normalize(df, "text").first()["text"] is None
        with _pytest.raises(ValueError):
            unicode_normalize(df, "text", form="NFX")


def test_quality_metrics_extra_collision_rejected(spark):
    import pytest as _pytest

    from oni_ml_spark.datapipe.textstats import quality_metrics

    df = spark.createDataFrame([(0, "hello world")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="collide"):
        quality_metrics(df, "doc_id", "text", extra={"n_tokens": F.lit(1)})


def test_unpivot_melt_matches_duckdb(spark):
    """UNPIVOT / melt — the inverse of the pivot_counts reshape (wide
    per-metric columns back to long (key, metric, value) rows), native via
    DataFrame.unpivot; DuckDB's UNPIVOT is the oracle."""
    import duckdb

    from oni_ml_spark.io import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax"
    )
    got = sorted(
        tuple(r)
        for r in li.unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_discount", "l_tax"],
            "metric",
            "value",
        ).collect()
    )
    con = duckdb.connect()
    want = sorted(
        tuple(r)
        for r in con.execute(
            "SELECT l_orderkey, l_linenumber, metric, value FROM ("
            "  SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax "
            "  FROM '/root/testdata/sf0.001/lineitem.parquet') "
            "UNPIVOT (value FOR metric IN (l_quantity, l_discount, l_tax))"
        ).fetchall()
    )
    assert got == want and len(got) > 0
