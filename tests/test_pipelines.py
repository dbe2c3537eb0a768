"""Pipeline-level invariant tests (SURVEY.md §7.4.1: LDA outputs are
seed-dependent, so we assert structure and ranking behavior, not values):

- topic mixes are simplexes (sum to 1), scores in [0, 1]
- planted-anomaly ranking: records with rare (doc, word) combinations score
  below records with common ones
- feedback oversampling makes confirmed-benign patterns boring (score rises)
- flow/dns/proxy pipelines run end-to-end on synthetic network fixtures
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oni_ml_spark.pipelines import dns as dns_pipe
from oni_ml_spark.pipelines import events as events_pipe
from oni_ml_spark.pipelines import flow as flow_pipe
from oni_ml_spark.pipelines import proxy as proxy_pipe


def _flow_fixture(spark, n_common=2000, n_rare=5):
    """Synthetic day of netflow: a dense mesh of common traffic between a
    small IP pool on port 80, plus a few rare connections from one outlier
    IP on an odd port."""
    common = spark.range(n_common).select(
        F.lit("2016-05-05 12:00:00").alias("treceived"),
        F.lit(2016).alias("tryear"), F.lit(5).alias("trmonth"), F.lit(5).alias("trday"),
        (F.col("id") % 24).cast("int").alias("trhour"),
        (F.col("id") % 60).cast("int").alias("trminute"),
        ((F.col("id") * 7) % 60).cast("int").alias("trsec"),
        F.lit(0.0).alias("tdur"),
        F.concat(F.lit("10.0.0."), (F.col("id") % 8).cast("string")).alias("sip"),
        F.concat(F.lit("10.0.1."), ((F.col("id") / 8).cast("int") % 8).cast("string")).alias("dip"),
        (F.lit(40000) + (F.col("id") % 1000)).cast("int").alias("sport"),
        F.lit(80).cast("int").alias("dport"),
        F.lit("TCP").alias("proto"), F.lit(".AP...").alias("flag"),
        F.lit(10).cast("long").alias("ipkt"),
        F.lit(1000).cast("long").alias("ibyt"),
    )
    rare = spark.range(n_rare).select(
        F.lit("2016-05-05 03:13:00").alias("treceived"),
        F.lit(2016).alias("tryear"), F.lit(5).alias("trmonth"), F.lit(5).alias("trday"),
        F.lit(3).cast("int").alias("trhour"),
        F.lit(13).cast("int").alias("trminute"),
        (F.col("id") % 60).cast("int").alias("trsec"),
        F.lit(0.0).alias("tdur"),
        F.lit("10.0.0.1").alias("sip"),
        F.concat(F.lit("10.0.1."), (F.col("id") % 8).cast("string")).alias("dip"),
        (F.lit(50000) + F.col("id").cast("int")).cast("int").alias("sport"),
        F.lit(6667).cast("int").alias("dport"),
        F.lit("TCP").alias("proto"), F.lit(".AP...").alias("flag"),
        F.lit(999999).cast("long").alias("ipkt"),
        F.lit(99999999).cast("long").alias("ibyt"),
    )
    return common.unionByName(rare)


class TestFlowPipeline:
    @pytest.fixture(scope="class")
    def result(self, spark):
        return flow_pipe.run(
            _flow_fixture(spark), topic_count=5, top_k=50, max_iter=5, seed=42
        )

    def test_scores_are_probabilities(self, result):
        row = result.scored.agg(
            F.min("score").alias("lo"), F.max("score").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        assert row["n"] > 0
        assert 0.0 <= row["lo"] <= row["hi"] <= 1.0 + 1e-9

    def test_topic_mixes_are_simplexes(self, result):
        sums = result.model.doc_topic_mix.select(
            F.aggregate("topic_mix", F.lit(0.0), lambda a, x: a + x).alias("s")
        ).collect()
        assert all(abs(r["s"] - 1.0) < 1e-6 for r in sums)

    def test_word_probs_topic_columns_normalized(self, result):
        k = result.model.topic_count
        sums = (
            result.model.word_probs.select(
                F.posexplode("word_given_topic").alias("t", "p")
            )
            .groupBy("t").agg(F.sum("p").alias("s"))
            .collect()
        )
        assert len(sums) == k
        assert all(abs(r["s"] - 1.0) < 1e-4 for r in sums)

    def test_planted_anomaly_ranks_suspicious(self, result):
        top = result.suspicious.limit(20).collect()
        assert any(r["dport"] == 6667 for r in top), (
            "rare-pattern traffic should appear in the bottom-K most suspicious"
        )

    def test_suspicious_sorted_ascending(self, result):
        scores = [r["score"] for r in result.suspicious.select("score").collect()]
        assert scores == sorted(scores)


def _dns_fixture(spark, n_common=1500, n_rare=5):
    common = spark.range(n_common).select(
        F.lit("May  5 2016 12:00:00").alias("frame_time"),
        (F.lit(1462449600) + F.col("id") % 86400).cast("long").alias("unix_tstamp"),
        F.lit(60).cast("int").alias("frame_len"),
        F.concat(F.lit("10.0.0."), (F.col("id") % 8).cast("string")).alias("ip_dst"),
        F.lit("8.8.8.8").alias("ip_src"),
        F.lit("services.amazon.com").alias("dns_qry_name"),
        F.lit("0x00000001").alias("dns_qry_class"),
        F.lit(1).cast("int").alias("dns_qry_type"),
        F.lit(0).cast("int").alias("dns_qry_rcode"),
        F.lit("1.2.3.4").alias("dns_a"),
    )
    rare = spark.range(n_rare).select(
        F.lit("May  5 2016 03:13:00").alias("frame_time"),
        F.lit(1462417980).cast("long").alias("unix_tstamp"),
        F.lit(1400).cast("int").alias("frame_len"),
        F.lit("10.0.0.3").alias("ip_dst"),
        F.lit("6.6.6.6").alias("ip_src"),
        F.concat(F.lit("xq3v9zk1pw8r7t2m"), F.col("id").cast("string"),
                 F.lit(".evil.net")).alias("dns_qry_name"),
        F.lit("0x00000001").alias("dns_qry_class"),
        F.lit(16).cast("int").alias("dns_qry_type"),
        F.lit(3).cast("int").alias("dns_qry_rcode"),
        F.lit("0.0.0.0").alias("dns_a"),
    )
    return common.unionByName(rare)


class TestDnsPipeline:
    @pytest.fixture(scope="class")
    def result(self, spark):
        return dns_pipe.run(
            _dns_fixture(spark), top_domains=["amazon", "google"],
            topic_count=5, top_k=20, max_iter=5, seed=42,
        )

    def test_runs_and_ranks(self, result):
        rows = result.suspicious.collect()
        assert len(rows) > 0
        top = rows[:10]
        assert any("evil" in r["dns_qry_name"] for r in top), (
            "high-entropy rare domain should rank among most suspicious"
        )

    def test_word_shape(self, result):
        words = result.scored.select("word").limit(50).collect()
        assert all(len(r["word"].split("_")) == 8 for r in words)


def _proxy_fixture(spark, n_common=1500, n_rare=5):
    common = spark.range(n_common).select(
        F.lit("2016-05-05").alias("p_date"),
        F.concat(F.lit("12:"), F.lpad((F.col("id") % 60).cast("string"), 2, "0"),
                 F.lit(":00")).alias("p_time"),
        F.concat(F.lit("10.0.0."), (F.col("id") % 8).cast("string")).alias("clientip"),
        F.lit("www.amazon.com").alias("host"),
        F.lit("GET").alias("reqmethod"),
        F.lit("Mozilla/5.0").alias("useragent"),
        F.lit("text/html").alias("resconttype"),
        F.lit(100).cast("int").alias("duration"),
        F.lit("-").alias("username"), F.lit("-").alias("authgroup"),
        F.lit("-").alias("exceptionid"), F.lit("OBSERVED").alias("filterresult"),
        F.lit("Shopping").alias("webcat"), F.lit("-").alias("referer"),
        F.lit("200").alias("respcode"), F.lit("TCP_HIT").alias("action"),
        F.lit("http").alias("urischeme"), F.lit("80").alias("uriport"),
        F.lit("/").alias("uripath"), F.lit("-").alias("uriquery"),
        F.lit("html").alias("uriextension"), F.lit("1.1.1.1").alias("serverip"),
        F.lit(1000).cast("int").alias("scbytes"), F.lit(300).cast("int").alias("csbytes"),
        F.lit("-").alias("virusid"), F.lit("-").alias("bcappname"),
        F.lit("-").alias("bcappoper"),
        F.lit("http://www.amazon.com/index.html").alias("fulluri"),
    )
    rare = common.limit(n_rare).select(
        *[c for c in common.columns if c not in (
            "clientip", "host", "reqmethod", "respcode", "fulluri", "resconttype", "useragent")],
        F.lit("10.0.0.3").alias("clientip"),
        F.lit("xq3v9zk1pw8r7t2m.evil.net").alias("host"),
        F.lit("CONNECT").alias("reqmethod"),
        F.lit("503").alias("respcode"),
        F.lit("http://xq3v9zk1pw8r7t2m.evil.net/a?b=Zk9q3W7xv1").alias("fulluri"),
        F.lit("application/octet-stream").alias("resconttype"),
        F.lit("weird-agent/0.1").alias("useragent"),
    ).select(common.columns)
    return common.unionByName(rare)


class TestProxyPipeline:
    @pytest.fixture(scope="class")
    def result(self, spark):
        return proxy_pipe.run(
            _proxy_fixture(spark), top_domains=["amazon", "google"],
            topic_count=5, top_k=20, max_iter=5, seed=42,
        )

    def test_runs_and_ranks(self, result):
        rows = result.suspicious.collect()
        assert len(rows) > 0
        assert any("evil" in r["host"] for r in rows[:10])

    def test_word_shape(self, result):
        words = result.scored.select("word").limit(20).collect()
        assert all(len(r["word"].split("_")) == 7 for r in words)


class TestFeedbackLoop:
    def test_feedback_raises_score_of_confirmed_benign(self, spark):
        """Oversampled severity-3 feedback must make its pattern more
        'boring' (higher probability) than the same pattern unseen."""
        base = _flow_fixture(spark, n_common=1000, n_rare=10)
        no_fb = flow_pipe.run(base, topic_count=5, top_k=-1, max_iter=5, seed=42)
        rare_score_before = (
            no_fb.scored.filter(F.col("dport") == 6667)
            .agg(F.avg("score")).collect()[0][0]
        )

        fb = spark.range(10).select(
            F.lit("3").alias("sev"),
            F.lit("2016-05-05 03:13:00").alias("tstart"),
            F.lit("10.0.0.1").alias("srcIP"),
            F.concat(F.lit("10.0.1."), (F.col("id") % 8).cast("string")).alias("dstIP"),
            (F.lit(50000) + F.col("id").cast("int")).cast("int").alias("sport"),
            F.lit(6667).cast("int").alias("dport"),
            F.lit("TCP").alias("proto"), F.lit(".AP...").alias("flag"),
            F.lit(999999).cast("long").alias("ipkt"),
            F.lit(99999999).cast("long").alias("ibyt"),
        )
        # map feedback into raw-schema rows the flow pipeline expects
        fb_rows = fb.select(
            F.col("tstart").alias("treceived"),
            F.lit(2016).alias("tryear"), F.lit(5).alias("trmonth"), F.lit(5).alias("trday"),
            F.split(F.split("tstart", " ").getItem(1), ":").getItem(0).cast("int").alias("trhour"),
            F.split(F.split("tstart", " ").getItem(1), ":").getItem(1).cast("int").alias("trminute"),
            F.split(F.split("tstart", " ").getItem(1), ":").getItem(2).cast("int").alias("trsec"),
            F.lit(0.0).alias("tdur"),
            F.col("srcIP").alias("sip"), F.col("dstIP").alias("dip"),
            "sport", "dport", "proto", "flag", "ipkt", "ibyt",
            F.col("sev"),
        )
        with_fb = flow_pipe.run(
            base,
            feedback=fb_rows,
            dup_factor=100,
            topic_count=5, top_k=-1, max_iter=5, seed=42,
        )
        rare_score_after = (
            with_fb.scored.filter(F.col("dport") == 6667)
            .agg(F.avg("score")).collect()[0][0]
        )
        assert rare_score_after > rare_score_before


class TestEventsPipeline:
    def test_deterministic_across_runs(self, spark):
        from oni_ml_spark.io import load_table

        df = load_table(spark, "/root/testdata/sf0.001", "events")
        r1 = events_pipe.run(df, topic_count=5, top_k=10, max_iter=3, seed=7)
        r2 = events_pipe.run(df, topic_count=5, top_k=10, max_iter=3, seed=7)
        a = [(r["event_id"], round(r["score"], 9)) for r in r1.suspicious.collect()]
        b = [(r["event_id"], round(r["score"], 9)) for r in r2.suspicious.collect()]
        assert a == b
